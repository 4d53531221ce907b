"""EfficientNet-B0(-MRLA) sanity: shapes, param count, residual structure."""

import numpy as np
import jax
import jax.numpy as jnp

from mrla_tpu.models import create_model


def test_efficientnet_b0_shape_and_params():
    m = create_model("efficientnet_b0", num_classes=1000)
    v = m.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)), train=False)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    # canonical B0 ≈ 5.29M params
    assert 5.0e6 < n < 5.6e6, n
    out = m.apply(v, jnp.zeros((2, 224, 224, 3)), train=False)
    assert out.shape == (2, 1000)


def test_efficientnet_mrlal_b0_runs():
    m = create_model("efficientnet_mrlal_b0", num_classes=10)
    v = m.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)), train=False)
    # MRLA adds params only on residual-capable blocks
    has_mrla = [k for k in jax.tree_util.tree_flatten_with_path(v["params"])[0]
                if any("mrla" in str(p) for p in k[0])]
    assert has_mrla
    out = m.apply(
        v, jnp.asarray(np.random.default_rng(0).standard_normal((2, 224, 224, 3)),
                       jnp.float32),
        train=False,
    )
    assert out.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(out)))

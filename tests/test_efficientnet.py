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


def test_efficientnet_b0_stage_shapes_and_flops():
    """Pin the B0 trunk against the paper table (EfficientNet Table 1):
    stage output channels [16,24,40,80,112,192,320] at resolutions
    [112,56,28,14,14,7,7] for 224px input, and ~0.39 GMACs total."""
    from mrla_tpu.utils.flops import count_flops

    m = create_model("efficientnet_b0", num_classes=1000)
    v = m.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)), train=False)

    _, inter = m.apply(v, jnp.zeros((1, 224, 224, 3)), train=False,
                       capture_intermediates=True)
    inter = inter["intermediates"]
    expect = [(112, 16), (56, 24), (28, 40), (14, 80), (14, 112), (7, 192),
              (7, 320)]
    repeats = [1, 2, 2, 3, 3, 4, 1]
    for si, ((hw, ch), rep) in enumerate(zip(expect, repeats)):
        out = inter[f"stage{si}_{rep - 1}"]["__call__"][0]
        assert out.shape == (1, hw, hw, ch), (si, out.shape)

    flops = count_flops(m, (1, 224, 224, 3), variables=v)
    # XLA cost analysis counts mul+add separately: ~2 * 0.39 GMACs.
    assert flops is not None and 0.65e9 < flops < 0.95e9, flops


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

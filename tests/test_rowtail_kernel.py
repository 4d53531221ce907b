"""Numerics of the lag-1 row-pipeline tail kernel (kernels/mrla_rowtail).

Interpret-mode (CPU) golden test against the jnp reference epilogue
(`mrla_light_epilogue_reference`, itself golden-tested vs the torch oracle
in test_ops_golden.py) + an explicit next-block 1x1 conv.  Covers the
y-only and y+x1 variants, odd W (stage-3/4 shapes), and the row-0 /
row-H-1 halo edges.  Reference math: resnet_mrla_light.py:113-116.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrla_tpu.kernels.mrla_epilogue import (
    mrla_light_epilogue_reference,
    mrla_light_gate,
)
from mrla_tpu.kernels.mrla_rowtail import mrla_rowtail


@pytest.mark.parametrize(
    "b,h,w,c,c1",
    [(8, 6, 5, 256, 64), (8, 7, 7, 128, 128), (16, 14, 14, 512, 256),
     (8, 2, 3, 128, 64)],
)
def test_rowtail_matches_reference(b, h, w, c, c1):
    rng = np.random.default_rng(42)
    out = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    idn = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    wq = jnp.asarray(rng.standard_normal(5), jnp.float32)
    wk = jnp.asarray(rng.standard_normal(5), jnp.float32)
    wv = jnp.asarray(rng.standard_normal((3, 3, 1, c)), jnp.float32)
    lam = jnp.asarray(rng.standard_normal(c), jnp.float32)
    sc = jnp.asarray(rng.standard_normal(c), jnp.float32)
    bi = jnp.asarray(rng.standard_normal(c), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, c1)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(c1), jnp.float32)
    heads = c // 32

    gate = mrla_light_gate(out, wq, wk, heads)
    y_ref = mrla_light_epilogue_reference(
        out, idn, wq, wk, wv, lam, sc, bi, heads)
    x1_ref = jax.nn.relu(jnp.einsum("bhwc,cd->bhwd", y_ref, w1) + b1)

    y, x1 = mrla_rowtail(out, idn, gate, wv, lam, sc, bi, w1, b1,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)
    # x1 goes through a cast to the activation dtype inside the kernel
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x1_ref), atol=5e-3)

    y_only = mrla_rowtail(out, idn, gate, wv, lam, sc, bi, interpret=True)
    np.testing.assert_allclose(np.asarray(y_only), np.asarray(y_ref),
                               atol=1e-4)

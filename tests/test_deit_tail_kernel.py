"""Fused DeiT token-tail kernel (kernels/deit_token_tail.py) numerics.

Interpret-mode parity against the flax module
(models/deit_mrla.py:MRLALightTokenModule) whose math is itself
executed-reference-parity-tested in test_deit_parity.py.  Covers the
module semantics end to end: LN_x/LN_o, GAP over grid tokens, k-tap
channel conv Q/K, per-head sigmoid gate, dwconv3x3 + exact GELU (the
GELU-on-V quirk), λ-weighted normo add, the cls bypass (normalized cls
passes through — deit_mrla_light.py:199-207), and the block residual.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrla_tpu.kernels.deit_token_tail import (
    deit_token_tail, extract_tail_params, pack_tail_params)
from mrla_tpu.models.deit_mrla import MRLALightTokenModule


def _setup(b=16, n=197, c=384, dim_perhead=16, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, n, c), dtype)
    ot = jnp.asarray(rng.randn(b, n, c), dtype)
    mod = MRLALightTokenModule(dim_perhead)
    v = mod.init(jax.random.PRNGKey(seed), x.astype(jnp.float32),
                 ot.astype(jnp.float32))
    w, taps = pack_tail_params(
        extract_tail_params({"mrla": v["params"]}))
    return mod, v, x, ot, w, taps


@pytest.mark.parametrize("c,dim_perhead", [(384, 16), (192, 16)])
def test_matches_module_f32(c, dim_perhead):
    mod, v, x, ot, w, taps = _setup(c=c, dim_perhead=dim_perhead)
    ref = x + mod.apply(v, x, ot)
    got = deit_token_tail(x, ot, w, taps, dim_perhead=dim_perhead,
                          interpret=True)
    rel = float(jnp.max(jnp.abs(ref - got))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 1e-5, rel


def test_matches_module_bf16():
    mod, v, x, ot, w, taps = _setup(dtype=jnp.bfloat16)
    ref = (x + mod.apply(v, x, ot)).astype(jnp.float32)
    got = deit_token_tail(x, ot, w, taps, interpret=True).astype(
        jnp.float32)
    rel = float(jnp.max(jnp.abs(ref - got))) / float(jnp.max(jnp.abs(ref)))
    # kernel computes fp32 internally; jnp path rounds intermediates to
    # bf16 — difference is bf16-resolution, not a semantics gap
    assert rel < 2e-2, rel


def test_cls_bypass_exact():
    """The cls row must be x_cls + normx(x_cls) — no MRLA contribution."""
    mod, v, x, ot, w, taps = _setup()
    got = deit_token_tail(x, ot, w, taps, interpret=True)
    ref = x + mod.apply(v, x, ot)
    np.testing.assert_allclose(
        np.asarray(got[:, 0]), np.asarray(ref[:, 0]), atol=1e-5)
    # and it must not depend on ot at all
    got2 = deit_token_tail(x, ot * 2.0, w, taps, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got[:, 0]), np.asarray(got2[:, 0]), atol=1e-5)

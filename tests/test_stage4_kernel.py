"""Stage-resident stage-4 kernel (kernels/mrla_stage4.py) numerics.

Interpret-mode (CPU) golden test against the serving jnp chain
(`serving/resnet_mrlal.py:_block` x3), which is itself logit-parity
tested against the executed reference in test_serving.py.  Covers the
real stage-4 geometry (14x14x1024 -> 7x7x2048, stride-2 entry with
downsample) at reduced channel width for CPU speed, plus the full-width
packing round trip.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrla_tpu.kernels.mrla_stage4 import pack_stage4_params, stage4_resident
from mrla_tpu.serving.resnet_mrlal import _block, _blocks_impl, _conv, attach_stage4


def _mk_block(rng, cin, c1, c, ktap, first):
    p = {
        "k1": rng.standard_normal((1, 1, cin, c1)).astype(np.float32) * .05,
        "b1": rng.standard_normal(c1).astype(np.float32) * 0.1,
        "k2": rng.standard_normal((3, 3, c1, c1)).astype(np.float32) * .02,
        "b2": rng.standard_normal(c1).astype(np.float32) * 0.1,
        "k3": rng.standard_normal((1, 1, c1, c)).astype(np.float32) * .02,
        "b3": rng.standard_normal(c).astype(np.float32) * 0.1,
        "wq": rng.standard_normal(ktap).astype(np.float32) * 0.3,
        "wk": rng.standard_normal(ktap).astype(np.float32) * 0.3,
        "wv": rng.standard_normal((3, 3, 1, c)).astype(np.float32) * 0.3,
        "lam": rng.standard_normal(c).astype(np.float32) * 0.3,
        "bn_scale": (1 + .1 * rng.standard_normal(c)).astype(np.float32),
        "bn_bias": rng.standard_normal(c).astype(np.float32) * 0.1,
    }
    if first:
        p["kd"] = rng.standard_normal((1, 1, cin, c)).astype(np.float32) * .03
        p["bd"] = rng.standard_normal(c).astype(np.float32) * 0.1
    return {k: jnp.asarray(v) for k, v in p.items()}


@pytest.mark.parametrize("cin,c1,c,ktap", [(256, 128, 512, 5),
                                           (128, 64, 256, 3)])
def test_stage4_matches_serving_chain(cin, c1, c, ktap):
    rng = np.random.default_rng(0)
    heads = c // 32
    p0 = _mk_block(rng, cin, c1, c, ktap, True)
    p1 = _mk_block(rng, c, c1, c, ktap, False)
    p2 = _mk_block(rng, c, c1, c, ktap, False)
    b = 8
    x = jnp.asarray(rng.standard_normal((b, 14, 14, cin)), jnp.float32)

    y, _ = _block(x, p0, 2, heads, False)
    y, _ = _block(y, p1, 1, heads, False)
    ref, _ = _block(y, p2, 1, heads, False)

    ob = jax.nn.relu(_conv(jax.nn.relu(_conv(x, p0["k1"], p0["b1"])),
                           p0["k2"], p0["b2"], stride=2))
    xs = x[:, ::2, ::2, :]
    packed = pack_stage4_params([p0, p1, p2], dtype=jnp.float32)
    got = stage4_resident(
        ob, xs,
        {k: v for k, v in packed.items() if k not in ("heads", "ktap")},
        heads=packed["heads"], ktap=packed["ktap"], batch_tile=8,
        interpret=True,
    )
    rel = float(jnp.max(jnp.abs(ref - got))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 1e-4, rel


def test_attach_stage4_inmodel(monkeypatch):
    """use_stage4=True routes the final stage through the Pallas kernel
    (interpret mode here) and matches the jnp chain through the real
    serving block loop, including the attach_stage4 packing path."""
    import mrla_tpu.kernels.mrla_stage4 as s4mod
    import mrla_tpu.serving.resnet_mrlal as srv

    monkeypatch.setattr(
        s4mod, "stage4_resident",
        functools.partial(stage4_resident, interpret=True),
    )
    rng = np.random.default_rng(1)
    cin, c1, c, ktap = 128, 64, 256, 3
    layers = (2, 3)
    # stage 1: cin->c_a at stride 1 (block0 carries the channel-change
    # downsample), stage 2: the canonical 3-block stride-2 geometry
    ca = 128
    blocks = [
        _mk_block(rng, cin, 64, ca, ktap, True),
        _mk_block(rng, ca, 64, ca, ktap, False),
        _mk_block(rng, ca, c1, c, ktap, True),
        _mk_block(rng, c, c1, c, ktap, False),
        _mk_block(rng, c, c1, c, ktap, False),
    ]
    sp = {"blocks": blocks}
    attach_stage4(sp, layers)
    y = jnp.asarray(rng.standard_normal((8, 14, 14, cin)), jnp.float32)
    ref = _blocks_impl(sp, y, layers, 32, False)
    got = _blocks_impl(sp, y, layers, 32, False, use_stage4=True)
    assert len(ref) == len(got) == 2
    r, g = ref[-1], got[-1]
    rel = float(jnp.max(jnp.abs(r - g))) / float(jnp.max(jnp.abs(r)))
    assert rel < 1e-4, rel

"""Pallas kernel tests — require the real TPU (marked `tpu`; excluded from
the CPU suite; run manually with:
    MRLA_TPU_TESTS=1 pytest -m tpu -q tests/test_kernels_tpu.py
— the env var stops conftest.py from forcing the CPU backend)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu_backend():
    try:
        jax.config.update("jax_platforms", "axon,cpu")
        dev = jax.devices()[0]
        if dev.platform == "cpu":
            pytest.skip("no TPU available")
    except Exception:
        pytest.skip("no TPU available")
    return dev


def test_fused_epilogue_matches_reference(tpu_backend):
    from mrla_tpu.kernels.mrla_epilogue import (
        mrla_light_epilogue_pallas,
        mrla_light_epilogue_reference,
        supports_shape,
    )

    B, H, W, C, G = 4, 16, 16, 256, 8
    assert supports_shape(H, W, C)
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
    out, idn = mk(B, H, W, C), mk(B, H, W, C)
    wq = jnp.asarray(rng.standard_normal(5), jnp.float32) * 0.2
    wk = jnp.asarray(rng.standard_normal(5), jnp.float32) * 0.2
    wv = jnp.asarray(rng.standard_normal((3, 3, 1, C)), jnp.float32) * 0.2
    lam = jnp.asarray(rng.standard_normal(C), jnp.float32)
    sc = jnp.abs(jnp.asarray(rng.standard_normal(C), jnp.float32))
    bi = jnp.asarray(rng.standard_normal(C), jnp.float32)

    args = (out, idn, wq, wk, wv, lam, sc, bi, G)
    got = np.asarray(mrla_light_epilogue_pallas(*args), np.float32)
    ref = np.asarray(mrla_light_epilogue_reference(*args), np.float32)
    np.testing.assert_allclose(got, ref, atol=0.125)  # bf16 output ulp


def test_hwbc_block_tail_matches_reference(tpu_backend):
    import jax.numpy as jnp

    from mrla_tpu.kernels.mrla_epilogue import mrla_light_epilogue_reference
    from mrla_tpu.kernels.mrla_epilogue_hwbc import mrla_block_tail_hwbc

    B, H, W, C, G = 8, 16, 16, 256, 8
    rng = np.random.default_rng(1)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
    z, idn = mk(B, H, W, C), mk(B, H, W, C)
    wq = jnp.asarray(rng.standard_normal(5), jnp.float32) * 0.2
    wk = jnp.asarray(rng.standard_normal(5), jnp.float32) * 0.2
    wv = jnp.asarray(rng.standard_normal((3, 3, 1, C)), jnp.float32) * 0.2
    lam = jnp.asarray(rng.standard_normal(C), jnp.float32)
    sc = jnp.abs(jnp.asarray(rng.standard_normal(C), jnp.float32))
    bi = jnp.asarray(rng.standard_normal(C), jnp.float32)

    got = np.asarray(
        jax.jit(lambda z, i: mrla_block_tail_hwbc(z, i, wq, wk, wv, lam, sc,
                                                  bi, G))(z, idn), np.float32)
    out = jax.nn.relu(z.astype(jnp.float32) + idn.astype(jnp.float32)).astype(
        z.dtype)
    ref = np.asarray(
        mrla_light_epilogue_reference(out, idn, wq, wk, wv, lam, sc, bi, G),
        np.float32)
    np.testing.assert_allclose(got, ref, atol=0.125)


def test_megatail_matches_reference(tpu_backend):
    """Mega-tail (epilogue + next conv1 matmul) vs the jnp composite."""
    from mrla_tpu.kernels.mrla_epilogue import (
        mrla_light_epilogue_reference,
        mrla_light_gate,
    )
    from mrla_tpu.kernels.mrla_megatail import mrla_block_tail_fused_next

    B, H, W, C, C1, G = 8, 16, 16, 256, 64, 8
    rng = np.random.default_rng(1)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.bfloat16)
    out = jnp.maximum(mk(B, H, W, C), 0)
    idn = mk(B, H, W, C)
    wq = jnp.asarray(rng.standard_normal(5) * 0.2, jnp.float32)
    wk = jnp.asarray(rng.standard_normal(5) * 0.2, jnp.float32)
    wv = jnp.asarray(rng.standard_normal((3, 3, 1, C)) * 0.2, jnp.float32)
    lam = jnp.asarray(rng.standard_normal(C) * 0.2, jnp.float32)
    sc = jnp.asarray(rng.standard_normal(C) * 0.2 + 1, jnp.float32)
    bi = jnp.asarray(rng.standard_normal(C) * 0.2, jnp.float32)
    w1 = mk(C, C1)
    b1 = jnp.asarray(rng.standard_normal(C1) * 0.2, jnp.float32)

    y_ref = mrla_light_epilogue_reference(out, idn, wq, wk, wv, lam, sc, bi, G)
    x1_ref = jax.lax.conv_general_dilated(
        y_ref, w1.reshape(1, 1, C, C1).astype(y_ref.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x1_ref = jnp.maximum(x1_ref + b1.astype(x1_ref.dtype), 0)

    gate = mrla_light_gate(out, wq, wk, G)
    y, x1 = mrla_block_tail_fused_next(
        out, idn, gate, wv, lam, sc, bi, w1, b1
    )
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        rtol=0.05, atol=0.02,
    )
    np.testing.assert_allclose(
        np.asarray(x1, np.float32), np.asarray(x1_ref, np.float32),
        rtol=0.05, atol=0.02,
    )


def test_roialign_patch_fwd_onchip(tpu_backend):
    """COMPILED patch-DMA RoIAlign vs the XLA gather on the real chip
    (interpret mode hid the stage-4 kernel's bf16-roll Mosaic rejection
    for a whole round — every kernel needs one compiled-parity row)."""
    from mrla_tpu.detect.roi_align import batched_roi_align
    from mrla_tpu.kernels.roialign_patch import roi_align_patch

    rng = np.random.default_rng(0)
    sizes = [(64, 88), (32, 44), (16, 22), (8, 11)]
    feats = [
        jnp.asarray(rng.standard_normal((2, h, w, 128)), jnp.float32)
        for h, w in sizes
    ]
    scale = np.exp(rng.uniform(np.log(8.0), np.log(300.0), (2, 32)))
    ar = np.exp(rng.uniform(np.log(1 / 3), np.log(3.0), (2, 32)))
    w = scale * np.sqrt(ar)
    h = scale / np.sqrt(ar)
    cx = rng.uniform(0, 352, (2, 32))
    cy = rng.uniform(0, 256, (2, 32))
    rois = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    rois = jnp.asarray(
        np.clip(rois, [0, 0, 0, 0], [352, 256, 352, 256]), jnp.float32)
    valid = jnp.asarray(rng.random((2, 32)) > 0.1)
    for sr in (2, 0):
        with jax.default_matmul_precision("float32"):
            ref = batched_roi_align(feats, rois, valid, sampling_ratio=sr)
            got = roi_align_patch(feats, rois, valid, sampling_ratio=sr)
        rel = float(jnp.max(jnp.abs(ref - got))) / float(
            jnp.max(jnp.abs(ref)))
        assert rel < 1e-5, (sr, rel)


def test_roialign_patch_vjp_onchip(tpu_backend):
    """COMPILED backward (RMW-DMA scatter) grad parity on hardware."""
    from mrla_tpu.detect.roi_align import batched_roi_align
    from mrla_tpu.kernels.roialign_patch import roi_align_patch

    rng = np.random.default_rng(1)
    sizes = [(64, 88), (32, 44), (16, 22), (8, 11)]
    feats = [
        jnp.asarray(rng.standard_normal((2, h, w, 128)), jnp.float32)
        for h, w in sizes
    ]
    scale = np.exp(rng.uniform(np.log(8.0), np.log(300.0), (2, 48)))
    ar = np.exp(rng.uniform(np.log(1 / 3), np.log(3.0), (2, 48)))
    w = scale * np.sqrt(ar)
    h = scale / np.sqrt(ar)
    cx = rng.uniform(0, 352, (2, 48))
    cy = rng.uniform(0, 256, (2, 48))
    rois = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    rois = jnp.asarray(
        np.clip(rois, [0, 0, 0, 0], [352, 256, 352, 256]), jnp.float32)
    valid = jnp.asarray(rng.random((2, 48)) > 0.2)
    ct = jnp.asarray(rng.standard_normal((2, 48, 7, 7, 128)), jnp.float32)

    for sr in (2, 0):
        def lp(fs):
            return jnp.sum(
                roi_align_patch(fs, rois, valid, sampling_ratio=sr) * ct)

        def lx(fs):
            return jnp.sum(
                batched_roi_align(fs, rois, valid, sampling_ratio=sr) * ct)

        with jax.default_matmul_precision("float32"):
            gp = jax.jit(jax.grad(lp))(feats)
            gx = jax.jit(jax.grad(lx))(feats)
        for lvl, (a, b) in enumerate(zip(gp, gx)):
            s = float(jnp.max(jnp.abs(b))) + 1e-9
            d = float(jnp.max(jnp.abs(a - b)))
            assert d / s < 1e-5, (sr, lvl, d / s)


def test_stage4_resident_onchip(tpu_backend):
    """COMPILED stage-resident kernel vs the serving jnp chain (fp32,
    reduced width) — the test that would have caught the bf16-roll
    Mosaic rejection in round 4."""
    from tests.test_stage4_kernel import _mk_block

    from mrla_tpu.kernels.mrla_stage4 import (
        pack_stage4_params, stage4_resident)
    from mrla_tpu.serving.resnet_mrlal import _block, _conv

    rng = np.random.default_rng(0)
    cin, c1, c, ktap = 256, 128, 512, 5
    heads = c // 32
    p0 = _mk_block(rng, cin, c1, c, ktap, True)
    p1 = _mk_block(rng, c, c1, c, ktap, False)
    p2 = _mk_block(rng, c, c1, c, ktap, False)
    x = jnp.asarray(rng.standard_normal((8, 14, 14, cin)), jnp.float32)

    with jax.default_matmul_precision("float32"):
        y, _ = _block(x, p0, 2, heads, False)
        y, _ = _block(y, p1, 1, heads, False)
        ref, _ = _block(y, p2, 1, heads, False)

        ob = jax.nn.relu(_conv(jax.nn.relu(_conv(x, p0["k1"], p0["b1"])),
                               p0["k2"], p0["b2"], stride=2))
        packed = pack_stage4_params([p0, p1, p2], dtype=jnp.float32)
        got = stage4_resident(
            ob, x[:, ::2, ::2, :],
            {k: v for k, v in packed.items()
             if k not in ("heads", "ktap")},
            heads=packed["heads"], ktap=packed["ktap"], batch_tile=8,
        )
    rel = float(jnp.max(jnp.abs(ref - got))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 5e-4, rel


def test_deit_token_tail_onchip(tpu_backend):
    """COMPILED token-tail kernel vs the flax module (fp32)."""
    from mrla_tpu.kernels.deit_token_tail import (
        deit_token_tail, extract_tail_params, pack_tail_params)
    from mrla_tpu.models.deit_mrla import MRLALightTokenModule

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(16, 197, 384), jnp.float32)
    ot = jnp.asarray(rng.randn(16, 197, 384), jnp.float32)
    mod = MRLALightTokenModule(16)
    v = mod.init(jax.random.PRNGKey(0), x, ot)
    w, taps = pack_tail_params(extract_tail_params({"mrla": v["params"]}))
    with jax.default_matmul_precision("float32"):
        ref = x + mod.apply(v, x, ot)
        got = deit_token_tail(x, ot, w, taps)
    rel = float(jnp.max(jnp.abs(ref - got))) / float(jnp.max(jnp.abs(ref)))
    assert rel < 1e-4, rel

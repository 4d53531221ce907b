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

"""int8 PTQ serving engine (serving/quant.py).

Three guarantees:
  * implementation correctness: the int8 engine's logits match a fake-quant
    reference (f32 convs over the SAME dequantized tensors, same calibrated
    scales) at tight tolerance — the int path is exact integer arithmetic
    plus one dequant multiply, so any plumbing bug (wrong scale, wrong
    identity, wrong requant point) shows up here;
  * PTQ quality sanity: loose closeness + rank agreement vs the unquantized
    fp32 engine;
  * microbatch chains are bitwise equal to the unsplit program (per-sample
    math is batch-independent, as in the bf16 engine).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mrla_tpu.kernels.mrla_epilogue import mrla_light_epilogue_reference
from mrla_tpu.models.resnet_mrla_light import ResNetMRLALight
from mrla_tpu.serving.quant import (
    _strides_for,
    prepare_quant_params,
    resnet_mrlal_quant_forward,
)
from mrla_tpu.serving import prepare_inference_params, resnet_mrlal_forward
from mrla_tpu.serving.resnet_mrlal import _conv, _stem

LAYERS = (1, 1, 1, 1)


def _setup():
    model = ResNetMRLALight(layers=list(LAYERS), num_classes=10)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    variables = jax.device_get(variables)
    rng = np.random.default_rng(0)
    stats = jax.tree.map(
        lambda v: v + rng.uniform(0.1, 0.5, v.shape).astype(v.dtype),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    calib = jnp.asarray(rng.standard_normal((4, 64, 64, 3)), jnp.float32)
    qp = prepare_quant_params(variables, calib, layers=LAYERS, dim_perhead=32)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)), jnp.float32)
    return variables, qp, x


def _fake_quant_reference(qp, x, layers, dim_perhead=32):
    """f32 re-computation using the engine's own int8 kernels, dequantized."""

    def q(v, inv_scale):
        return jnp.clip(jnp.round(v.astype(jnp.float32) * inv_scale),
                        -127.0, 127.0)

    strides, _ = _strides_for(layers)
    y = _stem(x.astype(jnp.float32),
              jax.tree.map(lambda v: v.astype(jnp.float32), qp["stem"]))
    yq = q(y, qp["inv_a_stem"])
    for i, (p, stride) in enumerate(zip(qp["blocks"], strides)):
        heads = p["lam"].shape[0] // dim_perhead

        def deq_kernel(kq, m, s_in):
            # m[c] = s_in * sw[c]  ->  k_f32 = kq * sw
            return kq.astype(jnp.float32) * (m / s_in)

        a_in = float(p["a_in"])
        a1 = 1.0 / float(p["inv_a1"])
        a2 = 1.0 / float(p["inv_a2"])
        out1 = jax.nn.relu(
            _conv(yq * a_in, deq_kernel(p["k1q"], p["m1"], a_in), p["b1"])
        )
        q1 = q(out1, p["inv_a1"])
        out2 = jax.nn.relu(
            _conv(q1 * a1, deq_kernel(p["k2q"], p["m2"], a1), p["b2"],
                  stride=stride)
        )
        q2 = q(out2, p["inv_a2"])
        z = _conv(q2 * a2, deq_kernel(p["k3q"], p["m3"], a2), p["b3"])
        if "kdq" in p:
            identity = _conv(
                yq * a_in, deq_kernel(p["kdq"], p["md"], a_in), p["bd"],
                stride=stride,
            )
        else:
            identity = yq * a_in
        out = jax.nn.relu(z + identity).astype(jnp.bfloat16)
        y = mrla_light_epilogue_reference(
            out, identity.astype(jnp.bfloat16), p["wq"], p["wk"], p["wv"],
            p["lam"], p["bn_scale"], p["bn_bias"], heads,
        )
        if i < len(qp["blocks"]) - 1:
            yq = q(y, p["inv_ay"])
    pooled = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
    return pooled @ qp["fc"]["k"].astype(jnp.float32) + qp["fc"]["b"]


def test_int8_conv_exact_vs_numpy():
    """s8xs8->s32 conv is EXACT integer arithmetic — checked against a
    numpy integer accumulation (the scale-plumbing foundation)."""
    from mrla_tpu.serving.quant import _qconv

    rng = np.random.default_rng(3)
    x = rng.integers(-127, 128, (2, 6, 6, 8)).astype(np.int8)
    k = rng.integers(-127, 128, (3, 3, 8, 4)).astype(np.int8)
    m = rng.uniform(0.5, 1.5, 4).astype(np.float32)
    b = rng.uniform(-1, 1, 4).astype(np.float32)

    xp = np.pad(x.astype(np.int64), ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = np.zeros((2, 6, 6, 4), np.int64)
    for i in range(6):
        for j in range(6):
            patch = xp[:, i : i + 3, j : j + 3, :]  # [2,3,3,8]
            acc[:, i, j, :] = np.einsum(
                "bhwc,hwco->bo", patch, k.astype(np.int64)
            )
    want = acc.astype(np.float32) * m + b
    got = np.asarray(_qconv(jnp.asarray(x), jnp.asarray(k),
                            jnp.asarray(m), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_quant_engine_matches_fake_quant_reference():
    _, qp, x = _setup()
    got = np.asarray(
        resnet_mrlal_quant_forward(qp, x, layers=LAYERS, microbatch=0,
                                   quant_epilogue=False, quant_residual=True)
    )
    want = np.asarray(_fake_quant_reference(qp, x, LAYERS))
    # the int path (exact integer conv + one dequant multiply) and the f32
    # fake-quant path differ by f32 accumulation order, so values sitting
    # exactly on a round() boundary can land one quantization step apart
    # (knife-edge flips).  The bound below covers a few flips propagating;
    # a real plumbing bug (wrong scale / requant point / identity) is an
    # O(1)-relative error and still fails it.
    scale = np.max(np.abs(want)) + 1e-9
    assert np.max(np.abs(got - want)) / scale < 0.02, (
        np.max(np.abs(got - want)), scale
    )


@pytest.mark.parametrize(
    "qe,qres", [(False, True), (True, True), (False, False)]
)
def test_quant_close_to_fp32_engine(qe, qres):
    variables, qp, x = _setup()
    sp = prepare_inference_params(variables, layers=LAYERS, dtype=jnp.float32)
    ref = np.asarray(
        resnet_mrlal_forward(sp, x, layers=LAYERS, use_pallas=False)
    )
    got = np.asarray(
        resnet_mrlal_quant_forward(qp, x, layers=LAYERS, microbatch=0,
                                   quant_epilogue=qe, quant_residual=qres)
    )
    # PTQ is lossy; require close logits relative to the logit scale and
    # identical top-1 on every row.  The bf16-residual form is the
    # accuracy-safe one (no error accumulation through the requantized
    # carry) — hold it to a tighter bound.
    scale = np.max(np.abs(ref)) + 1e-9
    assert np.max(np.abs(got - ref)) / scale < (0.05 if not qres else 0.15)
    np.testing.assert_array_equal(np.argmax(got, -1), np.argmax(ref, -1))


@pytest.mark.parametrize(
    "qe,qres", [(False, True), (True, True), (False, False)]
)
def test_quant_microbatch_chains_bitwise_equal(qe, qres):
    _, qp, x = _setup()
    full = np.asarray(
        resnet_mrlal_quant_forward(qp, x, layers=LAYERS, microbatch=0,
                                   quant_epilogue=qe, quant_residual=qres)
    )
    split = np.asarray(
        resnet_mrlal_quant_forward(qp, x, layers=LAYERS, microbatch=2,
                                   quant_epilogue=qe, quant_residual=qres)
    )
    np.testing.assert_array_equal(full, split)


def test_quant_kernels_are_int8():
    _, qp, _ = _setup()
    for p in qp["blocks"]:
        assert p["k1q"].dtype == jnp.int8
        assert p["k2q"].dtype == jnp.int8
        assert p["k3q"].dtype == jnp.int8
        assert p["m1"].dtype == jnp.float32
        assert p["m1"].shape == (p["k1q"].shape[-1],)

"""Serving engine: BN-folded forward matches the Flax model (CPU, jnp path).

The Pallas kernel itself is TPU-only (tested in tests/test_kernels_tpu.py,
marked `tpu`); here the numerics of the serving restructure — BN folding,
space-to-depth stem, folded epilogue — are verified against model.apply."""

import numpy as np
import jax
import jax.numpy as jnp

import pytest

from mrla_tpu.models.resnet_mrla_light import ResNetMRLALight
from mrla_tpu.serving import (
    prepare_inference_params,
    prepare_mrlab_inference_params,
    resnet_mrlab_forward,
    resnet_mrlal_forward,
)


@pytest.mark.parametrize("s2d", [False, True])
def test_serving_matches_flax(s2d):
    layers = (1, 1, 1, 1)
    model = ResNetMRLALight(layers=list(layers), num_classes=10)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    # make BN stats non-trivial so folding is actually exercised
    variables = jax.device_get(variables)
    rng = np.random.default_rng(0)
    stats = jax.tree.map(
        lambda v: v + rng.uniform(0.1, 0.5, v.shape).astype(v.dtype),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    want = np.asarray(
        model.apply(jax.tree.map(jnp.asarray, variables), x, train=False)
    )

    sp = prepare_inference_params(variables, layers=layers, dtype=jnp.float32,
                                  s2d=s2d)
    assert ("k_s2d" in sp["stem"]) == s2d
    got = np.asarray(
        resnet_mrlal_forward(sp, x, layers=layers, use_pallas=False)
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=3e-4)


def test_serving_bf16_agrees_on_predictions():
    layers = (1, 1, 1, 1)
    model = ResNetMRLALight(layers=list(layers), num_classes=10)
    variables = jax.device_get(
        model.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)), train=False)
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)), jnp.float32)
    want = np.asarray(
        model.apply(jax.tree.map(jnp.asarray, variables), x, train=False)
    )
    sp = prepare_inference_params(variables, layers=layers, dtype=jnp.bfloat16)
    got = np.asarray(resnet_mrlal_forward(sp, x, layers=layers, use_pallas=False))
    assert (got.argmax(-1) == want.argmax(-1)).all()


@pytest.mark.parametrize("use_scan", [False, True])
def test_mrlab_serving_matches_flax(use_scan):
    """MRLA-base engine (eq.6 cache path): BN-folded forward == model.apply,
    in both the unrolled growing-cache and the scanned masked-cache forms."""
    from mrla_tpu.models.resnet_mrla_base import ResNetMRLABase

    layers = (2, 2, 2, 2)
    model = ResNetMRLABase(layers=list(layers), num_classes=10)
    variables = jax.device_get(
        model.init(jax.random.key(3), jnp.zeros((1, 64, 64, 3)), train=False)
    )
    rng = np.random.default_rng(3)
    stats = jax.tree.map(
        lambda v: v + rng.uniform(0.1, 0.5, v.shape).astype(v.dtype),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    want = np.asarray(
        model.apply(jax.tree.map(jnp.asarray, variables), x, train=False)
    )
    sp = prepare_mrlab_inference_params(variables, layers=layers,
                                        dtype=jnp.float32)
    got = np.asarray(
        resnet_mrlab_forward(sp, x, layers=layers, use_scan=use_scan)
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=3e-4)


def test_mrlab22_serving_matches_flax():
    """base22 variant: 7x7 stem, no ReLU on attn."""
    from mrla_tpu.models.resnet_mrla_base import ResNetMRLABase

    layers = (1, 2, 1, 1)
    model = ResNetMRLABase(layers=list(layers), num_classes=10,
                           deep_stem=False, relu_on_attn=False)
    variables = jax.device_get(
        model.init(jax.random.key(4), jnp.zeros((1, 64, 64, 3)), train=False)
    )
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    want = np.asarray(
        model.apply(jax.tree.map(jnp.asarray, variables), x, train=False)
    )
    sp = prepare_mrlab_inference_params(variables, layers=layers,
                                        dtype=jnp.float32, deep_stem=False)
    got = np.asarray(
        resnet_mrlab_forward(sp, x, layers=layers, relu_on_attn=False)
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=3e-4)


def test_microbatch_chains_bitwise_equal():
    """Microbatched serving (independent chains) must be BITWISE identical
    to the unsplit forward — per-sample math is batch-independent."""
    import numpy as np
    from mrla_tpu.models import create_model
    from mrla_tpu.serving import prepare_inference_params, resnet_mrlal_forward

    model = create_model("resnet50_mrlal")
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.float32), train=False
    )
    sp = prepare_inference_params(jax.device_get(variables))
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((16, 64, 64, 3)), jnp.float32
    )
    full = resnet_mrlal_forward(sp, x, microbatch=0)
    # both split forms: shared stem (the shipped default) and full split
    shared = resnet_mrlal_forward(sp, x, microbatch=4, shared_stem=True)
    split = resnet_mrlal_forward(sp, x, microbatch=4, shared_stem=False)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(shared))
    np.testing.assert_array_equal(np.asarray(full), np.asarray(split))


def test_mrlab_microbatch_chains_bitwise_equal():
    """Same guarantee for the eq.6 cache engine (microbatch is opt-in there
    — it loses on-chip — but must stay numerically exact)."""
    import numpy as np
    from mrla_tpu.models import create_model
    from mrla_tpu.serving import (
        prepare_mrlab_inference_params, resnet_mrlab_forward,
    )

    model = create_model("resnet50_mrlab")
    variables = model.init(
        jax.random.key(1), jnp.zeros((1, 64, 64, 3), jnp.float32), train=False
    )
    sp = prepare_mrlab_inference_params(jax.device_get(variables))
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((8, 64, 64, 3)), jnp.float32
    )
    full = resnet_mrlab_forward(sp, x, microbatch=0)
    split = resnet_mrlab_forward(sp, x, microbatch=2)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(split))

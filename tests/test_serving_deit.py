"""DeiT-family serving engine: bf16 pre-cast params == bf16-model eval.

The engine is the same computation as `model.apply(..., train=False)` with
dtype=bfloat16, just with the weight casts hoisted to load time — so the
parity bar vs the bf16 flax path is tight, and vs the fp32 path it is the
usual bf16 tolerance + argmax agreement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrla_tpu.models import create_model
from mrla_tpu.serving import deit_forward, prepare_deit_inference_params


@pytest.mark.parametrize("arch", [
    "deit_mrlal_tiny_patch16_224",
    "deit_mrlab_tiny_patch16_224",
    "deit_tiny_distilled_patch16_224",
])
def test_deit_engine_matches_flax(arch):
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 224, 224, 3)), jnp.float32)

    model32 = create_model(arch, num_classes=31)
    variables = model32.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)),
                             train=False)
    # randomize the head at a larger scale so the logit comparison
    # exercises the trunk features strongly
    params = jax.tree_util.tree_map(lambda a: a, variables["params"])

    def randomize_heads(node):
        for k, v in node.items():
            if k.startswith("head") and isinstance(v, dict) and "kernel" in v:
                v["kernel"] = jnp.asarray(
                    rng.standard_normal(v["kernel"].shape) * 0.05, jnp.float32)
            elif isinstance(v, dict):
                randomize_heads(v)

    randomize_heads(params)
    variables = {**variables, "params": params}
    ref32 = model32.apply(variables, x, train=False)
    assert float(jnp.std(ref32)) > 1e-3  # non-degenerate logits

    model, cast = prepare_deit_inference_params(arch, variables,
                                                num_classes=31)
    got = deit_forward(model, cast, x.astype(jnp.bfloat16))
    assert got.dtype == jnp.float32
    # bf16-model reference using the original fp32 params
    ref16 = model.apply(variables, x.astype(jnp.bfloat16), train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref16),
                               atol=0.08, rtol=0.05)
    # fp32 sanity: magnitudes stay close through the bf16 trunk
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref32), atol=0.15)


def test_precast_engine_efficientnet():
    """The pre-cast engine is arch-agnostic: drive it with the BN-family
    efficientnet_mrlal_b0 (eval-mode BN reads fp32 running stats; conv
    compute in bf16) and hold it to the bf16-model reference."""
    from mrla_tpu.serving import (
        precast_forward, prepare_precast_inference_params,
    )

    arch = "efficientnet_mrlal_b0"
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    model32 = create_model(arch, num_classes=17)
    variables = model32.init(jax.random.key(3), jnp.zeros((1, 64, 64, 3)),
                             train=False)
    # widen the classifier so the logit comparison exercises the trunk
    params = jax.device_get(variables["params"])
    params["classifier"]["kernel"] = jnp.asarray(
        rng.standard_normal(params["classifier"]["kernel"].shape) * 0.05,
        jnp.float32,
    )
    variables = {**variables, "params": params}
    # At random init the BN running stats (mean 0, var 1) don't normalize,
    # so silu/SE attenuate activations multiplicatively across the 16
    # MBConv blocks and eval logits degenerate to ~0.  Populate the stats
    # with a few train-mode passes (momentum 0.9 -> ~90% converged) so the
    # eval path is numerically meaningful.
    for _ in range(24):
        _, upd = model32.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"droppath": jax.random.key(9),
                  "dropout": jax.random.key(10)},
        )
        variables = {**variables, "batch_stats": upd["batch_stats"]}
    ref32 = model32.apply(variables, x, train=False)
    assert float(jnp.std(ref32)) > 1e-4

    model, cast = prepare_precast_inference_params(arch, variables,
                                                   num_classes=17)
    got = precast_forward(model, cast, x.astype(jnp.bfloat16))
    assert got.dtype == jnp.float32
    ref16 = model.apply(variables, x.astype(jnp.bfloat16), train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref16),
                               atol=0.08, rtol=0.05)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref32),
                               atol=0.3, rtol=0.1)


def test_deit_microbatch_chains_bitwise_equal():
    """Microbatched DeiT serving must be BITWISE identical to the unsplit
    forward (LayerNorm/attention are per-sample math)."""
    arch = "deit_mrlal_tiny_patch16_224"
    model32 = create_model(arch, num_classes=11)
    variables = model32.init(
        jax.random.key(2), jnp.zeros((1, 224, 224, 3)), train=False
    )
    model, cast = prepare_deit_inference_params(arch, variables,
                                                num_classes=11)
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((8, 224, 224, 3)),
        jnp.bfloat16,
    )
    full = deit_forward(model, cast, x, microbatch=0)
    split = deit_forward(model, cast, x, microbatch=2)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(split))

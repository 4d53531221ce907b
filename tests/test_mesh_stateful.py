"""Mesh coverage for the STATEFUL model families (VERDICT r2 next-4).

Round 2 exercised only resnet50_mrlal under the 8-virtual-device mesh; the
models where a sharding bug would hide were never run under it: the MRLA-base
K/V cache concatenates along a NON-batch axis (layer axis t,
resnet_mrla_base.py:246-261), and the token-layout DeiT broadcasts a cls
token and carries EMA + distillation state.  These tests assert 8-way DP ==
single-device for both, scan and unrolled mrlab forms included.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from mrla_tpu.parallel import make_mesh, shard_batch
from mrla_tpu.train import create_train_state, make_train_step


def _dp_vs_single(model, batch, *, has_droppath=False, has_dropout=False,
                  ema_decay=0.0, teacher_fn=None, distill_kind="none",
                  atol=1e-4):
    """Run one train step single-device and 8-way DP; assert equal.

    Loss must match to fp32 round-off; params get atol 1e-4 — partitioned
    BN-stat/gradient reductions legitimately reorder fp32 sums (measured
    worst-case delta ~4e-5 on this model family)."""
    sample = jnp.zeros((8,) + batch["image"].shape[1:], jnp.float32)
    tx = optax.sgd(0.05, momentum=0.9)
    state = create_train_state(model, jax.random.key(0), sample, tx,
                               ema_decay=ema_decay)
    step = make_train_step(
        has_droppath=has_droppath, has_dropout=has_dropout,
        teacher_fn=teacher_fn, distill_kind=distill_kind,
    )

    s1, m1 = jax.jit(step)(state, jax.tree.map(jnp.asarray, batch),
                           jax.random.key(2))

    mesh = make_mesh(axes=("data", "model"), shape=(8, 1))
    state8 = jax.device_put(state, NamedSharding(mesh, P()))
    with mesh:
        s8, m8 = jax.jit(step)(state8, shard_batch(batch, mesh),
                               jax.random.key(2))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=atol)
    if ema_decay > 0:
        for a, b in zip(jax.tree.leaves(s1.ema_params),
                        jax.tree.leaves(s8.ema_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=atol)
    return s1, s8


def _image_batch(seed, b=16, size=32, classes=10):
    rng = np.random.default_rng(seed)
    return {
        "image": rng.standard_normal((b, size, size, 3)).astype(np.float32),
        "label": (np.arange(b) % classes).astype(np.int32),
    }


def test_mrlab_unrolled_dp_matches_single_device():
    """Growing K/V cache (t up to 2) under batch sharding: the cache concat
    is along axis t, the batch stays the leading sharded axis throughout."""
    from mrla_tpu.models.resnet_mrla_base import ResNetMRLABase

    model = ResNetMRLABase(layers=[2, 1], num_classes=10, use_scan=False)
    _dp_vs_single(model, _image_batch(0))


def test_mrlab_scan_dp_matches_single_device():
    """Masked fixed-buffer lax.scan form (the deep-variant default) under
    the same 8-way DP mesh."""
    from mrla_tpu.models.resnet_mrla_base import ResNetMRLABase

    model = ResNetMRLABase(layers=[2, 2], num_classes=10, use_scan=True)
    _dp_vs_single(model, _image_batch(1))


def test_deit_mrlal_ema_distill_dp_matches_single_device():
    """Token-layout DeiT MRLA-light with EMA and a hard-distillation
    teacher: cls-token broadcast, token<->grid reshapes, EMA update and the
    teacher forward all under the 8-way mesh."""
    from mrla_tpu.models.deit_mrla import ViTMRLA
    from mrla_tpu.models.deit import VisionTransformer

    model = ViTMRLA(embed_dim=64, depth=2, num_heads=2, dim_mrla=16,
                    variant="light", patch_size=8, num_classes=10)
    teacher = VisionTransformer(embed_dim=32, depth=1, num_heads=2,
                                patch_size=8, num_classes=10)
    t_vars = teacher.init(jax.random.key(7), jnp.zeros((1, 32, 32, 3)),
                          train=False)
    teacher_fn = lambda x: teacher.apply(t_vars, x, train=False)

    _dp_vs_single(
        model, _image_batch(2), ema_decay=0.99,
        teacher_fn=teacher_fn, distill_kind="hard",
    )


def test_deit_mrlab_dp_matches_single_device():
    """MRLA-base token variant: the per-4-block cache reset
    (deit_mrla_base.py:261-264) under batch sharding."""
    from mrla_tpu.models.deit_mrla import ViTMRLA

    model = ViTMRLA(embed_dim=64, depth=2, num_heads=2, dim_mrla=16,
                    variant="base", patch_size=8, num_classes=10,
                    mrlab_size=2)
    _dp_vs_single(model, _image_batch(3))

"""Jittable train / eval steps.

The hot loop of the reference trainers (resnet/train.py:387-413,
deit/engine.py:30-59) becomes two pure functions.  Under a Mesh with the
batch dim sharded over 'data', jit/GSPMD emits the gradient all-reduce that
DDP performed — no explicit collectives (SURVEY.md §2.5).

BN note: running stats are updated per the *global* batch here (XLA reduces
across shards inside the BN mean/var when the batch dim is sharded) — the
reference keeps per-replica stats (SyncBN commented out).  For inference
parity this is moot (converted running stats are used verbatim).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from mrla_tpu.train.losses import cross_entropy
from mrla_tpu.train.state import TrainState


def make_train_step(
    loss_fn: Callable = cross_entropy,
    grad_clip_norm: Optional[float] = None,
    has_droppath: bool = False,
    has_dropout: bool = False,
    teacher_fn: Optional[Callable] = None,
    distill_kind: str = "none",
    distill_alpha: float = 0.5,
    distill_tau: float = 1.0,
):
    """Build a jittable train step.

    batch: {"image": [B,H,W,C], "label": [B] int or [B,K] soft}.
    teacher_fn(images) -> logits enables DeiT-style distillation
    (deit/losses.py semantics): distilled student models return
    (cls_logits, dist_logits) in train mode — base loss applies to cls,
    the distillation term to dist; plain models use their single head for
    both.  Returns (new_state, metrics).
    """
    from mrla_tpu.train.losses import distillation_loss

    def train_step(state: TrainState, batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        rng_names = []
        if has_droppath:
            rng_names.append("droppath")
        if has_dropout:
            rng_names.append("dropout")
        rngs = dict(zip(rng_names, jax.random.split(rng, max(1, len(rng_names)))))

        def compute_loss(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                # flax returns (out, mutated_vars) for ANY non-False
                # mutable — including [] — so only pass it when we truly
                # collect batch_stats, else stats-free models (DeiT) would
                # mis-unpack the tuple as their logits
                logits, new_model_state = state.apply_fn(
                    variables,
                    batch["image"],
                    train=True,
                    mutable=["batch_stats"],
                    rngs=rngs or None,
                )
            else:
                logits = state.apply_fn(
                    variables, batch["image"], train=True, rngs=rngs or None
                )
                new_model_state = {}
            if isinstance(logits, tuple):
                cls_logits, dist_logits = logits
            else:
                cls_logits = dist_logits = logits
            loss = loss_fn(cls_logits, batch["label"])
            if teacher_fn is not None and distill_kind != "none":
                t_logits = jax.lax.stop_gradient(teacher_fn(batch["image"]))
                loss = distillation_loss(
                    loss, dist_logits, t_logits, kind=distill_kind,
                    alpha=distill_alpha, tau=distill_tau,
                )
            return loss, (cls_logits, new_model_state)

        (loss, (logits, new_model_state)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)

        if grad_clip_norm is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip_norm / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)

        new_state = state.apply_gradients(
            grads=grads,
            batch_stats=new_model_state.get("batch_stats", state.batch_stats),
        )
        if state.ema_params is not None:
            d = state.ema_decay
            ema = lambda e, p: d * e + (1.0 - d) * p
            new_state = new_state.replace(
                ema_params=jax.tree.map(ema, state.ema_params, new_state.params)
            )
            if state.ema_batch_stats is not None:
                # timm ModelEma decays buffers too (running mean/var).
                new_state = new_state.replace(
                    ema_batch_stats=jax.tree.map(
                        ema, state.ema_batch_stats, new_state.batch_stats
                    )
                )

        metrics = {"loss": loss}
        if batch["label"].ndim == 1:
            metrics["accuracy"] = jnp.mean(
                (jnp.argmax(logits, -1) == batch["label"]).astype(jnp.float32)
            )
        return new_state, metrics

    return train_step


def make_eval_step(use_ema: bool = False):
    """Build a jittable eval step returning summed top-1/top-5 correct counts.

    batch may carry a boolean "valid" mask [B] so ragged final batches can be
    padded to a device-count multiple and the padding excluded from the sums
    (the reference's drop_last=False val loader, resnet/train.py:268-272).
    """

    def eval_step(state: TrainState, batch):
        if use_ema:
            # Fail loudly at trace time rather than silently evaluating raw
            # params when a restored state carries no EMA (empty dict/None).
            if not state.ema_params:
                raise ValueError(
                    "use_ema=True but state.ema_params is empty — restore a "
                    "state trained with --ema-decay or evaluate without EMA"
                )
            params = state.ema_params
            batch_stats = (
                state.ema_batch_stats if state.ema_batch_stats else state.batch_stats
            )
        else:
            params = state.params
            batch_stats = state.batch_stats
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits = state.apply_fn(variables, batch["image"], train=False)
        k = min(5, logits.shape[-1])
        top5 = jax.lax.top_k(logits, k)[1]  # [B, k]
        labels = batch["label"][:, None]
        valid = batch.get("valid")
        if valid is None:
            valid = jnp.ones((labels.shape[0],), bool)
        return {
            "top1": jnp.sum((top5[:, :1] == labels).any(axis=-1) & valid),
            "top5": jnp.sum((top5 == labels).any(axis=-1) & valid),
            "count": jnp.sum(valid.astype(jnp.int32)),
        }

    return eval_step

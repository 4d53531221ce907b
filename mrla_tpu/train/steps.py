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
            mutable = []
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out = state.apply_fn(
                variables,
                batch["image"],
                train=True,
                mutable=mutable,
                rngs=rngs or None,
            )
            logits, new_model_state = out if mutable else (out, {})
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
            new_ema = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p, state.ema_params, new_state.params
            )
            new_state = new_state.replace(ema_params=new_ema)

        metrics = {"loss": loss}
        if batch["label"].ndim == 1:
            metrics["accuracy"] = jnp.mean(
                (jnp.argmax(logits, -1) == batch["label"]).astype(jnp.float32)
            )
        return new_state, metrics

    return train_step


def make_eval_step(use_ema: bool = False):
    """Build a jittable eval step returning summed top-1/top-5 correct counts."""

    def eval_step(state: TrainState, batch):
        params = state.ema_params if (use_ema and state.ema_params) else state.params
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        logits = state.apply_fn(variables, batch["image"], train=False)
        k = min(5, logits.shape[-1])
        top5 = jax.lax.top_k(logits, k)[1]  # [B, k]
        labels = batch["label"][:, None]
        return {
            "top1": jnp.sum((top5[:, :1] == labels).any(axis=-1)),
            "top5": jnp.sum((top5 == labels).any(axis=-1)),
            "count": jnp.asarray(labels.shape[0], jnp.int32),
        }

    return eval_step

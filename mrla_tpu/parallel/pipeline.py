"""Pipeline parallelism (GPipe schedule) for the homogeneous-depth DeiT family.

The reference implements only data parallelism (SURVEY.md §2.4); this module
adds a TPU-native pipeline axis on top of it, the way the hardware wants it
done: the transformer's identical blocks are STACKED along a leading stage
axis, that axis is sharded over a 'pipe' mesh axis with `shard_map`, and
microbatches flow device-to-device over ICI via `lax.ppermute` in a
`lax.scan` GPipe schedule.  No per-stage programs, no send/recv runtime —
one SPMD program, XLA pipelines the permutes against stage compute.

Scope (documented restrictions, by design):
  * DeiT MRLA-light + plain-DeiT topologies only: their `depth` blocks are
    shape-homogeneous, so per-stage params stack into one pytree and every
    stage runs the same code (SPMD).  The conv families have heterogeneous
    stage shapes (spatial/channel changes per stage) and MRLA-base threads a
    GROWING K/V cache across blocks (resnet_mrla_base.py:246-261) — both
    break the stacked-stage form; they scale with dp x tp instead.
  * Deterministic compute graph (dropout/droppath rate 0): stochastic depth
    would need per-(block, microbatch) PRNG threading through the schedule.
    The reference's pp story is empty, so this is additive capability.

Layouts:
  * `stack_block_params(params, depth)` -> (stacked [L, ...] tree, rest):
    differentiable, so `forward(params, x)` accepts ordinary model params
    and grads land back in the per-block layout (used by the equivalence
    tests and the dryrun).
  * For production residency, `pipeline_shardings(mesh, stacked)` places the stacked
    tree with `P('pipe')` so each device stores only its own stage's params
    and optimizer state; `forward_from_stacked` consumes that layout
    directly inside the train step.

Bubble accounting: M microbatches over S stages run M+S-1 ticks, so the
schedule efficiency is M/(M+S-1); pick M >= 4*S for >80% (classic GPipe).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "stack_block_params",
    "unstack_block_params",
    "gpipe_spmd",
    "pipeline_shardings",
    "make_pipelined_vit",
]


def _block_keys(params: Any, prefix: str) -> list[str]:
    keys = [
        k
        for k in params
        if k.startswith(prefix) and k[len(prefix) :].isdigit()
    ]
    return sorted(keys, key=lambda k: int(k[len(prefix) :]))


def stack_block_params(params: Any, depth: int, prefix: str = "block"):
    """Split model params into (stacked block tree [depth, ...], rest).

    Differentiable (jnp.stack), so callers may stack inside a jitted loss
    and receive grads in the original per-block layout.
    """
    keys = _block_keys(params, prefix)
    assert len(keys) == depth, f"found {len(keys)} '{prefix}*' trees, want {depth}"
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *[params[k] for k in keys])
    rest = {k: v for k, v in params.items() if k not in set(keys)}
    return stacked, rest


def unstack_block_params(stacked: Any, rest: Any, prefix: str = "block"):
    """Inverse of stack_block_params: rebuild the flax param dict."""
    depth = jax.tree.leaves(stacked)[0].shape[0]
    out = dict(rest)
    for i in range(depth):
        out[f"{prefix}{i}"] = jax.tree.map(lambda x: x[i], stacked)
    return out


def gpipe_spmd(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stage_params: Any,
    x_mb: jax.Array,
    num_stages: int,
    axis: str = "pipe",
) -> jax.Array:
    """SPMD GPipe schedule — call INSIDE shard_map over `axis`.

    stage_fn(stage_params, x) applies this device's span of blocks to one
    microbatch.  x_mb is [M, mb, ...]; returns [M, mb, ...] outputs,
    psum-broadcast so every pipe rank holds the result.  Gradient-safe:
    warmup/drain garbage never reaches the output buffer (masked writes),
    and duplicate injections after t >= M are discarded with the final
    carry, so no spurious gradient paths exist.
    """
    s = num_stages
    m = x_mb.shape[0]
    p = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % s) for i in range(s)]
    state = jnp.zeros_like(x_mb[0])
    outbuf = jnp.zeros_like(x_mb)

    def tick(carry, t):
        state, outbuf = carry
        # stage 0 injects microbatch t (clamped reads past M never complete
        # the pipeline before the scan ends, so they are dead paths);
        # every other stage consumes what its predecessor permuted over.
        x_in = jnp.where(p == 0, x_mb[jnp.minimum(t, m - 1)], state)
        y = stage_fn(stage_params, x_in)
        out_idx = t - (s - 1)
        idx = jnp.clip(out_idx, 0, m - 1)
        old = jax.lax.dynamic_slice_in_dim(outbuf, idx, 1, axis=0)
        valid = jnp.logical_and(p == s - 1, out_idx >= 0)
        new = jnp.where(valid, y[None].astype(outbuf.dtype), old)
        outbuf = jax.lax.dynamic_update_slice_in_dim(outbuf, new, idx, axis=0)
        state = jax.lax.ppermute(y, axis, perm)
        return (state, outbuf), None

    (_, outbuf), _ = jax.lax.scan(
        tick, (state, outbuf), jnp.arange(m + s - 1)
    )
    # broadcast the last stage's buffer to every pipe rank
    return jax.lax.psum(
        jnp.where(p == s - 1, outbuf, jnp.zeros_like(outbuf)), axis
    )


def pipeline_shardings(mesh: Mesh, tree: Any, axis: str = "pipe") -> Any:
    """NamedShardings placing a stacked block tree's leading axis on `axis`."""
    sh = NamedSharding(mesh, PartitionSpec(axis))
    return jax.tree.map(lambda _: sh, tree)


def make_pipelined_vit(
    model,
    mesh: Mesh,
    num_microbatches: int,
    pipe_axis: str = "pipe",
    data_axis: Optional[str] = None,
):
    """Pipeline-parallel forward for a ViTMRLA('light') or plain DeiT model.

    Returns (forward, forward_from_stacked):
      forward(params, x, train=False)   -> logits   (stacks inside; grads in
                                                     the per-block layout)
      forward_from_stacked(stacked, rest, x, train=False) -> logits
                                                    (production layout:
                                                     stacked tree sharded
                                                     P('pipe') end to end)
    For distilled models train=True returns (logits, logits_dist).

    Topology parity: identical math to the container's __call__ at drop
    rates 0 (models/deit_mrla.py:143-190, models/deit.py:146-201) — patch
    embed + cls/dist/pos outside the pipeline (tiny, replicated), the
    `depth` blocks pipelined, final norm/head(s) outside.  The cls token
    rides inside the token axis, so the reference's cls-bypass quirk
    (deit_mrla_light.py:199-207) is preserved by the block module itself.

    Distilled models: pass ``train=True`` to the returned forwards to get
    the separate ``(logits, logits_dist)`` pair (the reference's
    distillation objective, models.py train-mode head semantics); the
    default returns the eval-mode (head + head_dist)/2 average.

    The pipelined graph is DETERMINISTIC: dropout/stochastic-depth are not
    threaded through the schedule, so models configured with nonzero drop
    rates are rejected here rather than silently trained without them.
    """
    from mrla_tpu.models.deit import PatchEmbed, ViTBlock, VisionTransformer
    from mrla_tpu.models.deit_mrla import MRLAViTBlock, ViTMRLA

    for attr in ("drop_rate", "attn_drop_rate", "drop_path_rate"):
        rate = getattr(model, attr)
        assert rate == 0.0, (
            f"pipelined forward is deterministic but model.{attr}={rate}; "
            "stochastic depth/dropout are not threaded through the GPipe "
            "schedule — construct the model with drop rates 0 to pipeline "
            "it (see module docstring)"
        )
    if isinstance(model, ViTMRLA):
        assert model.variant == "light", (
            "mrlab's growing K/V cache crosses stage boundaries with "
            "non-uniform shapes; pipeline the light variant"
        )
        block = MRLAViTBlock(
            model.num_heads, model.dim_mrla, "light", model.mlp_ratio,
            model.qkv_bias, 0.0, 0.0, 0.0, model.dtype,
        )

        def apply_block(p, x):
            y, _ = block.apply({"params": p}, x, None, False)
            return y

        distilled = False
    elif isinstance(model, VisionTransformer):
        block = ViTBlock(
            model.num_heads, model.mlp_ratio, model.qkv_bias,
            0.0, 0.0, 0.0, model.dtype,
        )

        def apply_block(p, x):
            return block.apply({"params": p}, x, False)

        distilled = model.distilled
    else:
        raise TypeError(
            f"unsupported model for pipelining: {type(model).__name__} "
            "(need shape-homogeneous 'block{i}' stages)"
        )
    stages = mesh.shape[pipe_axis]
    depth = model.depth
    assert depth % stages == 0, f"depth {depth} % pipe {stages} != 0"
    m = num_microbatches

    embed = PatchEmbed(model.patch_size, model.embed_dim, model.dtype)
    norm = nn.LayerNorm(epsilon=1e-6, dtype=model.dtype)
    head = nn.Dense(model.num_classes, dtype=model.dtype)

    def stage_fn(stacked, x):
        def body(x, p):
            return apply_block(p, x), None

        y, _ = jax.lax.scan(body, x, stacked)
        return y

    mb_spec = PartitionSpec(None, data_axis) if data_axis else PartitionSpec()
    sched = jax.shard_map(
        functools.partial(gpipe_spmd, stage_fn, num_stages=stages, axis=pipe_axis),
        mesh=mesh,
        in_specs=(PartitionSpec(pipe_axis), mb_spec),
        out_specs=mb_spec,
        check_vma=False,
    )

    def forward_from_stacked(stacked, rest, x, train=False):
        b = x.shape[0]
        assert b % m == 0, f"batch {b} % microbatches {m} != 0"
        c = model.embed_dim
        tokens = embed.apply({"params": rest["patch_embed"]}, x.astype(model.dtype))
        n = tokens.shape[1]
        parts = [jnp.broadcast_to(rest["cls_token"].astype(tokens.dtype), (b, 1, c))]
        if distilled:
            parts.append(
                jnp.broadcast_to(rest["dist_token"].astype(tokens.dtype), (b, 1, c))
            )
        nt = n + len(parts)
        h = jnp.concatenate(parts + [tokens], axis=1)
        h = h + rest["pos_embed"].astype(h.dtype)
        out = sched(stacked, h.reshape(m, b // m, nt, c))
        h = out.reshape(b, nt, c)
        h = norm.apply({"params": rest["norm"]}, h)
        logits = head.apply({"params": rest["head"]}, h[:, 0])
        if distilled:
            logits_dist = head.apply({"params": rest["head_dist"]}, h[:, 1])
            if train:
                # reference train-mode head semantics (models.py): the
                # distillation objective needs the separate pair
                return (
                    logits.astype(jnp.float32),
                    logits_dist.astype(jnp.float32),
                )
            return ((logits + logits_dist) / 2).astype(jnp.float32)
        return logits.astype(jnp.float32)

    def forward(params, x, train=False):
        stacked, rest = stack_block_params(params, depth)
        return forward_from_stacked(stacked, rest, x, train)

    return forward, forward_from_stacked

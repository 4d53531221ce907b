"""resnet_mrlal inference engine (bf16, BN-folded).

Numerics: identical math to ResNetMRLALight.apply(train=False) — verified by
tests — but restructured for serving speed:

  * every BatchNorm is folded into the preceding conv at *load* time
    (prepare_inference_params): kernel' = kernel · γ/√(var+ε) over the
    output channel, bias' = β − mean·γ/√(var+ε).  No normalization work at
    run time.
  * params are pre-cast to bf16 once (conv kernels) so no per-step casts.
  * the DEFAULT epilogue path is jnp: two rounds of kernel engineering
    (ROADMAP.md perf ledger) established that XLA pipelines activations
    through VMEM (S(1) buffers) between fusions, and ANY custom call forces
    an HBM spill copy at its boundary — so the fused Pallas mega-tail
    (kernels/mrla_megatail.py), despite winning isolated by 1.4x, loses
    in-model.  use_pallas=True keeps it available (numerics verified).

Layer layout comes from the Flax model's param tree, so converted PyTorch
checkpoints (mrla_tpu.ckpt) and orbax-trained params both work unchanged.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mrla_tpu.kernels.mrla_epilogue import (
    mrla_light_epilogue_reference,
    mrla_light_gate,
)
from mrla_tpu.kernels.mrla_megatail import mrla_block_tail_fused_next
from mrla_tpu.ops.common import max_pool_same_torch

BN_EPS = 1e-5


def _fold(conv_kernel, bn):
    """Fold BN (scale,bias,mean,var) into a conv kernel; returns (k', b')."""
    k = np.asarray(conv_kernel, np.float32)
    s = np.asarray(bn["scale"], np.float32) / np.sqrt(
        np.asarray(bn["var"], np.float32) + BN_EPS
    )
    b = np.asarray(bn["bias"], np.float32) - np.asarray(bn["mean"], np.float32) * s
    return k * s, b


def _bn_affine(bn):
    s = np.asarray(bn["scale"], np.float32) / np.sqrt(
        np.asarray(bn["var"], np.float32) + BN_EPS
    )
    b = np.asarray(bn["bias"], np.float32) - np.asarray(bn["mean"], np.float32) * s
    return s, b


def prepare_inference_params(
    variables: Dict, layers: Sequence[int] = (3, 4, 6, 3), dtype=jnp.bfloat16,
    with_head: bool = True, s2d: bool = False,
) -> Dict:
    """Fold BNs and pre-cast; returns a flat serving param tree.

    with_head=False serves a features_only tree (detection backbone — no
    fc).

    s2d=True additionally packs a space-to-depth stem kernel, which _stem
    prefers when present.  OFF by default: under the honest (input-
    perturbed) benchmark harness the repack transpose costs more than the
    7x7 conv saves at every measured size — 224px classification −6.6%
    (scripts/exp_benchperturb3.py) and COCO 800x1344 −15%
    (scripts/exp_detect_variants.py).  The earlier harness perturbed a stem
    bias, which let XLA hoist the constant-input repack+conv out of the
    timing loop and hid this cost (scripts/exp_benchperturb.py)."""
    params = variables["params"]
    stats = variables["batch_stats"]

    def bn(path_parts):
        node_p = params
        node_s = stats
        for p in path_parts:
            node_p = node_p[p]
            node_s = node_s[p]
        return {**node_p, **node_s}

    out: Dict[str, Any] = {}

    k, b = _fold(params["stem"]["conv1"]["kernel"], bn(("stem", "bn1")))
    out["stem"] = {"k": jnp.asarray(k, dtype), "b": jnp.asarray(b, dtype)}
    if s2d:
        # Space-to-depth stem (MLPerf trick): the 7x7/2 conv on a 3-channel
        # input underutilizes the MXU; repack 2x2 spatial blocks into channels
        # (C=12) and run an equivalent 4x4/1 VALID conv.  Kernel transform:
        # w4[I,J,(py,px,c),o] = w7[2I+py, 2J+px, c, o], zero where 2I+py > 6.
        w7 = np.asarray(k, np.float32)  # [7,7,3,64]
        w4 = np.zeros((4, 4, 2, 2, 3, w7.shape[-1]), np.float32)
        for big_i in range(4):
            for py in range(2):
                if 2 * big_i + py > 6:
                    continue
                for big_j in range(4):
                    for px in range(2):
                        if 2 * big_j + px > 6:
                            continue
                        w4[big_i, big_j, py, px] = w7[
                            2 * big_i + py, 2 * big_j + px
                        ]
        out["stem"]["k_s2d"] = jnp.asarray(w4.reshape(4, 4, 12, -1), dtype)

    # Guard against preparing with the wrong depth (e.g. resnet50 default
    # layers on a resnet101 tree): every layer*_* entry must be consumed —
    # a silent subset would serve a truncated network with valid shapes.
    expect = {
        f"layer{s + 1}_{b}"
        for s, blocks in enumerate(layers)
        for b in range(blocks)
    }
    have = {n for n in params if n.startswith("layer")}
    if have != expect:
        raise ValueError(
            f"layers={tuple(layers)} does not match the param tree: "
            f"missing={sorted(expect - have)[:3]} "
            f"extra={sorted(have - expect)[:3]}"
        )

    out["blocks"] = []
    for stage_idx, blocks in enumerate(layers):
        for block_idx in range(blocks):
            name = f"layer{stage_idx + 1}_{block_idx}"
            p = params[name]
            blk: Dict[str, Any] = {}
            for ci in (1, 2, 3):
                k, b = _fold(p[f"conv{ci}"]["kernel"], bn((name, f"bn{ci}")))
                blk[f"k{ci}"] = jnp.asarray(k, dtype)
                blk[f"b{ci}"] = jnp.asarray(b, dtype)
            if "downsample" in p:
                k, b = _fold(
                    p["downsample"]["conv"]["kernel"], bn((name, "downsample", "bn"))
                )
                blk["kd"] = jnp.asarray(k, dtype)
                blk["bd"] = jnp.asarray(b, dtype)
            # MRLA epilogue params; bn_mrla folds into (scale, bias) applied
            # AFTER (attn + λ·id)
            mr = p["mrla"]
            s, b = _bn_affine(bn((name, "bn_mrla")))
            blk["wq"] = jnp.asarray(mr["mrla"]["proj"]["wq"], jnp.float32)
            blk["wk"] = jnp.asarray(mr["mrla"]["proj"]["wk"], jnp.float32)
            blk["wv"] = jnp.asarray(mr["mrla"]["proj"]["wv"], jnp.float32)
            blk["lam"] = jnp.asarray(mr["lambda_t"], jnp.float32)
            blk["bn_scale"] = jnp.asarray(s, jnp.float32)
            blk["bn_bias"] = jnp.asarray(b, jnp.float32)
            out["blocks"].append(blk)

    if with_head:
        out["fc"] = {
            "k": jnp.asarray(params["head"]["fc"]["kernel"], dtype),
            "b": jnp.asarray(params["head"]["fc"]["bias"], jnp.float32),
        }
    return out


def attach_stage4(serving_params: Dict,
                  layers: Sequence[int] = (3, 4, 6, 3),
                  dim_perhead: int = 32) -> Dict:
    """Pack the final stage's params for the stage-resident Pallas kernel
    (kernels/mrla_stage4.py) and attach them under ``"stage4"``.

    Opt-in (pass use_stage4=True to :func:`resnet_mrlal_forward`); only
    depths whose last stage is the canonical 3-block 7x7 geometry
    qualify.  Returns the same dict for chaining."""
    from mrla_tpu.kernels.mrla_stage4 import pack_stage4_params

    if layers[-1] != 3:
        raise ValueError("stage4 kernel covers 3-block final stages only")
    blocks = serving_params["blocks"][-3:]
    if "kd" not in blocks[0]:
        raise ValueError("final-stage entry block has no downsample")
    packed = pack_stage4_params(blocks, dtype=blocks[0]["k3"].dtype,
                                dim_perhead=dim_perhead)
    serving_params["stage4"] = {
        k: v for k, v in packed.items() if k not in ("heads", "ktap")
    }
    return serving_params


def _conv(x, k, b, stride=1, groups=1):
    # torch-style symmetric padding (k//2 each side).  NOT XLA "SAME": at
    # stride 2 SAME pads (0, 1) while torch pads (1, 1) — a one-pixel window
    # shift that breaks logit parity on every stride-2 conv.
    p = k.shape[0] // 2
    y = jax.lax.conv_general_dilated(
        x, k, (stride, stride),
        ((p, p), (p, p)) if p else "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return y + b.astype(y.dtype)


def _stem(x, p):
    b, h, w, c = x.shape
    if "k_s2d" in p and h % 2 == 0 and w % 2 == 0:
        # space-to-depth: pad 3 -> [H+6, W+6]; repack 2x2 blocks into
        # channels -> [(H+6)/2, (W+6)/2, 12]; 4x4 VALID conv == 7x7/2 SAME.
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        hp, wp = h + 6, w + 6
        xp = xp.reshape(b, hp // 2, 2, wp // 2, 2, c)
        xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp // 2, wp // 2, 4 * c)
        y = jax.lax.conv_general_dilated(
            xp, p["k_s2d"], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    else:
        y = jax.lax.conv_general_dilated(
            x, p["k"], (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    y = jax.nn.relu(y + p["b"].astype(y.dtype))
    return max_pool_same_torch(y, 3, 2)


def _block(x, p, stride: int, heads: int, use_pallas: bool,
           x1_pre=None, p_next=None, hwbc_min_w: int = 28):
    """One serving block.  x1_pre, if given, is relu(conv1(x)) precomputed by
    the PREVIOUS block's mega-tail kernel.  When the mega path applies and a
    next block exists, returns (y, x1_next) where x1_next is the NEXT block's
    post-conv1 activation (kernels/mrla_megatail.py); else (y, None)."""
    out = (
        x1_pre
        if x1_pre is not None
        else jax.nn.relu(_conv(x, p["k1"], p["b1"]))
    )
    out = jax.nn.relu(_conv(out, p["k2"], p["b2"], stride=stride))
    z = _conv(out, p["k3"], p["b3"])  # pre-residual
    identity = _conv(x, p["kd"], p["bd"], stride=stride) if "kd" in p else x

    b, h, w, c = z.shape
    if (use_pallas and w >= hwbc_min_w and b % 8 == 0
            and p_next is not None):
        # mega-fused tail: relu(z+id) + GAP feed the gate via one XLA
        # multi-output fusion; the kernel then does dwconv-gate-λ-BN-add AND
        # the next block's 1x1 conv (an in-kernel MXU matmul in the HWBC
        # layout) in a single HBM pass.  Round-1's in-model losses came from
        # re-reading z+id and from breaking the epilogue→conv1 fusion — both
        # absorbed here.  Short-W stages (3/4) stay on jnp.
        out_act = jax.nn.relu(
            z.astype(jnp.float32) + identity.astype(jnp.float32)
        ).astype(z.dtype)
        gate = mrla_light_gate(out_act, p["wq"], p["wk"], heads)
        return mrla_block_tail_fused_next(
            out_act, identity, gate, p["wv"], p["lam"],
            p["bn_scale"], p["bn_bias"], p_next["k1"], p_next["b1"],
        )
    out = jax.nn.relu(z + identity)
    return mrla_light_epilogue_reference(
        out, identity, p["wq"], p["wk"], p["wv"], p["lam"],
        p["bn_scale"], p["bn_bias"], heads,
    ), None


@functools.partial(
    jax.jit,
    static_argnames=(
        "layers", "dim_perhead", "use_pallas", "microbatch", "shared_stem",
        "use_stage4",
    ),
)
def resnet_mrlal_forward(
    serving_params: Dict,
    x: jax.Array,
    layers: Sequence[int] = (3, 4, 6, 3),
    dim_perhead: int = 32,
    use_pallas: bool = False,
    microbatch: int = 32,
    shared_stem: bool = True,
    use_stage4: bool = False,
) -> jax.Array:
    """[B, H, W, 3] (any float dtype; cast to the param dtype) -> logits fp32.

    microbatch: the batch is split into independent `microbatch`-image
    chains traced side by side in ONE program (not a loop: XLA interleaves
    the chains' ops).  Each MRLA gate is a global GAP — a hard scheduling
    barrier the block tail must wait on; with several independent chains,
    one chain's barrier overlaps another's conv compute, and the smaller
    per-chain activations window-pipeline through VMEM between convs.
    Logits are BITWISE identical to the unsplit program (per-sample math is
    batch-independent).  Set microbatch=0 to disable.

    shared_stem=True runs the stem + maxpool on the FULL batch (the stem
    has no MRLA barrier, so it gains nothing from chain overlap and costs
    per-chain MXU underutilization) and starts the chains after it.

    Defaults (mb32 + shared stem, no s2d) are the winners of the honest
    input-perturbed harness sweep — v5e bs128 bf16 224px, every iteration's
    input fresh so nothing is loop-invariant (scripts/exp_benchperturb*.py):
    shared-stem mb32 10,778 img/s vs full-split mb32 9,765 / old default
    s2d+full-split mb16 8,450 / unsplit 7,919.  (The previous defaults were
    tuned under a harness that perturbed a stem bias per iteration, letting
    XLA hoist the constant-input stem out of the timing scan — numbers in
    that regime: mb16 11.5k — and are kept reachable via shared_stem=False,
    s2d=True.)"""
    if microbatch and x.shape[0] > microbatch and x.shape[0] % microbatch == 0:
        n = x.shape[0] // microbatch
        # chains are traced INLINE (not nested jit calls) so XLA schedules
        # their ops interleaved in one program
        if shared_stem:
            y = _stem(
                x.astype(serving_params["stem"]["k"].dtype),
                serving_params["stem"],
            )
            return jnp.concatenate(
                [
                    _head_impl(
                        serving_params,
                        _blocks_impl(
                            serving_params,
                            y[i * microbatch : (i + 1) * microbatch],
                            layers,
                            dim_perhead,
                            use_pallas,
                            use_stage4,
                        )[-1],
                    )
                    for i in range(n)
                ],
                axis=0,
            )
        return jnp.concatenate(
            [
                _forward_impl(
                    serving_params,
                    x[i * microbatch : (i + 1) * microbatch],
                    layers,
                    dim_perhead,
                    use_pallas,
                    use_stage4,
                )
                for i in range(n)
            ],
            axis=0,
        )
    return _forward_impl(serving_params, x, layers, dim_perhead, use_pallas,
                         use_stage4)


def _trunk_impl(
    serving_params: Dict,
    x: jax.Array,
    layers: Sequence[int],
    dim_perhead: int,
    use_pallas: bool,
    use_stage4: bool = False,
):
    """Stem + all blocks; returns the per-stage outputs [C2, C3, C4, C5]."""
    x = x.astype(serving_params["stem"]["k"].dtype)
    y = _stem(x, serving_params["stem"])
    return _blocks_impl(serving_params, y, layers, dim_perhead, use_pallas,
                        use_stage4)


def _blocks_impl(
    serving_params: Dict,
    y: jax.Array,
    layers: Sequence[int],
    dim_perhead: int,
    use_pallas: bool,
    use_stage4: bool = False,
):
    """All blocks on a post-stem feature map; per-stage outputs [C2..C5]."""
    strides = []
    stage_last = []
    for stage_idx, blocks in enumerate(layers):
        for block_idx in range(blocks):
            strides.append(2 if (stage_idx > 0 and block_idx == 0) else 1)
        stage_last.append(len(strides) - 1)

    blocks = serving_params["blocks"]
    if len(blocks) != len(strides):
        raise ValueError(
            f"serving params hold {len(blocks)} blocks but layers="
            f"{tuple(layers)} implies {len(strides)} — prepare and forward "
            "were given different depths"
        )
    s4_start = len(strides) - layers[-1]
    # stage-4 output spatial from the post-stem map: three stride-2 torch-pad
    # convs, each ceil(h/2).  The kernel is built for the canonical 7x7
    # geometry; anything else falls back to the jnp path (no assert, so
    # non-224px inputs serve correctly with use_stage4=True — ADVICE r4).
    s4_h, s4_w = y.shape[1], y.shape[2]
    for _ in range(3):
        s4_h, s4_w = -(-s4_h // 2), -(-s4_w // 2)
    run_s4 = (
        use_stage4
        and "stage4" in serving_params
        and layers[-1] == 3
        and y.shape[0] % 8 == 0
        and (s4_h, s4_w) == (7, 7)
    )
    x1_pre = None
    outs = []
    for i, (p, stride) in enumerate(zip(blocks, strides)):
        if run_s4 and i == s4_start:
            # stage-resident Pallas kernel: block0 conv1/conv2 stay in XLA
            # (dense MXU convs), the kernel runs everything after in one
            # VMEM-resident program (kernels/mrla_stage4.py)
            from mrla_tpu.kernels.mrla_stage4 import stage4_resident

            x1 = (x1_pre if x1_pre is not None
                  else jax.nn.relu(_conv(y, p["k1"], p["b1"])))
            ob = jax.nn.relu(_conv(x1, p["k2"], p["b2"], stride=stride))
            s4 = serving_params["stage4"]
            b = y.shape[0]
            y = stage4_resident(
                ob, y[:, ::2, ::2, :], s4,
                heads=int(s4["seg"].shape[1]),
                ktap=int(s4["taps"].shape[1]),
                batch_tile=16 if b % 16 == 0 else 8,
            )
            outs.append(y)
            break
        heads = p["lam"].shape[0] // dim_perhead
        p_next = blocks[i + 1] if i + 1 < len(blocks) else None
        y, x1_pre = _block(y, p, stride, heads, use_pallas,
                           x1_pre=x1_pre, p_next=p_next)
        # the fused-next-conv1 handoff stays valid across stage boundaries:
        # conv1 is stride-1 and consumes exactly this stage output y, which
        # is also exported/used for the next block's downsample identity
        if i in stage_last:
            outs.append(y)
    return outs


def _head_impl(serving_params: Dict, y: jax.Array) -> jax.Array:
    pooled = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
    fc = serving_params["fc"]
    return pooled @ fc["k"].astype(jnp.float32) + fc["b"]


def _forward_impl(
    serving_params: Dict,
    x: jax.Array,
    layers: Sequence[int],
    dim_perhead: int,
    use_pallas: bool,
    use_stage4: bool = False,
) -> jax.Array:
    y = _trunk_impl(serving_params, x, layers, dim_perhead, use_pallas,
                    use_stage4)[-1]
    return _head_impl(serving_params, y)

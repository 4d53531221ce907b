"""resnet_mrlab inference engine (bf16, BN-folded) — the eq.6 cache path.

Serving restructure of ResNetMRLABase.apply(train=False) (reference
/root/reference/resnet/models/resnet_mrla_base.py:96-129,246-261):

  * every BatchNorm folded into the preceding conv at load time (same
    treatment as serving/resnet_mrlal.py); bn_mrla folds into an affine
    applied to attn_t before the optional ReLU (:124-127);
  * per stage, block 0 (downsample + init_cell) runs unrolled, then the
    remaining blocks run EITHER
      - unrolled with the growing [B, t, ...] cache (default: each block
        reads only the t value maps that exist — least HBM traffic), or
      - as ONE lax.scan over stacked block params against the fixed-size
        masked cache (ops.mrla.mrla_base_attention_fixed) — O(1) compile
        time in stage depth (use_scan=True; the resnet101/152 depths).

The V cache holds full feature maps ([B, t, H, W, C], SURVEY.md §3.3) —
kept in the activation dtype (bf16) so stage-1 of resnet50 costs 616 MB at
batch 128, well inside one v5e's HBM.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mrla_tpu.ops.common import max_pool_same_torch
from mrla_tpu.ops.mrla import (
    MRLACache,
    MRLAParams,
    mrla_base_attention,
    mrla_base_attention_fixed,
)
from mrla_tpu.serving.resnet_mrlal import _bn_affine, _conv, _fold

STEM_KEYS = (("conv1a", "bn1a"), ("conv1b", "bn1b"), ("conv1c", "bn1"))


def prepare_mrlab_inference_params(
    variables: Dict,
    layers: Sequence[int] = (3, 4, 6, 3),
    dtype=jnp.bfloat16,
    deep_stem: bool = True,
) -> Dict:
    """Fold BNs and pre-cast; returns a serving param tree with per-stage
    block-0 params flat and interior blocks STACKED (axis 0) for lax.scan."""
    params = variables["params"]
    stats = variables["batch_stats"]

    def bn(path_parts):
        node_p, node_s = params, stats
        for p in path_parts:
            node_p = node_p[p]
            node_s = node_s[p]
        return {**node_p, **node_s}

    out: Dict[str, Any] = {}
    if deep_stem:
        stem = []
        for conv_name, bn_name in STEM_KEYS:
            k, b = _fold(
                params["stem"][conv_name]["kernel"], bn(("stem", bn_name))
            )
            stem.append({"k": jnp.asarray(k, dtype), "b": jnp.asarray(b, dtype)})
        out["stem"] = stem
    else:
        k, b = _fold(params["stem"]["conv1"]["kernel"], bn(("stem", "bn1")))
        out["stem"] = [{"k": jnp.asarray(k, dtype), "b": jnp.asarray(b, dtype)}]

    def block_params(name: str) -> Dict[str, Any]:
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
        proj = p["mrla"]["mrla"]["proj"]
        s, b = _bn_affine(bn((name, "bn_mrla")))
        blk["wq"] = jnp.asarray(proj["wq"], jnp.float32)
        blk["wk"] = jnp.asarray(proj["wk"], jnp.float32)
        blk["wv"] = jnp.asarray(proj["wv"], jnp.float32)
        blk["bn_scale"] = jnp.asarray(s, jnp.float32)
        blk["bn_bias"] = jnp.asarray(b, jnp.float32)
        return blk

    # Depth guard: every layer*_* entry must be consumed, else a wrong
    # `layers` silently serves a truncated network with valid shapes.
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

    out["stages"] = []
    for stage_idx, blocks in enumerate(layers):
        first = block_params(f"layer{stage_idx + 1}_0")
        interior = [
            block_params(f"layer{stage_idx + 1}_{bi}") for bi in range(1, blocks)
        ]
        # jnp.stack over one tree already yields the [1, ...] leading axis
        stacked = (
            jax.tree.map(lambda *xs: jnp.stack(xs), *interior)
            if interior
            else None
        )
        out["stages"].append({"first": first, "interior": stacked})
    out["fc"] = {
        "k": jnp.asarray(params["head"]["fc"]["kernel"], dtype),
        "b": jnp.asarray(params["head"]["fc"]["bias"], jnp.float32),
    }
    return out


def _bottleneck(x, p, stride):
    out = jax.nn.relu(_conv(x, p["k1"], p["b1"]))
    out = jax.nn.relu(_conv(out, p["k2"], p["b2"], stride=stride))
    z = _conv(out, p["k3"], p["b3"])
    identity = _conv(x, p["kd"], p["bd"], stride=stride) if "kd" in p else x
    return jax.nn.relu(z + identity)


def _epilogue(out, attn_t, p, relu_on_attn):
    attn = (
        attn_t.astype(jnp.float32) * p["bn_scale"] + p["bn_bias"]
    )
    if relu_on_attn:
        attn = jax.nn.relu(attn)
    return out + attn.astype(out.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "layers", "dim_perhead", "relu_on_attn", "use_scan", "microbatch"
    ),
)
def resnet_mrlab_forward(
    sp: Dict,
    x: jax.Array,
    layers: Sequence[int] = (3, 4, 6, 3),
    dim_perhead: int = 16,
    relu_on_attn: bool = True,
    use_scan: bool = False,
    microbatch: int = 0,
) -> jax.Array:
    """[B, H, W, 3] -> logits fp32 (eval semantics, BN folded).

    microbatch: split the batch into independent `microbatch`-image chains
    traced side by side in one program (same bitwise-parity guarantee as
    resnet_mrlal_forward; the eq.6 softmax-over-t cache is per-sample
    math).  Default 0 = OFF: unlike mrlal, splitting LOSES here —
    measured v5e bs128 bf16 224px: mb0 2920 / mb8 1811 / mb16 1422 img/s.
    The eq.6 path re-reads the whole [B,t,H,W,C] value cache every block
    (bandwidth-bound); per-chain caches shrink the sequential DMA streams
    without removing any traffic, and there is no mrlal-style gate
    barrier to hide."""
    if microbatch and x.shape[0] > microbatch and x.shape[0] % microbatch == 0:
        return jnp.concatenate(
            [
                _mrlab_impl(
                    sp,
                    x[i * microbatch : (i + 1) * microbatch],
                    layers, dim_perhead, relu_on_attn, use_scan,
                )
                for i in range(x.shape[0] // microbatch)
            ],
            axis=0,
        )
    return _mrlab_impl(sp, x, layers, dim_perhead, relu_on_attn, use_scan)


def _mrlab_impl(
    sp: Dict,
    x: jax.Array,
    layers: Sequence[int],
    dim_perhead: int,
    relu_on_attn: bool,
    use_scan: bool,
) -> jax.Array:
    x = x.astype(sp["stem"][0]["k"].dtype)
    for i, s in enumerate(sp["stem"]):
        stride = 2 if i == 0 else 1
        x = jax.nn.relu(_conv(x, s["k"], s["b"], stride=stride))
    x = max_pool_same_torch(x, 3, 2)

    for stage_idx, blocks in enumerate(layers):
        stage = sp["stages"][stage_idx]
        stride = 1 if stage_idx == 0 else 2
        p0 = stage["first"]
        out = _bottleneck(x, p0, stride)
        heads = out.shape[-1] // dim_perhead
        params0 = MRLAParams(p0["wq"], p0["wk"], p0["wv"])
        attn_t, cache = mrla_base_attention(out, params0, heads, None)
        x = _epilogue(out, attn_t, p0, relu_on_attn)

        n_int = blocks - 1  # static (from `layers`), matches the stacking
        if n_int == 0:
            continue
        if not use_scan:
            # unrolled growing cache: block t reads exactly t value maps
            for bi in range(n_int):
                p = jax.tree.map(lambda a: a[bi], stage["interior"])
                out = _bottleneck(x, p, 1)
                attn_t, cache = mrla_base_attention(
                    out, MRLAParams(p["wq"], p["wk"], p["wv"]), heads, cache
                )
                x = _epilogue(out, attn_t, p, relu_on_attn)
        else:
            # fixed-size masked cache + one scanned block body (O(1) compile
            # in depth; the resnet101 stage-3 = 23 blocks case)
            b, h, w, c = x.shape
            t_max = blocks
            k_buf = jnp.zeros((b, t_max, c), cache.k.dtype)
            v_buf = jnp.zeros((b, t_max, h, w, c), cache.v.dtype)
            k_buf = jax.lax.dynamic_update_slice_in_dim(k_buf, cache.k, 0, 1)
            v_buf = jax.lax.dynamic_update_slice_in_dim(v_buf, cache.v, 0, 1)

            def body(carry, p, heads=heads, relu_on_attn=relu_on_attn):
                xx, kb, vb, t = carry
                out = _bottleneck(xx, p, 1)
                attn_t, kb, vb = mrla_base_attention_fixed(
                    out, MRLAParams(p["wq"], p["wk"], p["wv"]), heads, kb, vb, t
                )
                xx = _epilogue(out, attn_t, p, relu_on_attn)
                return (xx, kb, vb, t + 1), None

            (x, _, _, _), _ = jax.lax.scan(
                body, (x, k_buf, v_buf, jnp.int32(1)), stage["interior"]
            )

    pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    fc = sp["fc"]
    return pooled @ fc["k"].astype(jnp.float32) + fc["b"]

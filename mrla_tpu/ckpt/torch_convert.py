"""One-way PyTorch state_dict -> Flax variables converter.

Required for logit-level parity with the reference's published .pth.tar
checkpoints (SURVEY.md §5.4).  Works from plain numpy — torch is only needed
by the caller to load the pickle.

Key layout translated (reference resnet_mrla_light.py / resnet.py):

    conv1.weight                      -> params/stem/conv1/kernel      (OIHW->HWIO)
    bn1.{weight,bias}                 -> params/stem/bn1/{scale,bias}
    bn1.running_{mean,var}            -> batch_stats/stem/bn1/{mean,var}
    layer{s}.{b}.conv{i}.weight       -> params/layer{s}_{b}/conv{i}/kernel
    layer{s}.{b}.bn{i}.*              -> .../bn{i}
    layer{s}.{b}.downsample.0.weight  -> .../downsample/conv/kernel
    layer{s}.{b}.downsample.1.*       -> .../downsample/bn/*
    layer{s}.{b}.se.fc.{0,2}.weight   -> .../se/{w1,w2}                (transposed)
    layer{s}.{b}.eca.conv.weight      -> .../eca/w                     ([1,1,k]->[k])
    layer{s}.{b}.mrla.mrla.W{q,k}.weight -> .../mrla/mrla/proj/w{q,k}  ([1,1,k]->[k])
    layer{s}.{b}.mrla.mrla.Wv.weight  -> .../mrla/mrla/proj/wv         (OIHW->HWIO)
    layer{s}.{b}.mrla.lambda_t        -> .../mrla/lambda_t             ([C,1,1]->[C])
    layer{s}.{b}.bn_mrla.*            -> .../bn_mrla/*
    fc.{weight,bias}                  -> params/head/fc/{kernel,bias}  (weight transposed)

MRLA-base deep stem (resnet_mrla_base.py:176-187): conv1 is an nn.Sequential —
conv1.0/1 -> stem/conv1a+bn1a, conv1.3/4 -> conv1b+bn1b, conv1.6 -> conv1c.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _dw_kernel(w: np.ndarray) -> np.ndarray:
    """Depthwise OIHW [C,1,kh,kw] -> HWIO [kh,kw,1,C]."""
    return np.transpose(w, (2, 3, 1, 0))


_BN_MAP = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}

_DEEP_STEM_MAP = {
    "0": ("conv", "conv1a"),
    "1": ("bn", "bn1a"),
    "3": ("conv", "conv1b"),
    "4": ("bn", "bn1b"),
    "6": ("conv", "conv1c"),
}


def convert_resnet_state_dict(
    state_dict: Mapping[str, Any],
) -> Dict[str, Dict]:
    """Convert a reference-ResNet-family torch state_dict (tensors or numpy)
    to Flax ``{"params": ..., "batch_stats": ...}``.

    Handles all resnet variants: baseline/SE/ECA/ResNeXt, mrla-light,
    mrla-base (incl. deep stem), dw ablation.  Module prefixes like
    ``module.`` (DDP) are stripped.
    """
    params: Dict = {}
    stats: Dict = {}

    def put(col: str, path: Tuple[str, ...], v: np.ndarray) -> None:
        _set(params if col == "params" else stats, path, v)

    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        v = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value
        )
        parts = key.split(".")
        if parts[0] == "module":  # DDP wrapper
            parts = parts[1:]

        # --- stem ---
        if parts[0] == "conv1":
            if len(parts) == 2:  # plain 7x7 stem: conv1.weight
                put("params", ("stem", "conv1", "kernel"), _conv_kernel(v))
            else:  # deep stem: conv1.{idx}.{param}
                kind, name = _DEEP_STEM_MAP[parts[1]]
                if kind == "conv":
                    put("params", ("stem", name, "kernel"), _conv_kernel(v))
                else:
                    col, leaf = _BN_MAP[parts[2]]
                    put(col, ("stem", name, leaf), v)
            continue
        if parts[0] == "bn1":
            col, leaf = _BN_MAP[parts[1]]
            put(col, ("stem", "bn1", leaf), v)
            continue

        # --- classifier head ---
        if parts[0] == "fc":
            if parts[1] == "weight":
                put("params", ("head", "fc", "kernel"), v.T)
            else:
                put("params", ("head", "fc", "bias"), v)
            continue

        # --- stages; torch: layer{s}.{b}.rest  / mrla-base: stages.{s}.{b}.rest ---
        if parts[0].startswith("layer") and parts[0][5:].isdigit():
            stage, block, rest = int(parts[0][5:]), int(parts[1]), parts[2:]
        elif parts[0] == "stages":
            stage, block, rest = int(parts[1]) + 1, int(parts[2]), parts[3:]
        else:
            raise KeyError(f"unrecognized torch key: {key}")

        blk = f"layer{stage}_{block}"

        if rest[0].startswith("conv"):
            put("params", (blk, rest[0], "kernel"), _conv_kernel(v))
        elif rest[0].startswith("bn"):
            # catches bn1/2/3 AND bn_mrla/bn_la/bn_dw — same mapping for all
            col, leaf = _BN_MAP[rest[1]]
            put(col, (blk, rest[0], leaf), v)
        elif rest[0] == "downsample":
            if rest[1] == "0":
                put("params", (blk, "downsample", "conv", "kernel"), _conv_kernel(v))
            else:
                col, leaf = _BN_MAP[rest[2]]
                put(col, (blk, "downsample", "bn", leaf), v)
        elif rest[0] == "se":
            # torch Linear [out,in] -> ours [in,out]
            w_name = "w1" if rest[2] == "0" else "w2"
            put("params", (blk, "se", w_name), v.T)
        elif rest[0] == "eca":
            put("params", (blk, "eca", "w"), v.reshape(-1))
        elif rest[0] == "mrla":
            if rest[1] == "lambda_t":
                put("params", (blk, "mrla", "lambda_t"), v.reshape(-1))
            elif rest[2] in ("Wq", "Wk"):
                name = "wq" if rest[2] == "Wq" else "wk"
                put("params", (blk, "mrla", "mrla", "proj", name), v.reshape(-1))
            elif rest[2] == "Wv":
                put("params", (blk, "mrla", "mrla", "proj", "wv"), _dw_kernel(v))
            else:
                raise KeyError(f"unrecognized mrla key: {key}")
        elif rest[0] == "la":
            # la_eq4: la.W{q,k,v}.weight -> la_proj/w{q,k,v}
            if rest[1] in ("Wq", "Wk"):
                name = "wq" if rest[1] == "Wq" else "wk"
                put("params", (blk, "la_proj", name), v.reshape(-1))
            elif rest[1] == "Wv":
                put("params", (blk, "la_proj", "wv"), _dw_kernel(v))
            else:
                raise KeyError(f"unrecognized la key: {key}")
        elif rest[0] == "dwconv":
            put("params", (blk, "dwconv", "kernel"), _dw_kernel(v))
        else:
            raise KeyError(f"unrecognized torch key: {key}")

    return {"params": params, "batch_stats": stats}


_LN_MAP = {"weight": "scale", "bias": "bias"}


def convert_vit_state_dict(
    state_dict: Mapping[str, Any], variant: str = "light"
) -> Dict[str, Dict]:
    """Convert a reference DeiT/ViT(-MRLA) torch state_dict to Flax variables.

    variant: "light" | "base" | "plain" — controls the mrla key nesting
    (the base token module wraps one extra MRLABaseModule level).
    """
    params: Dict = {}

    def put(path: Tuple[str, ...], v: np.ndarray) -> None:
        _set(params, path, v)

    for key, value in state_dict.items():
        v = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value
        )
        parts = key.split(".")
        if parts[0] == "module":
            parts = parts[1:]

        if parts[0] in ("cls_token", "dist_token", "pos_embed"):
            put((parts[0],), v)
        elif parts[0] == "patch_embed":
            if parts[2] == "weight":
                put(("patch_embed", "proj", "kernel"), _conv_kernel(v))
            else:
                put(("patch_embed", "proj", "bias"), v)
        elif parts[0] == "norm":
            put(("norm", _LN_MAP[parts[1]]), v)
        elif parts[0] in ("head", "head_dist"):
            put((parts[0], "kernel" if parts[1] == "weight" else "bias"),
                v.T if parts[1] == "weight" else v)
        elif parts[0] == "blocks":
            blk = f"block{int(parts[1])}"
            rest = parts[2:]
            if rest[0] in ("norm1", "norm2"):
                put((blk, rest[0], _LN_MAP[rest[1]]), v)
            elif rest[0] == "attn":
                # qkv / proj Linear: torch [out,in] -> flax [in,out]
                put((blk, "attn", rest[1], "kernel" if rest[2] == "weight" else "bias"),
                    v.T if rest[2] == "weight" else v)
            elif rest[0] == "mlp":
                put((blk, "mlp", rest[1], "kernel" if rest[2] == "weight" else "bias"),
                    v.T if rest[2] == "weight" else v)
            elif rest[0] == "mrla":
                if rest[1] in ("normx", "normo"):
                    put((blk, "mrla", rest[1], _LN_MAP[rest[2]]), v)
                elif rest[1] == "lambda_t":
                    put((blk, "mrla", "lambda_t"), v.reshape(-1))
                elif rest[1] == "mrla":
                    # light: mrla/mrla/proj; base adds one wrapper level
                    inner = ("mrla", "mrla", "proj") if variant == "light" else (
                        "mrla", "mrla", "mrla", "proj")
                    if rest[2] in ("Wq", "Wk"):
                        nm = "wq" if rest[2] == "Wq" else "wk"
                        put((blk, *inner, nm), v.reshape(-1))
                    elif rest[2] == "Wv":
                        put((blk, *inner, "wv"), _dw_kernel(v))
                    else:
                        raise KeyError(f"unrecognized vit mrla key: {key}")
                else:
                    raise KeyError(f"unrecognized vit mrla key: {key}")
            else:
                raise KeyError(f"unrecognized vit block key: {key}")
        elif parts[0] == "pre_logits":
            continue  # identity for all registered sizes
        else:
            raise KeyError(f"unrecognized vit key: {key}")

    return {"params": params}


def convert_mrla_base_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Dict]:
    """MRLA-base checkpoints: identical rules; stages.{s}.{b} prefix and the
    deep stem are already handled by convert_resnet_state_dict; the base
    block's mrla module has no lambda_t and its mrla path is mrla.mrla.*"""
    return convert_resnet_state_dict(state_dict)

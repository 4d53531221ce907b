"""Detection trainer CLI — the native counterpart of the reference's
``tools/train.py <config>`` MMDetection invocation (README.md:82-92).

Implements the 1x recipe the leaf configs inherit (upstream
schedule_1x.py, stated in mmdet's docs): SGD momentum 0.9, weight decay
1e-4, linear warmup 500 iters at ratio 1e-3, lr ×0.1 at epochs [8, 11],
12 epochs; base lr 0.02 for the two-stage presets and 0.01 for retinanet
(the reference's own override, retinanet_r50mrlal_fpn_1x_coco.py:6-7),
linearly scaled by global_batch/16.  Backbone ``frozen_stages`` freezes
updates via an optax mask (reference resnet_mrlal.py:307-323) and
``norm_eval`` applies the model with train=False — exactly frozen-BN
semantics, since these detectors' only train-mode behavior is backbone
BN (resnet_mrlal.py:358-367; no droppath in the mmdet variant).

Data: ``--data synthetic-detect`` (learnable squares task; masks
available for the mask preset) or ``--data coco`` with
``--train-ann/--train-imgs`` (stdlib-json COCO loader, data/coco.py).
Eval reports COCO-style mAP via detect.coco_eval.

Usage:
  python -m mrla_tpu.detect.train_cli --preset retinanet_r50mrlal_fpn_1x_coco \\
      --data synthetic-detect --img-size 256 --num-classes 4 \\
      --batch-size 8 --epochs 2 --steps-per-epoch 50 --output-dir runs/det
"""

from __future__ import annotations

import argparse
import json
import os
import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mrla_tpu.detect.configs import PRESETS


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="mrla_tpu detection trainer")
    p.add_argument("--preset", default="retinanet_r50mrlal_fpn_1x_coco",
                   choices=sorted(PRESETS))
    p.add_argument("--data", default="synthetic-detect",
                   choices=["synthetic-detect", "coco"])
    p.add_argument("--train-ann", default=None,
                   help="COCO instances json (train)")
    p.add_argument("--train-imgs", default=None)
    p.add_argument("--val-ann", default=None)
    p.add_argument("--val-imgs", default=None)
    p.add_argument("--img-size", type=int, nargs="+", default=[256],
                   help="canvas H [W]; coco default 800 1344")
    p.add_argument("--num-classes", type=int, default=80)
    p.add_argument("--max-gt", type=int, default=32)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=None,
                   help="default: preset (12)")
    p.add_argument("--steps-per-epoch", type=int, default=50,
                   help="synthetic data only")
    p.add_argument("--lr", type=float, default=None,
                   help="default: preset base lr scaled by batch/16")
    p.add_argument("--warmup-iters", type=int, default=500)
    p.add_argument("--warmup-ratio", type=float, default=1e-3)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--frozen-stages", type=int, default=None,
                   help="default: preset (1); -1 disables")
    p.add_argument("--no-norm-eval", action="store_true",
                   help="update backbone BN stats (presets freeze them)")
    p.add_argument("--backbone-layers", type=int, nargs=4, default=None,
                   help="override preset depth (tests use 1 1 1 1)")
    p.add_argument("--rpn-proposals", type=int, default=1000)
    p.add_argument("--rcnn-samples", type=int, default=512)
    p.add_argument("--pretrained-backbone", default=None,
                   help="orbax classification run dir (init_cfg Pretrained)")
    p.add_argument("--torch", default=None,
                   help="full mmdet detector .pth checkpoint to convert "
                        "and load (the published real weights; pair with "
                        "--eval-only for the runbook mAP check)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize backbone blocks in backward "
                        "(loses 11%% at the bs8 COCO contract — for "
                        "bigger batches; ROADMAP detection-train ledger)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel over N devices (GSPMD mesh; batch "
                        "must divide by N; params replicated — the "
                        "reference's DDP strategy)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output-dir", default="runs/detect")
    p.add_argument("--resume", default=None)
    p.add_argument("--eval-only", action="store_true",
                   help="skip training: restore --resume (or init) and "
                        "report mAP (the reference trainer's -e flow)")
    p.add_argument("--eval-every", type=int, default=1,
                   help="epochs between mAP evals; 0 disables")
    p.add_argument("--eval-steps", type=int, default=8,
                   help="synthetic val batches per eval")
    p.add_argument("--score-thr", type=float, default=0.05)
    p.add_argument(
        "--roi-sampling-ratio", type=int, default=None,
        help="two-stage RoIAlign grid: 0 = the reference presets' exact "
        "adaptive ceil-grid (mmcv sampling_ratio=0 — the parity setting; "
        "~8x slower on the XLA backend, FREE on the pallas backend), "
        "k>0 = static kxk.  Default: 0 when the resolved backend is "
        "pallas (exactness is free there), else 2",
    )
    p.add_argument(
        "--roi-backend", choices=("auto", "xla", "pallas"), default="auto",
        help="RoIAlign implementation: 'pallas' = patch-DMA kernel with "
        "custom VJP (TPU; +50%% eval e2e at sr=2, 12x at sr=0 — ROADMAP "
        "ledger; differentiable since round 5 so training qualifies "
        "too); 'auto' = pallas on TPU, xla otherwise",
    )
    return p.parse_args(argv)


def build_model(args):
    from mrla_tpu.detect.retinanet import RetinaNet
    from mrla_tpu.detect.two_stage import FasterRCNN, MaskRCNN

    preset = PRESETS[args.preset]
    layers = tuple(args.backbone_layers or preset.backbone_layers)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if "retinanet" in args.preset:
        if args.roi_backend == "pallas":
            raise SystemExit(
                "--roi-backend pallas applies to two-stage presets only "
                "(retinanet has no RoIAlign)"
            )
        return RetinaNet(layers=layers, num_classes=args.num_classes,
                         dtype=dtype, remat=args.remat), "retinanet"
    cls = MaskRCNN if "mask" in args.preset else FasterRCNN
    if ("mask" in args.preset and not args.remat and not args.eval_only
            and args.batch_size // max(args.dp, 1) >= 8):
        print(
            "note: mask training at >=8 imgs/device at COCO canvas sizes "
            "can exceed 16 GB HBM (the reference trains at 2 imgs/GPU); "
            "pass --remat if compilation reports out-of-memory "
            "(measured cost ~11%, ROADMAP detection ledger)",
            flush=True,
        )
    backend = args.roi_backend
    if backend == "auto":
        # the patch-DMA kernel targets the TPU Pallas backend specifically
        # (make_async_copy / PrefetchScalarGridSpec) — gate on 'tpu', not
        # merely non-cpu (ADVICE r4: would fail outright on gpu).  Under
        # --dp>1 the kernel sits inside a GSPMD-partitioned program with
        # no sharding rule of its own, a combination we have no multi-chip
        # measurement for — auto stays on the xla gather there (round-5
        # review finding; explicit --roi-backend pallas overrides with a
        # warning).
        backend = (
            "pallas"
            if jax.default_backend() == "tpu" and args.dp <= 1
            else "xla"
        )
    elif backend == "pallas" and args.dp > 1:
        print(
            "warning: --roi-backend pallas with --dp>1 runs a Mosaic "
            "custom call inside a GSPMD-partitioned step; the partitioner "
            "may replicate the RoI stage (unmeasured on multi-chip "
            "hardware) — benchmark against --roi-backend xla",
            flush=True,
        )
    sr = args.roi_sampling_ratio
    if sr is None:
        # pallas makes the reference presets' exact adaptive grid
        # (sampling_ratio=0, faster_rcnn_r50mrlal_fpn.py:40) free, so it
        # is the default there; the XLA gather pays ~8x for it, so that
        # path defaults to the close static 2x2 grid
        sr = 0 if backend == "pallas" else 2
    return (
        cls(layers=layers, num_classes=args.num_classes,
            num_proposals=args.rpn_proposals, dtype=dtype,
            remat=args.remat,
            roi_sampling_ratio=sr,
            roi_backend=backend),
        "two_stage",
    )


def make_schedule(args, preset, steps_per_epoch: int):
    base = args.lr
    if base is None:
        base = (0.01 if "retinanet" in preset.name else 0.02) * (
            args.batch_size / 16.0
        )
    epochs = args.epochs or preset.epochs
    milestones = [m * steps_per_epoch for m in preset.lr_step_epochs]

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base * (
            args.warmup_ratio
            + (1 - args.warmup_ratio)
            * jnp.minimum(step, args.warmup_iters)
            / max(args.warmup_iters, 1)
        )
        n = sum(
            (step >= m).astype(jnp.float32) for m in jnp.asarray(milestones)
        )
        return jnp.where(step < args.warmup_iters, warm, base * 0.1**n)

    return schedule, epochs


def make_optimizer(args, schedule, params):
    from mrla_tpu.detect.backbone import freeze_mask

    preset = PRESETS[args.preset]
    frozen = (
        preset.frozen_stages
        if args.frozen_stages is None
        else args.frozen_stages
    )
    tx = optax.chain(
        optax.add_decayed_weights(args.weight_decay),
        optax.sgd(schedule, momentum=args.momentum),
    )
    if frozen >= 0:
        mask = freeze_mask(params, frozen)
        tx = optax.chain(
            tx,
            optax.masked(
                optax.set_to_zero(),
                jax.tree.map(lambda t: not t, mask),
            ),
        )
    return tx


def rank_shard_indices(n: int, rank: int, world: int, local_bs: int):
    """Per-rank strided dataset shard (the reference's DistributedSampler
    split), truncated so EVERY rank runs the same step count — the
    truncation must use the GLOBAL minimum shard length, not each rank's
    own: strided shards differ by one in length (ceil vs floor of
    n/world), so per-rank truncation can give ranks different batch
    counts and deadlock the first collective of the extra step (e.g.
    n=15, world=2, local_bs=2: 4 steps vs 3 — round-5 review finding).
    Returns None when even one local batch doesn't fit."""
    keep = ((n // world) // local_bs) * local_bs
    if keep == 0:
        return None
    return np.arange(rank, n, world)[:keep]


def data_iter(args, train: bool, epoch: int, rank: int = 0,
              world: int = 1):
    """Training batches; with ``world > 1`` each process yields its LOCAL
    shard of the global batch (batch_size/world rows) for
    ``parallel.mesh.shard_batch`` to assemble into one global array —
    the same contract as the classification CLI (train/cli.py).  Eval
    always runs the full iterator (callers pass world=1): every rank
    computes the identical mAP and rank 0 logs it."""
    canvas = tuple(args.img_size) if len(args.img_size) == 2 else (
        args.img_size[0], args.img_size[0]
    )
    local_bs = args.batch_size // world
    if args.data == "synthetic-detect":
        from mrla_tpu.data.synthetic import synthetic_detection_batches

        steps = args.steps_per_epoch if train else args.eval_steps
        it = synthetic_detection_batches(
            args.batch_size,
            image_size=canvas[0],
            num_classes=args.num_classes,
            steps=steps,
            max_gt=args.max_gt,
            seed=(args.seed + epoch * 1000 + (0 if train else 777)),
            with_masks="mask" in args.preset,
        )
        if world == 1:
            return it

        def _local():
            # identical global batch on every rank (same seed); take this
            # rank's contiguous slice — the DDP-equivalence contract the
            # multihost tests assert (tests/test_multihost.py)
            lo = rank * local_bs
            for b in it:
                yield {k: v[lo:lo + local_bs] for k, v in b.items()}

        return _local()
    from mrla_tpu.data.coco import CocoDetection, coco_batches

    ann = args.train_ann if train else (args.val_ann or args.train_ann)
    imgs = args.train_imgs if train else (args.val_imgs or args.train_imgs)
    if ann is None or imgs is None:
        raise SystemExit("--data coco requires --train-ann/--train-imgs")
    ds = CocoDetection(ann, imgs)
    indices = None
    if world > 1:
        indices = rank_shard_indices(len(ds), rank, world, local_bs)
        if indices is None:
            raise SystemExit(
                f"dataset too small: {len(ds)} images over {world} "
                f"processes < local batch {local_bs}"
            )
    return coco_batches(
        ds, local_bs, canvas_hw=canvas, max_gt=args.max_gt,
        shuffle=train, augment=train, seed=args.seed + epoch,
        indices=indices,
        with_masks="mask" in args.preset,
        with_eval_extras=not train,
    )


def main(argv=None):
    args = parse_args(argv)
    # the eval-only detector program (Pallas RoIAlign + NMS) compiles in
    # ~12 min cold; persist executables so repeat evals warm in seconds
    from mrla_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    # multi-host control plane (COORDINATOR_ADDRESS/NUM_PROCESSES/
    # PROCESS_ID or SLURM env — no-op single-process); same launcher
    # contract as the classification CLI (parallel/launch.py)
    from mrla_tpu.parallel.launch import init_distributed, is_main_process

    dist_info = init_distributed()
    rank = dist_info["process_index"]
    world = jax.process_count()
    if world > 1 and args.dp != jax.device_count():
        raise SystemExit(
            f"multi-process runs shard over ALL global devices: pass "
            f"--dp {jax.device_count()} (got --dp {args.dp})"
        )
    preset = PRESETS[args.preset]
    model, kind = build_model(args)
    norm_eval = preset.norm_eval and not args.no_norm_eval
    canvas = tuple(args.img_size) if len(args.img_size) == 2 else (
        args.img_size[0], args.img_size[0]
    )

    rng = jax.random.key(args.seed)
    dummy = jnp.zeros((1, canvas[0], canvas[1], 3), jnp.float32)
    if kind == "retinanet":
        variables = model.init(rng, dummy, train=False)
    else:
        from mrla_tpu.detect.two_stage import init_detector

        variables = init_detector(model, rng, dummy)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    if args.pretrained_backbone:
        from mrla_tpu.ckpt.orbax_io import restore_checkpoint
        from mrla_tpu.detect.backbone import (
            load_backbone_from_classification,
        )

        restored = restore_checkpoint(args.pretrained_backbone)
        if restored is None:
            raise SystemExit(
                f"no checkpoint at {args.pretrained_backbone}"
            )
        cls_state = restored[0]
        loaded = load_backbone_from_classification(
            {"params": params, "batch_stats": batch_stats},
            {
                "params": cls_state["params"],
                "batch_stats": cls_state.get("batch_stats", {}),
            },
        )
        params = loaded["params"]
        batch_stats = loaded["batch_stats"]
        print(f"loaded backbone from {args.pretrained_backbone}")

    if args.torch:
        # docs/RUNBOOK.md: published-checkpoint -> native mAP in one
        # command (torch .pth -> converted tree dropped into apply)
        import torch as _torch

        sd = _torch.load(args.torch, map_location="cpu")
        sd = sd.get("state_dict", sd)
        sd = {k.removeprefix("module."): v for k, v in sd.items()}
        if kind == "two_stage":
            from mrla_tpu.ckpt.detect_convert import convert_mmdet_two_stage

            tree = convert_mmdet_two_stage(sd)
        else:
            from mrla_tpu.ckpt import convert_mmdet_state_dict

            tree = convert_mmdet_state_dict(
                sd, num_laterals=4 - PRESETS[args.preset].start_level
            )
        params = tree["params"]
        batch_stats = tree.get("batch_stats", batch_stats)
        print(f"loaded detector weights from {args.torch}")

    if args.data == "coco" and args.train_ann:
        # milestone epochs (8/11) must convert to steps using the REAL
        # epoch length, not the synthetic-data flag
        from mrla_tpu.data.coco import CocoDetection

        n_train = len(CocoDetection(args.train_ann, args.train_imgs))
        steps_per_epoch = max(
            1, (n_train + args.batch_size - 1) // args.batch_size
        )
    else:
        steps_per_epoch = args.steps_per_epoch
    schedule, epochs = make_schedule(args, preset, steps_per_epoch)
    tx = make_optimizer(args, schedule, params)
    opt_state = tx.init(params)

    if kind == "retinanet":
        from mrla_tpu.detect.losses import retinanet_loss

        def loss_fn(p, bs, batch, key):
            kwargs = {"mutable": ["batch_stats"]} if not norm_eval else {}
            out = model.apply(
                {"params": p, "batch_stats": bs},
                batch["image"], train=not norm_eval, **kwargs,
            )
            outs, new_bs = out if not norm_eval else (out, {"batch_stats": bs})
            losses = retinanet_loss(
                outs, batch["gt_boxes"], batch["gt_labels"],
                batch["gt_valid"], num_classes=args.num_classes,
            )
            return losses["loss"], (losses, new_bs["batch_stats"])

    else:
        from mrla_tpu.detect.two_stage_train import faster_rcnn_train_loss

        def loss_fn(p, bs, batch, key):
            total, losses, mut = faster_rcnn_train_loss(
                model, {"params": p, "batch_stats": bs},
                batch["image"], batch["gt_boxes"], batch["gt_labels"],
                batch["gt_valid"], key, train=not norm_eval,
                gt_masks=batch.get("gt_masks"),
                rcnn_num=args.rcnn_samples,
            )
            new_bs = mut.get("batch_stats", bs) if not norm_eval else bs
            return total, (losses, new_bs)

    @partial(jax.jit, donate_argnums=(0, 2))
    def train_step(p, bs, opt_state, batch, key):
        (_, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(p, bs, batch, key)
        updates, opt_state = tx.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        return p, new_bs, opt_state, losses

    os.makedirs(args.output_dir, exist_ok=True)
    log_path = os.path.join(args.output_dir, "log.jsonl")
    start_epoch, best_map = 0, -1.0
    if args.resume:
        from mrla_tpu.ckpt.orbax_io import restore_checkpoint

        restored = restore_checkpoint(
            args.resume,
            {"params": params, "batch_stats": batch_stats,
             "opt_state": opt_state},
        )
        if restored is not None:
            state, start_epoch, best_map = restored
            params = state["params"]
            batch_stats = state["batch_stats"]
            opt_state = state["opt_state"]
            start_epoch += 1
            print(f"resumed epoch {start_epoch} (best mAP {best_map:.4f})")

    if args.eval_only:
        m = evaluate(args, model, kind, params, batch_stats, start_epoch)
        print(json.dumps({"eval_only": True, **m}))
        return {"params": params, "batch_stats": batch_stats,
                "best_map": m["mAP"], **m}

    dp_mesh = None
    if args.dp > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mrla_tpu.parallel import make_mesh

        if args.batch_size % args.dp:
            raise SystemExit(
                f"--batch-size {args.batch_size} must divide --dp {args.dp}"
            )
        dp_mesh = make_mesh(axes=("data",), shape=(args.dp,))
        rep = NamedSharding(dp_mesh, P())
        params = jax.device_put(params, rep)
        batch_stats = jax.device_put(batch_stats, rep)
        opt_state = jax.device_put(opt_state, rep)

    step_key = jax.random.key(args.seed + 1)
    global_step = start_epoch * steps_per_epoch
    losses = {}
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        losses = {}
        for batch in data_iter(args, train=True, epoch=epoch,
                               rank=rank, world=world):
            batch = {k: v for k, v in batch.items()
                     if k != "sample_valid"}
            if dp_mesh is not None:
                # single-process: device_put the global batch sharded on
                # 'data'; multi-host: assemble the global array from the
                # per-process local shards (no cross-host copies)
                from mrla_tpu.parallel.mesh import shard_batch

                batch = shard_batch(batch, dp_mesh)
            else:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
            step_key, k = jax.random.split(step_key)
            params, batch_stats, opt_state, losses = train_step(
                params, batch_stats, opt_state, batch, k
            )
            global_step += 1
            if not np.isfinite(float(losses["loss"])):
                raise SystemExit(
                    f"non-finite loss at step {global_step}: abort "
                    "(reference deit/engine.py:43-45 contract)"
                )
        line = {
            "epoch": epoch,
            "step": global_step,
            "lr": float(schedule(global_step)),
            "time_s": round(time.time() - t0, 2),
            **{k: float(v) for k, v in losses.items()},
        }

        if args.eval_every and (epoch + 1) % args.eval_every == 0:
            m = evaluate(args, model, kind, params, batch_stats, epoch)
            line.update(m)
            is_best = m["mAP"] > best_map
            best_map = max(best_map, m["mAP"])
        else:
            is_best = False
        from mrla_tpu.ckpt.orbax_io import save_checkpoint

        # orbax saves are COLLECTIVE in multi-host runs: every process
        # calls save (device_get the replicated tree first); orbax does
        # the single-writer coordination (same as train/cli.py)
        save_checkpoint(
            args.output_dir,
            jax.device_get({"params": params, "batch_stats": batch_stats,
                            "opt_state": opt_state}),
            epoch,
            best_acc1=best_map,
            is_best=is_best,
        )
        # text artifacts are plain writes — rank-0-gate them
        if is_main_process():
            with open(log_path, "a") as f:
                f.write(json.dumps(line) + "\n")
        print(json.dumps(line))
    return {"params": params, "batch_stats": batch_stats,
            "best_map": best_map,
            "last_losses": {k: float(v) for k, v in losses.items()}}


def evaluate(args, model, kind, params, batch_stats, epoch) -> Dict[str, Any]:
    """COCO-style mAP over the val iterator."""
    from mrla_tpu.detect.coco_eval import evaluate_detections

    variables = {"params": params, "batch_stats": batch_stats}
    preds, gts = [], []
    preds_m, gts_m = [], []
    with_masks = False
    for batch in data_iter(args, train=False, epoch=epoch):
        x = jnp.asarray(batch["image"])
        soft_masks = None
        if kind == "retinanet":
            from mrla_tpu.detect.retinanet import get_bboxes

            outs = model.apply(variables, x, train=False)
            boxes, scores, labels, valid = get_bboxes(
                outs, img_shape=(x.shape[1], x.shape[2]),
                score_thr=args.score_thr,
            )
        else:
            from mrla_tpu.detect.two_stage import two_stage_predict

            res = two_stage_predict(
                model, variables, x, score_thr=args.score_thr
            )
            boxes, scores, labels, valid = (
                res["det_boxes"], res["det_scores"],
                res["det_labels"], res["det_valid"],
            )
            soft_masks = res.get("masks")
        boxes, scores = np.asarray(boxes), np.asarray(scores)
        labels, valid = np.asarray(labels), np.asarray(valid)
        for b in range(x.shape[0]):
            if not bool(batch["sample_valid"][b]):
                continue
            m = valid[b]
            # bbox protocol runs in ORIGINAL image coordinates (mmdet
            # rescales detections back before COCOeval); crowd regions
            # and json areas ride along when the loader provides them
            sc = float(batch["scale"][b]) if "scale" in batch else 1.0
            pred = {
                "boxes": boxes[b][m] / sc, "scores": scores[b][m],
                "labels": labels[b][m],
            }
            gv = np.asarray(batch["gt_valid"][b])
            gt = {
                "boxes": np.asarray(batch["gt_boxes"][b])[gv] / sc,
                "labels": np.asarray(batch["gt_labels"][b])[gv],
            }
            if "gt_areas" in batch:
                gt["areas"] = np.asarray(batch["gt_areas"][b])[gv]
            if "crowd_valid" in batch and batch["crowd_valid"].shape[1]:
                cv = np.asarray(batch["crowd_valid"][b])
                gt["iscrowd"] = np.concatenate(
                    [np.zeros(int(gv.sum()), bool), cv[cv]]
                )
                gt["boxes"] = np.concatenate(
                    [gt["boxes"],
                     np.asarray(batch["crowd_boxes"][b])[cv]]
                )
                gt["labels"] = np.concatenate(
                    [gt["labels"],
                     np.asarray(batch["crowd_labels"][b])[cv]]
                )
                if "areas" in gt:
                    gt["areas"] = np.concatenate(
                        [gt["areas"],
                         np.asarray(batch["crowd_areas"][b])[cv]]
                    )
            preds.append(pred)
            gts.append(gt)
            if soft_masks is not None and "gt_masks" in batch:
                from mrla_tpu.detect.coco_eval import paste_masks

                # segm protocol stays in CANVAS space (masks are pasted
                # there) and scores only the non-crowd instances — crowd
                # RLEs are not rasterized (scope note vs pycocotools)
                with_masks = True
                det_boxes = boxes[b][m]
                preds_m.append({
                    "boxes": det_boxes, "scores": scores[b][m],
                    "labels": labels[b][m],
                    "masks": paste_masks(
                        np.asarray(soft_masks[b])[m], det_boxes,
                        (x.shape[1], x.shape[2]),
                    ),
                })
                gts_m.append({
                    "boxes": np.asarray(batch["gt_boxes"][b])[gv],
                    "labels": np.asarray(batch["gt_labels"][b])[gv],
                    "masks": np.asarray(batch["gt_masks"][b])[gv] >= 0.5,
                })
    res = evaluate_detections(preds, gts, num_classes=args.num_classes)
    out = {
        k: res[k]
        for k in ("mAP", "AP50", "AP75", "mAP_s", "mAP_m", "mAP_l",
                  "AR@1", "AR@10", "AR@100", "AR_s", "AR_m", "AR_l")
    }
    if with_masks:
        segm = evaluate_detections(
            preds_m, gts_m, num_classes=args.num_classes,
            iou_kind="segm",
        )
        out.update({"mask_mAP": segm["mAP"], "mask_AP50": segm["AP50"],
                    "mask_AP75": segm["AP75"]})
    return out


if __name__ == "__main__":
    main()

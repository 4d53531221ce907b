"""Unified training/eval CLI — one harness replacing the reference's three
silos (resnet/train.py, resnet/train_pro.py, deit/main.py; SURVEY.md §2.3).

Flag semantics preserved where they exist upstream: SGD step/cosine recipes
with warmup, label smoothing (train_pro), AdamW+cosine+EMA+Mixup/CutMix+
repeated-aug (deit), RMSpropTF+exp-decay (efficientnet README recipe),
eval-only (-e), resume, per-epoch txt logs + JSON-lines log, best
checkpointing.  Distribution is a mesh + shardings (no rank plumbing): the
batch dim shards over 'data'; `jax.distributed.initialize` handles
multi-host when launched per-host.

Example:
    python -m mrla_tpu.train.cli -a resnet50_mrlal --data synthetic \
        --epochs 2 --batch-size 32 --synthetic-steps 10
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mrla_tpu.ckpt.orbax_io import restore_checkpoint, save_checkpoint
from mrla_tpu.data import (
    ImageFolder,
    distributed_indices,
    iterate_batches,
    mixup_cutmix,
    normalize,
    ra_sampler_indices,
    random_erasing,
    synthetic_batches,
)
from mrla_tpu.models import create_model, list_models
from mrla_tpu.parallel import make_mesh, shard_batch
from mrla_tpu.train import (
    create_train_state,
    cross_entropy,
    label_smoothing_ce,
    make_eval_step,
    make_train_step,
    soft_target_ce,
)
from mrla_tpu.train.metrics import AverageMeter, data_save, jsonl_log
from mrla_tpu.train.optim import adamw_timm, rmsprop_tf, sgd_torch
from mrla_tpu.train.schedules import (
    cosine_with_warmup,
    exponential_decay_with_warmup,
    multistep_with_warmup,
    step_with_warmup,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("mrla_tpu trainer")
    p.add_argument("-a", "--arch", default="resnet50_mrlal", choices=list_models())
    p.add_argument("--data", default="synthetic",
                   help="ImageFolder root, 'synthetic' (noise), or "
                        "'synthetic-learnable' (class-template task the "
                        "on-chip smokes assert learning on)")
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("-b", "--batch-size", type=int, default=256, help="global batch")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--synthetic-steps", type=int, default=20)
    # optimizer / schedule
    p.add_argument("--opt", default="sgd", choices=["sgd", "adamw", "rmsproptf"])
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--wd", "--weight-decay", dest="weight_decay", type=float,
                   default=1e-4)
    p.add_argument("--scheduler", default="step",
                   choices=["step", "cosine", "multistep", "exp"])
    p.add_argument("--warmup-epochs", type=int, default=3)
    p.add_argument("--clip-grad", type=float, default=None)
    p.add_argument("--lr-scale-512", action="store_true",
                   help="deit linear scaling: lr *= global_batch/512")
    # regularization
    p.add_argument("--label-smooth", type=float, default=0.0)
    p.add_argument("--mixup", type=float, default=0.0)
    p.add_argument("--cutmix", type=float, default=0.0)
    p.add_argument("--random-erase", type=float, default=0.0)
    p.add_argument("--drop-path", type=float, default=0.0)
    p.add_argument("--drop-rate", type=float, default=0.0)
    p.add_argument("--ema-decay", type=float, default=0.0)
    p.add_argument("--repeated-aug", action="store_true")
    # distillation (deit/main.py:330-353 plumbing)
    p.add_argument("--distillation-type", default="none",
                   choices=["none", "soft", "hard"])
    p.add_argument("--teacher-arch", default="resnet50")
    p.add_argument("--teacher-resume", default="",
                   help="orbax dir with the teacher TrainState")
    p.add_argument("--distillation-alpha", type=float, default=0.5)
    p.add_argument("--distillation-tau", type=float, default=1.0)
    # run control
    p.add_argument("-e", "--evaluate", action="store_true")
    p.add_argument("--resume", default="")
    p.add_argument("--finetune", default="",
                   help="orbax dir to initialize params from (deit/main.py:"
                        "259-293 semantics: pos-embed bicubic interpolation "
                        "when the grid changes, head re-init when "
                        "num_classes changes)")
    p.add_argument("--output-dir", default="./runs/default")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--print-freq", type=int, default=50)
    p.add_argument("--bf16", action="store_true", help="bf16 compute dtype")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize backbone blocks in backward "
                        "(resnet families; measured to LOSE at the "
                        "reference batch sizes — for bigger-than-HBM runs)")
    p.add_argument("--profile-dir", default="",
                   help="write a jax.profiler trace of steps 5-15 of the "
                        "first epoch (xprof-compatible)")
    return p


def build_optimizer(args, params, steps_per_epoch: int):
    lr = args.lr
    if args.lr_scale_512:
        lr = lr * args.batch_size / 512.0
    sched = {
        "step": lambda: step_with_warmup(lr, steps_per_epoch, args.warmup_epochs),
        "cosine": lambda: cosine_with_warmup(
            lr, args.epochs, steps_per_epoch, args.warmup_epochs
        ),
        "multistep": lambda: multistep_with_warmup(
            lr, steps_per_epoch, warmup_epochs=args.warmup_epochs
        ),
        "exp": lambda: exponential_decay_with_warmup(
            lr, steps_per_epoch, warmup_epochs=args.warmup_epochs
        ),
    }[args.scheduler]()
    if args.opt == "sgd":
        return sgd_torch(sched, args.momentum, args.weight_decay)
    if args.opt == "adamw":
        return adamw_timm(sched, params, weight_decay=args.weight_decay)
    return rmsprop_tf(sched, weight_decay=args.weight_decay)


def main(argv=None) -> dict:
    # Honor JAX_PLATFORMS even when a site hook force-set jax_platforms at
    # interpreter start (this machine's axon sitecustomize does).
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    args = build_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    from mrla_tpu.parallel.launch import init_distributed, is_main_process

    dist_info = init_distributed()
    rank = dist_info["process_index"]
    world = dist_info["process_count"]
    if world > 1:
        print(f"distributed: {dist_info}")

    mesh = make_mesh(axes=("data", "model"))
    n_dev = mesh.devices.size
    if args.batch_size % n_dev:
        raise ValueError(f"global batch {args.batch_size} not divisible by "
                         f"{n_dev} devices")
    local_batch = args.batch_size // world

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model_kw = dict(num_classes=args.num_classes, dtype=dtype)
    if args.drop_path:
        # timm-lineage families name the model-level knob drop_path_rate
        # (per-depth schedule); the resnet family takes a flat drop_path
        timm_style = args.arch.startswith(
            ("deit", "resmlp", "patchconvnet", "efficientnet")
        )
        model_kw["drop_path_rate" if timm_style else "drop_path"] = (
            args.drop_path
        )
    if args.drop_rate:
        model_kw["drop_rate"] = args.drop_rate
    if args.remat:
        # supported by the resnet families; other archs reject the kwarg
        # loudly (flax dataclass TypeError) rather than silently ignoring
        model_kw["remat"] = True
    model = create_model(args.arch, **model_kw)

    # timm create_transform (DeiT/ResMLP/PatchConvNet/EfficientNet recipes,
    # deit/datasets.py:78-105) resamples bicubicly; the torchvision ResNet
    # recipe (resnet/train.py:254-258) bilinearly.
    interpolation = (
        "bicubic"
        if args.arch.startswith(("deit", "resmlp", "patchconvnet", "efficientnet"))
        else "bilinear"
    )

    synthetic = args.data in ("synthetic", "synthetic-learnable")
    syn_learnable = args.data == "synthetic-learnable"
    if synthetic:
        steps_per_epoch = args.synthetic_steps
        train_ds = val_ds = None
    else:
        train_ds = ImageFolder(os.path.join(args.data, "train"))
        val_ds = ImageFolder(os.path.join(args.data, "val"))
        steps_per_epoch = len(train_ds) // args.batch_size

    sample = jnp.zeros((n_dev, args.image_size, args.image_size, 3), jnp.float32)

    rng = jax.random.key(args.seed)
    variables = model.init(rng, sample, train=False)
    state = create_train_state(
        model, rng, sample, build_optimizer(args, variables["params"],
                                            steps_per_epoch),
        ema_decay=args.ema_decay, variables=variables,
    )

    if args.finetune:
        from mrla_tpu.utils.finetune import interpolate_pos_embed, reset_classifier

        restored = restore_checkpoint(args.finetune, state)
        if restored is None:
            raise FileNotFoundError(f"--finetune checkpoint not found: "
                                    f"{args.finetune}")
        src = restored[0].params
        dst = state.params
        if "pos_embed" in src and src["pos_embed"].shape != dst["pos_embed"].shape:
            n_extra = 2 if "dist_token" in dst else 1
            src = dict(src)
            src["pos_embed"] = interpolate_pos_embed(
                src["pos_embed"], dst["pos_embed"].shape[1] - n_extra, n_extra
            )
        head_names = [n for n in ("head", "head_dist") if n in src]
        if head_names and any(
            jax.tree.leaves(src[n])[0].shape != jax.tree.leaves(dst[n])[0].shape
            for n in head_names
        ):
            src = reset_classifier(src, args.num_classes, jax.random.key(9))
        state = state.replace(params=src,
                              batch_stats=restored[0].batch_stats or
                              state.batch_stats)
        print(f"finetuning from {args.finetune}")

    start_epoch, best_acc1 = 0, 0.0
    if args.resume:
        restored = restore_checkpoint(args.resume, state)
        if restored is not None:
            state, last_epoch, best_acc1 = restored
            # the checkpoint stores the just-COMPLETED epoch; training
            # resumes at the next one (reference stores epoch+1 for the
            # same effect, resnet/train.py:334,235)
            start_epoch = last_epoch + 1
            print(f"resumed from {args.resume} after epoch {last_epoch}")

    use_soft = args.mixup > 0 or args.cutmix > 0
    if use_soft:
        loss_fn = soft_target_ce
    elif args.label_smooth > 0:
        loss_fn = lambda lo, la: label_smoothing_ce(lo, la, args.label_smooth)
    else:
        loss_fn = cross_entropy

    teacher_fn = None
    if args.distillation_type != "none":
        teacher = create_model(args.teacher_arch, num_classes=args.num_classes,
                               dtype=dtype)
        t_vars = teacher.init(jax.random.key(args.seed + 7), sample, train=False)
        if args.teacher_resume:
            t_state = create_train_state(
                teacher, jax.random.key(0), sample,
                build_optimizer(args, t_vars["params"], steps_per_epoch),
                variables=t_vars)
            restored = restore_checkpoint(args.teacher_resume, t_state)
            if restored is None:
                # never distill against random weights silently — the
                # reference always loads a pretrained teacher and raises
                # on a bad path (deit/main.py:330-353)
                raise FileNotFoundError(
                    f"--teacher-resume checkpoint not found: "
                    f"{args.teacher_resume}"
                )
            t_state = restored[0]
            t_vars = {"params": t_state.params}
            if t_state.batch_stats:
                t_vars["batch_stats"] = t_state.batch_stats
        elif args.distillation_type != "none":
            print(
                "warning: distillation with a RANDOM teacher "
                "(no --teacher-resume) — only meaningful in tests",
                file=sys.stderr,
            )
        teacher_fn = lambda images: teacher.apply(t_vars, images, train=False)

    # rng needs come from the CONSTRUCTED model, not the CLI flags: some
    # archs carry nonzero internal defaults (efficientnet drop_rate=0.2,
    # deit_mrlab's hardcoded drop_path_rate=0.1) and would crash with
    # "needs PRNG for dropout/droppath" if keyed off the flags alone
    model_droppath = max(
        args.drop_path,
        getattr(model, "drop_path_rate", 0.0) or 0.0,
        getattr(model, "drop_path", 0.0) or 0.0,
    )
    model_dropout = max(args.drop_rate, getattr(model, "drop_rate", 0.0) or 0.0)
    train_step = jax.jit(
        make_train_step(
            loss_fn=loss_fn,
            grad_clip_norm=args.clip_grad,
            has_droppath=model_droppath > 0,
            has_dropout=model_dropout > 0,
            teacher_fn=teacher_fn,
            distill_kind=args.distillation_type,
            distill_alpha=args.distillation_alpha,
            distill_tau=args.distillation_tau,
        ),
        # donate the TrainState: params/momenta/EMA update in place instead
        # of being copied every step (the loop rebinds `state` immediately)
        donate_argnums=(0,),
    )
    eval_step = jax.jit(make_eval_step(use_ema=args.ema_decay > 0))
    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, repl)

    # Rank-offset aug stream (deit/main.py:191-193: seed = args.seed + rank)
    # so processes draw different flips/mixup lambdas for their local shards.
    aug_key = jax.random.fold_in(jax.random.key(args.seed + 1), rank)

    @jax.jit
    def device_augment(key, images_u8, labels):
        x = normalize(images_u8)
        flip = jax.random.bernoulli(key, 0.5, (x.shape[0], 1, 1, 1))
        x = jnp.where(flip, x[:, :, ::-1, :], x)
        if args.random_erase > 0:
            x = random_erasing(jax.random.fold_in(key, 1), x, args.random_erase)
        if use_soft:
            x, targets = mixup_cutmix(
                jax.random.fold_in(key, 2), x, labels, args.num_classes,
                mixup_alpha=max(args.mixup, 1e-8),
                cutmix_alpha=max(args.cutmix, 1e-8),
                label_smoothing=args.label_smooth,
            )
            return x, targets
        return x, labels

    def train_batches(epoch):
        """Per-process LOCAL batches (the reference's per-rank DataLoader:
        DistributedSampler resnet/train.py:266 / RASampler deit/main.py:204).
        Each process loads + augments only its 1/world slice; shard_batch
        assembles the global array."""
        if synthetic:
            for b in synthetic_batches(args.batch_size, args.image_size,
                                       args.num_classes, steps_per_epoch,
                                       seed=args.seed + epoch,
                                       learnable=syn_learnable):
                # synthetic batches are generated identically on every
                # process; take this rank's contiguous slice.
                lo = rank * local_batch
                yield {k: v[lo:lo + local_batch] for k, v in b.items()}, True
        else:
            if args.repeated_aug:
                idxs = ra_sampler_indices(len(train_ds), rank, world, epoch,
                                          seed=args.seed)
            else:
                idxs = distributed_indices(len(train_ds), rank, world, epoch,
                                           seed=args.seed)
            for b in iterate_batches(train_ds, idxs, local_batch,
                                     args.image_size, train=True,
                                     seed=args.seed + epoch + 1_000_003 * rank,
                                     num_threads=args.workers,
                                     interpolation=interpolation):
                yield b, False

    def _pad_rows(img, labels, n_rows):
        n = len(labels)
        if n < n_rows:
            pad = [(0, n_rows - n)]
            img = np.pad(img, pad + [(0, 0)] * (img.ndim - 1))
            labels = np.pad(labels, pad)
        return img, labels

    def validate(epoch):
        """Eval over the full val set.  Handles ragged final batches
        (50000 % (devices*k) != 0 on real ImageNet val) by padding every
        process's index list to the same length — so multi-host processes
        stay in lockstep — padding the final batch to local_batch rows, and
        masking the padding out of the eval_step sums via batch['valid']."""
        top1, top5, count = 0, 0, 0
        if synthetic:
            n_valid = 2 * local_batch

            def gen():
                for b in synthetic_batches(args.batch_size, args.image_size,
                                           args.num_classes, 2, seed=123,
                                           learnable=syn_learnable):
                    lo = rank * local_batch
                    yield {k: v[lo:lo + local_batch] for k, v in b.items()}
            batches = gen()
        else:
            local_idxs = np.arange(rank, len(val_ds), world)
            n_valid = len(local_idxs)
            n_local = -(-len(val_ds) // world)  # identical on every process
            local_idxs = np.concatenate(
                [local_idxs, np.zeros(n_local - n_valid, np.int64)]
            )
            batches = iterate_batches(val_ds, local_idxs, local_batch,
                                      args.image_size, train=False,
                                      num_threads=args.workers,
                                      drop_last=False,
                                      interpolation=interpolation)
        offset = 0
        for b in batches:
            img = b["image"]
            if img.dtype == np.uint8:
                img = np.asarray(normalize(jnp.asarray(img)))
            img, labels = _pad_rows(np.asarray(img), np.asarray(b["label"]),
                                    local_batch)
            valid = (offset + np.arange(local_batch)) < n_valid
            offset += local_batch
            batch = shard_batch(
                {"image": img, "label": labels, "valid": valid}, mesh
            )
            with mesh:
                out = eval_step(state, batch)
            top1 += int(out["top1"]); top5 += int(out["top5"])
            count += int(out["count"])
        acc1 = 100.0 * top1 / max(count, 1)
        acc5 = 100.0 * top5 / max(count, 1)
        print(f"epoch {epoch}: val acc@1 {acc1:.3f} acc@5 {acc5:.3f}")
        return acc1, acc5

    if args.evaluate:
        acc1, acc5 = validate(start_epoch)
        return {"acc1": acc1, "acc5": acc5}

    history = []
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        losses = AverageMeter("loss")
        accs = AverageMeter("acc")
        profiling = False
        for i, (b, prenorm) in enumerate(train_batches(epoch)):
            if args.profile_dir and epoch == start_epoch:
                if i == 5:
                    jax.profiler.start_trace(args.profile_dir)
                    profiling = True
                elif i == 15 and profiling:
                    jax.profiler.stop_trace()
                    profiling = False
            key = jax.random.fold_in(aug_key, epoch * steps_per_epoch + i)
            if prenorm:
                images = jnp.asarray(b["image"])
                labels = jnp.asarray(b["label"])
                if use_soft:
                    images, labels = mixup_cutmix(
                        key, images, labels, args.num_classes,
                        mixup_alpha=max(args.mixup, 1e-8),
                        cutmix_alpha=max(args.cutmix, 1e-8),
                        label_smoothing=args.label_smooth)
            else:
                images, labels = device_augment(
                    key, jnp.asarray(b["image"]), jnp.asarray(b["label"]))
            if jax.process_count() == 1:
                # keep the augmented batch ON DEVICE — np.asarray would
                # force a device->host->device round trip of the full
                # image batch every step (shard_batch device_puts
                # committed arrays without a host copy)
                batch = shard_batch({"image": images, "label": labels}, mesh)
            else:
                # multi-host: make_array_from_process_local_data consumes
                # host-local numpy shards
                batch = shard_batch(
                    {"image": np.asarray(images),
                     "label": np.asarray(labels)}, mesh
                )
            with mesh:
                state, metrics = train_step(state, batch, rng)
            losses.update(float(metrics["loss"]), len(b["label"]))
            if "accuracy" in metrics:
                accs.update(float(metrics["accuracy"]), len(b["label"]))
            if i % args.print_freq == 0:
                print(f"epoch {epoch} [{i}/{steps_per_epoch}] {losses}")
            if not np.isfinite(losses.val):
                raise FloatingPointError(f"non-finite loss at epoch {epoch}")
        if profiling:  # epoch ended before step 15 — close the trace
            jax.profiler.stop_trace()

        acc1, acc5 = validate(epoch)
        is_best = acc1 > best_acc1
        best_acc1 = max(acc1, best_acc1)
        # Orbax saves are COLLECTIVE in multi-host runs (internal
        # sync_global_devices barrier): every process must call save; orbax
        # itself does the single-writer coordination the reference gets from
        # save_on_master (deit/utils.py:211-213, resnet/train.py:331-353).
        save_checkpoint(args.output_dir, jax.device_get(state), epoch,
                        best_acc1, is_best=is_best, keep_every=30)
        # Text artifacts are plain writes — rank-0-gate those.
        if is_main_process():
            # reference artifact formats
            data_save(args.output_dir, "train_loss", epoch, losses.avg)
            data_save(args.output_dir, "val_acc1", epoch, acc1)
            data_save(args.output_dir, "val_acc5", epoch, acc5)
            jsonl_log(os.path.join(args.output_dir, "log.txt"), {
                "epoch": epoch, "train_loss": losses.avg, "test_acc1": acc1,
                "test_acc5": acc5, "best_acc1": best_acc1,
                "epoch_time_s": round(time.time() - t0, 1),
            })
        history.append({"epoch": epoch, "loss": losses.avg, "acc1": acc1})

    return {"best_acc1": best_acc1, "history": history}


if __name__ == "__main__":
    main()

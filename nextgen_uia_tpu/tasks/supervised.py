"""Shared supervised train/eval loop, parameterized by a model bundle.

All supervised drivers (CLIP-family pyramid heads, CLIPSeg, DINOv2 heads,
ResNet/UNet baselines) run through this one engine — the reference's repeated
driver pattern (SURVEY.md §2.3) implemented once: AdamW + per-update cosine,
validate every ``val_interval`` epochs (test split also evaluated
mid-training, segmentation.py:259-277), best-by-metric component checkpoint,
early stop, final test with overlays/ROC + results.csv + timestamped backup.

A bundle provides:
  task            'cls' | 'seg'
  params          full param tree
  bn_state        batch-stat tree or None
  trainable_pred  path predicate for the trainable subset
  forward_train(params, bn_state, batch, rng) -> (logits, aug_masks, new_bn)
  forward_eval(params, bn_state, images_u8)   -> logits
Logits are [B, C] (cls) or [B, C, H, W] (seg); masks NCHW int.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..core import checkpoint as ckpt
from ..core import train as T
from ..core.experiment import (TBWriter, archive_log, backup_folder,
                               save_results_csv)
from ..core.mesh import make_mesh
from ..core.partition import merge, partition
from ..data import pipeline as P
from ..losses import dice_ce_loss, focal_loss
from ..metrics.segmentation import ClsAccumulator, SegAccumulator, one_hot_argmax
from ..utils.viz import plot_roc, roc_figure, visualize_seg


def preprocess(images_u8, masks_u8, args, *, train: bool, rng, in_channels: int = 3):
    """uint8 [B,H,W] -> float NHWC in [0,1] with on-device augmentation
    (classification.py:184-200 semantics). Returns (x, masks_nchw_int|None)."""
    from ..data.augment import augment_batch

    x = images_u8.astype(jnp.float32)[..., None] / 255.0
    m = None
    if masks_u8 is not None:
        m = masks_u8.astype(jnp.float32)[..., None]
    if train and (args.strong_augs or args.weak_augs):
        rng, arng = jax.random.split(rng)
        x, m = augment_batch(arng, x, m, strong=args.strong_augs,
                             weak=args.weak_augs, out_size=args.img_size)
    if in_channels == 3:
        x = jnp.repeat(x, 3, axis=-1)
    if m is not None:
        m = jnp.moveaxis(m, -1, 1).astype(jnp.int32)
    return x, m


@dataclass
class Bundle:
    task: str
    params: Any
    trainable_pred: Callable[[str], bool]
    forward_train: Callable
    forward_eval: Callable
    bn_state: Any = None


def np_criterion_for(task: str):
    if task == "cls":
        return lambda lo, la: float(focal_loss(jnp.asarray(lo), jnp.asarray(la)))
    return lambda lo, la: float(dice_ce_loss(jnp.asarray(lo), jnp.asarray(la)))


def to_nchw01(images_u8):
    """Grayscale uint8 [B,H,W] -> NCHW float [0,1] (overlay/TB-grid layout)."""
    return images_u8.astype(np.float32)[:, None, :, :] / 255.0


def finish_cls(args, acc, stats, run_path, fig_name):
    logits, labels = acc.all()
    df_stats = {k: stats[k] for k in ("acc", "rec", "pre", "f1", "auc")}
    logging.info("  ".join(f"{k}={v * 100:.2f}" for k, v in df_stats.items()))
    folder = backup_folder(run_path, "acc", stats["acc"] * 100)
    save_results_csv(df_stats, os.path.join(folder, "results.csv"))
    plot_roc(logits, labels, os.path.join(folder, f"{fig_name}.png"))
    archive_log(run_path, folder)
    return folder


def finish_seg(args, stats, names, vis, run_path):
    logging.info(" ".join(f"{k}={v:.4f}" for k, v in stats.items()))
    folder = backup_folder(run_path, "iou", stats["iou_mean"] * 100)
    save_results_csv(stats, os.path.join(folder, "results.csv"), scale100=())
    viz_path = os.path.join(folder, "viz")
    rest = list(names)
    for images_u8, gt, logits in vis:
        imgs = to_nchw01(images_u8)
        visualize_seg(imgs, gt, one_hot_argmax(logits), rest[:len(imgs)], viz_path)
        rest = rest[len(imgs):]
    archive_log(run_path, folder)
    return folder


def run_supervised(args, bundle: Bundle, datasets, run_path: str, tag: str):
    task = bundle.task
    trainable, frozen = partition(bundle.params, bundle.trainable_pred)
    # NOTE: prepack_qkv measured SLOWER on v5e (see clip_finetune.py) — only
    # applied when explicitly requested.
    if os.environ.get("NEXTGEN_UIA_PREPACK") == "1":
        from ..core.partition import prepack_qkv

        frozen = prepack_qkv(frozen)
    def loss_fn(trainable_p, frozen_p, batch, rng):
        params = merge(trainable_p, frozen_p["params"])
        logits, m, new_bn = bundle.forward_train(params, frozen_p["bn"], batch, rng)
        if task == "cls":
            loss = focal_loss(logits, batch["label"])
        else:
            loss = dice_ce_loss(logits, m)
        return loss, new_bn

    mesh = make_mesh(getattr(args, "n_data", None) or 1,
                     getattr(args, "n_model", 1))
    n_model = mesh.shape["model"]
    # under FSDP ('model' axis shards the frozen tower) batches shard over
    # BOTH axes — every device does data-parallel compute
    n_dp = mesh.shape["data"] * (n_model if n_model > 1 else 1)
    # FSDP: ONE sharded copy of the frozen tower serves both the train step
    # and eval (HBM / n_model — no unsharded eval duplicate)
    frozen_train = frozen
    eval_frozen_specs = None
    if n_model > 1:
        from ..core.mesh import param_pspecs, shard_params

        frozen_train = shard_params(frozen, mesh)
        eval_frozen_specs = param_pspecs(
            {"params": frozen_train, "bn": bundle.bn_state}, mesh)

    # eval runs data-parallel over the same mesh as training (shard_map —
    # Pallas kernels need local shapes); ragged final batches are padded to
    # the DP width and outputs sliced back
    eval_apply, eval_sharding, eval_dp = T.make_sharded_apply(
        lambda tp, fz, img: bundle.forward_eval(
            merge(tp, fz["params"]), fz["bn"], img),
        mesh, frozen_specs=eval_frozen_specs)

    def evaluate(split, trainable_p, bn_state, max_vis_batches=None):
        """max_vis_batches caps how many (image, gt, logits) payload batches
        are kept host-side — val rounds need at most one (for the TB grid),
        only the final test pass keeps them all (overlay PNGs)."""
        accum = (ClsAccumulator if task == "cls" else SegAccumulator)(
            criterion=np_criterion_for(task))
        names, vis = [], []
        fz = {"params": frozen_train, "bn": bn_state}

        def padded():
            for b in P.batches(datasets[split], args.batch_size, shuffle=False,
                               drop_last=False, workers=args.num_workers):
                b, n_real = T.pad_eval_batch(b, eval_dp)
                b["n_real"] = n_real
                yield b

        for batch in P.prefetch_to_device(padded(), sharding=eval_sharding):
            n_real = batch["n_real"]
            logits = np.asarray(
                eval_apply(trainable_p, fz, batch["image"]))[:n_real]
            if task == "cls":
                accum.update(logits, np.asarray(batch["label"])[:n_real])
            else:
                gt = np.asarray(batch["mask"])[:n_real, None, :, :]
                accum.update(logits, gt)
                names.extend(batch["name"][:n_real])
                if max_vis_batches is None or len(vis) < max_vis_batches:
                    vis.append((np.asarray(batch["image"])[:n_real], gt,
                                logits))
        return accum, names, vis

    bn_state = bundle.bn_state
    best_path = os.path.join(run_path if not args.test else
                             os.path.join("runs", args.exp, args.dataset, "train"),
                             "best_model.npz")

    if not args.test:
        n_train = len(datasets["train"])
        steps_per_epoch = max(n_train // args.batch_size, 1)
        tcfg = T.TrainConfig(lr=args.lr, lr_min=args.lr_min,
                             weight_decay=args.weight_decay,
                             beta1=getattr(args, "beta1", 0.9),
                             beta2=getattr(args, "beta2", 0.95),
                             grad_clip=0.0,
                             accum_steps=1, total_updates=steps_per_epoch * args.epochs)
        opt, _ = T.make_optimizer(tcfg)
        state = T.init_state(trainable, opt)
        if n_dp > 1 and args.batch_size % n_dp != 0:
            raise ValueError(f"batch_size {args.batch_size} must be divisible "
                             f"by the data-parallel width {n_dp}")
        # shard_map DP when >1 device participates (Pallas-safe; BN aux
        # pmean-merged); frozen tower FSDP-sharded over 'model' when n_model>1
        step, mb_sharding = T.make_step_for_mesh(
            loss_fn, opt, tcfg, mesh, has_aux=True,
            frozen_example={"params": frozen_train, "bn": bn_state}
            if n_model > 1 else None)
        if n_dp > 1:
            logging.info(
                f"Data-parallel training over {n_dp} devices (shard_map"
                + (f", frozen tower FSDP over model={n_model})" if n_model > 1
                   else ")"))
        stopper = T.EarlyStopper(args.patience, mode="max")
        writer = TBWriter(os.path.join(run_path, "log"))
        key_metric = "acc" if task == "cls" else "dice_mean"

        k = jax.random.fold_in(jax.random.key(args.seed), 123)
        drop_last = n_train > args.batch_size
        applied_updates = 0  # fully-skipped updates revert the optax schedule

        # full-state resume + preemption (same semantics as the finetune
        # engine: deterministic continuation; mid-epoch position replays via
        # the seeded batch stream). The resumable pack bundles the BN state
        # — it advances every update, so losing it would desync the ResNet
        # tower's running stats from the optimizer step.
        last_path = os.path.join(run_path, "last_state.npz")
        start_epoch, skip_updates = 0, 0
        if getattr(args, "resume", False) and os.path.exists(last_path):
            tmpl = {"train": state}
            if bn_state is not None:
                tmpl["bn"] = bn_state
            restored, meta = ckpt.load_train_state(last_path, tmpl)
            state = restored["train"]
            bn_state = restored.get("bn", bn_state)
            start_epoch = int(meta.get("epoch", 0))
            skip_updates = int(meta.get("updates_into_epoch", 0))
            applied_updates = int(meta.get("applied_updates", 0))
            T.restore_stopper(stopper, meta)
            logging.info(f"Resumed from {last_path} at epoch {start_epoch} "
                         f"(step {int(state['step'])})")

        def _save_last(epoch_, updates_into_epoch_):
            pack = {"train": state}
            if bn_state is not None:
                pack["bn"] = bn_state
            ckpt.save_train_state(last_path, pack, extra={
                "epoch": epoch_, "updates_into_epoch": updates_into_epoch_,
                "applied_updates": applied_updates,
                **T.stopper_meta(stopper)})

        shutdown = T.GracefulShutdown().install()
        try:
            for epoch in range(start_epoch, args.epochs):
                epoch_loss, nb = 0.0, 0
                def microbatched(skip_batches=0):
                    for batch in P.batches(datasets["train"], args.batch_size,
                                           shuffle=True, drop_last=drop_last,
                                           seed=args.seed + epoch,
                                           workers=args.num_workers,
                                           skip_batches=skip_batches):
                        mb = {kk: v for kk, v in batch.items() if kk != "name"}
                        mb = T.stack_microbatches(mb, 1)
                        if n_dp > 1:  # partial final batch: trim to a shardable size
                            keep = (next(iter(mb.values())).shape[1] // n_dp) * n_dp
                            if keep == 0:
                                continue
                            mb = {kk: v[:, :keep] for kk, v in mb.items()}
                        yield mb

                # mid-epoch resume: skip at the index level (no decode cost —
                # data/pipeline.py skip_batches); one loader batch = one update
                skip = skip_updates if epoch == start_epoch else 0
                updates_this_epoch = skip
                if skip:
                    logging.info(f"Mid-epoch resume: skipping {skip} "
                                 f"already-applied updates of epoch {epoch + 1}")
                for mb in P.prefetch_to_device(microbatched(skip),
                                               sharding=mb_sharding):
                    k, k1 = jax.random.split(k)
                    frozen_pack = {"params": frozen_train, "bn": bn_state}
                    state, m = step(state, frozen_pack, mb, k1)
                    if bn_state is not None:
                        bn_state = m["aux"]
                    if int(m["skipped"]) < tcfg.accum_steps:
                        applied_updates += 1
                    epoch_loss += float(m["loss"])
                    nb += 1
                    updates_this_epoch += 1
                    if shutdown.requested:
                        break
                if shutdown.requested:
                    _save_last(epoch, updates_this_epoch)
                    logging.warning(
                        f"Preempted at epoch {epoch + 1} after "
                        f"{updates_this_epoch} updates; train state saved to "
                        f"{last_path} — rerun with --resume to continue")
                    break
                if nb:  # a resume landing on the epoch boundary trains 0 updates
                    writer.scalar("train/loss", epoch_loss / nb, epoch + 1)

                # lr of the LAST update taken this epoch (the reference logs
                # scheduler.get_last_lr(); optax applies sched(k) at the 0-indexed
                # count of TAKEN updates — fully-skipped ones revert the schedule
                # count, so count applied updates host-side, not state['step'])
                writer.scalar("train/lr",
                              T.cosine_lr_value(tcfg, applied_updates - 1),
                              epoch + 1)

                if (epoch + 1) % args.val_interval == 0 or epoch == args.epochs - 1:
                    trainable_now = state["params"]
                    accum, _, vis = evaluate(
                        "val", trainable_now, bn_state,
                        max_vis_batches=1 if writer.enabled else 0)
                    stats = accum.compute()
                    val_metric = stats[key_metric]
                    # every val stat as a scalar + per-task extras, mirroring the
                    # reference's val rounds (segmentation.py:215-226 image grids,
                    # classification.py:214-227 ROC figure); payloads are only
                    # built when tensorboard is actually attached
                    for sk, sv in stats.items():
                        if np.isscalar(sv) or getattr(sv, "ndim", 1) == 0:
                            writer.scalar(f"val/{sk}", float(sv), epoch + 1)
                    if task == "seg" and vis and writer.enabled:
                        images_u8, gt, logits = vis[0]
                        n = min(4, len(images_u8))
                        writer.images("val/input_images",
                                      to_nchw01(images_u8[:n]), epoch + 1)
                        writer.images("val/label_images",
                                      gt[:n].astype(np.float32), epoch + 1)
                        writer.images("val/pred_images",
                                      np.argmax(logits[:n], axis=1)[:, None]
                                      .astype(np.float32), epoch + 1)
                    elif task == "cls" and writer.enabled:
                        import matplotlib.pyplot as plt

                        fig, _ = roc_figure(*accum.all())
                        writer.figure("val/roc_curve", fig, epoch + 1)
                        plt.close(fig)
                    logging.info(f"Epoch {epoch + 1}: loss={epoch_loss / max(nb, 1):.4f} "
                                 f"val {key_metric}={val_metric:.4f}")
                    if stopper.update(val_metric, epoch):
                        payload = {"params": trainable_now}
                        if bn_state is not None:
                            payload["bn"] = bn_state
                        n = ckpt.save(best_path, payload)
                        logging.info(f"Best model saved ({n} tensors) at epoch {epoch + 1}")
                    taccum, _, _ = evaluate("test", trainable_now, bn_state)
                    logging.info(f"  [test during training] {key_metric}="
                                 f"{taccum.compute()[key_metric]:.4f}")
                    if stopper.should_stop:
                        logging.info(f"Early stopping at epoch {epoch + 1}")
                # save BEFORE any early-stop break so last_state always reflects
                # this epoch (resuming with a raised --epochs must not replay it)
                _save_last(epoch + 1, 0)
                if stopper.should_stop:
                    break
        finally:
            shutdown.uninstall()
        writer.close()
        if shutdown.requested:
            # preempted: no final test pass on a partial run
            return {"preempted": True}

    if os.path.exists(best_path):
        payload = {"params": trainable}
        if bn_state is not None:
            payload["bn"] = bn_state
        loaded, n = ckpt.load_into(best_path, payload)
        trainable = loaded["params"]
        if bn_state is not None:
            bn_state = loaded["bn"]
        logging.info(f"Loaded {n} tensors from {best_path}")
    elif args.test and args.head_weights:
        loaded, n = ckpt.load_into(args.head_weights, {"params": trainable})
        trainable = loaded["params"]
        logging.info(f"Loaded {n} tensors from {args.head_weights}")

    accum, names, vis = evaluate("test", trainable, bn_state)
    stats = accum.compute()
    if task == "cls":
        finish_cls(args, accum, stats, run_path, f"roc_curve_{tag}")
    else:
        finish_seg(args, stats, names, vis, run_path)
    return stats

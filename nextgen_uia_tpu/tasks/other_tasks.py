"""Task drivers for CLIPSeg, DINOv2, and the ResNet/UNet baselines.

  - clipseg_segmentation_main: vendored-CLIP tower + pretrained FiLM decoder,
    one dense prompt per dataset as conditioning, DiceCE, decoder-only
    training/checkpoints (src/models/clipseg/segmentation.py; default 1000
    epochs, single-channel logits expanded to 2 classes by negation,
    clipseg_adapter.py:92-96).
  - dino_classification_main / dino_segmentation_main: frozen DINOv2 B/14
    encoder; ClassificationHead over the last 4 blocks, or Linear/UNet
    decoders (src/models/dino/*.py; --decoder_type).
  - baselines_*: torchvision-style ResNets (--version) for classification,
    UNet for segmentation, plus few-shot variants
    (src/models/baselines/*.py).
"""

from __future__ import annotations

import argparse
import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..core import checkpoint as ckpt
from ..core.experiment import model_summary
from ..core.partition import by_keywords
from ..data import datasets as D
from ..models import clip as clip_mod
from ..models import dinov2 as DV
from ..models.heads import (ClipSegDecoderConfig, clipseg_decoder_apply,
                            clipseg_decoder_init)
from ..models.resnet import resnet_apply, resnet_init
from ..models.unet import unet_apply, unet_init
from . import prompts as PR
from .clip_tasks import extract_layers_for
from .common import base_parser, build_clip_model, get_text_tokenizer, seed_everything, setup_run
from .supervised import Bundle, preprocess, run_supervised


def _apply_fewshot(args, datasets, data_task):
    labels = D.read_labels(args.data_root, args.dataset) if data_task == "cls" else None
    sampled = D.sample_few_shot(
        datasets["train"].names, labels or {}, rng=np.random.default_rng(args.seed),
        shots_per_class=getattr(args, "shots_per_class", None),
        train_ratio=getattr(args, "train_ratio", None),
        stratified=getattr(args, "stratified", True))
    datasets["train"].names = sampled
    logging.info(f"Few-shot training subset: {len(sampled)} samples")
    args.batch_size = min(args.batch_size, max(len(sampled), 1))


def _add_fewshot_flags(p):
    p.add_argument("--shots_per_class", type=int, default=None)
    # reference default samples 10% of train when shots unset
    # (baselines/fewshot_classification.py get_args)
    p.add_argument("--train_ratio", type=float, default=0.1)
    p.add_argument("--stratified", default=True, action=argparse.BooleanOptionalAction)


# ---------------------------------------------------------------------------
# CLIPSeg
# ---------------------------------------------------------------------------


def add_clipseg_flags(p):
    p.add_argument("--version", type=str, default="ViT-B/16")
    p.add_argument("--ckpt", type=str, default="ckpt/ViT-B-16.pt")
    p.add_argument("--reduce_dim", type=int, default=64,
                   help="decoder reduce dim (CIDAS/clipseg-rd64-refined uses 64)")
    p.add_argument("--decoder_ckpt", type=str, default=None,
                   help="converted CLIPSeg decoder .npz (convert/clipseg_decoder)")


def clipseg_segmentation_main(argv=None):
    p = base_parser("clipseg_segmentation", epochs=1000, batch_size=32,
                    strong_augs=True, weak_augs=True)
    add_clipseg_flags(p)
    args = p.parse_args(argv)
    rng = seed_everything(args.seed)
    run_path = setup_run(args, "test" if args.test else "train")
    bundle = build_clipseg_bundle(args, rng)
    datasets = D.make_datasets(args.data_root, args.dataset, args.img_size, task="seg", cache=args.cache_images)
    return run_supervised(args, bundle, datasets, run_path, "clipseg_segmentation")


def build_clipseg_bundle(args, rng):
    """Model + forwards for CLIPSeg dense segmentation, dataset-free (shared
    by the train driver and the serving CLI)."""
    cfg, backbone = build_clip_model(args, "openai", rng=rng)
    dcfg = ClipSegDecoderConfig(
        hidden_size=cfg.vision.width, reduce_dim=args.reduce_dim,
        cond_dim=cfg.text.embed_dim,
        extract_layers=extract_layers_for(cfg.vision.depth),
        patch_size=cfg.vision.patch_size)
    decoder = clipseg_decoder_init(jax.random.fold_in(rng, 3), dcfg)
    params = {"backbone": backbone, "head": decoder}
    if args.decoder_ckpt:
        # the converter CLI writes decoder-rooted keys (film_mul/..., no
        # 'head/' prefix); driver-trained best_model.npz roots at
        # 'params/head/...'. Accept both.
        try:
            params["head"], n = ckpt.load_into(args.decoder_ckpt, decoder)
        except ckpt.NoMatch:
            loaded, n = ckpt.load_into(args.decoder_ckpt,
                                       {"params": {"head": decoder}})
            params["head"] = loaded["params"]["head"]
        logging.info(f"Loaded {n} decoder tensors from {args.decoder_ckpt}")
    logging.info(model_summary({"model": params}, trainable_pred=by_keywords("head")))

    tokenizer = get_text_tokenizer(args, "openai")
    prompt = PR.clipseg_prompt_for(args.dataset)
    prompt_tokens = jnp.asarray(tokenizer([prompt]))  # [1, 77]

    # decoder-only training: the CLIP towers are fully frozen, so jax.grad
    # never differentiates them even in the train step — the forward-only
    # whole-block megakernel applies everywhere here (models.clip.infer_cfg)
    icfg = clip_mod.infer_cfg(cfg)

    def model_logits(params, x, train, rng):
        _, acts = clip_mod.encode_image(params["backbone"], icfg, x,
                                        extract_layers=dcfg.extract_layers)
        cond = clip_mod.encode_text(params["backbone"], icfg, prompt_tokens)
        cond = jnp.broadcast_to(cond, (x.shape[0], cond.shape[-1]))
        single = clipseg_decoder_apply(params["head"], dcfg, acts, cond)  # [B,H,W]
        # 1-channel -> 2-class logits by negation (clipseg_adapter.py:92-96)
        return jnp.stack([-single, single], axis=1)

    def forward_train(params, bn, batch, rng):
        x, m = preprocess(batch["image"], batch.get("mask"), args, train=True, rng=rng)
        return model_logits(params, x, True, rng), m, None

    def forward_eval(params, bn, images_u8):
        x, _ = preprocess(images_u8, None, args, train=False, rng=None)
        return model_logits(params, x, False, None)

    return Bundle(task="seg", params=params, trainable_pred=by_keywords("head"),
                  forward_train=forward_train, forward_eval=forward_eval)


# ---------------------------------------------------------------------------
# DINOv2
# ---------------------------------------------------------------------------


def _dino_compute_dtype(args):
    """--compute_dtype for the FROZEN DINOv2 encoder (the trainable decoder
    heads stay f32, matching the CLIP families' discipline: frozen-tower
    compute in bf16 on TPU, f32 master params and head math everywhere).
    Until round 4 the dino bundles silently ignored the flag and ran the
    encoder in f32 — a 2-3x matmul + HBM penalty on v5e."""
    import jax.numpy as jnp

    return jnp.bfloat16 if args.compute_dtype == "bfloat16" else None


def _build_dino(args, rng):
    import dataclasses

    # the reference hardcodes vit_base (dino/classification.py:74); the size
    # table is exposed as an additive flag for the other published variants
    cfg = DV.dinov2_config(getattr(args, "dino_arch", None) or "vit_base")
    if getattr(args, "debug_tiny", False):
        cfg = dataclasses.replace(cfg, width=64, depth=5, heads=4)
    params = DV.dinov2_init(rng, cfg)
    if args.backbone_ckpt:
        from ..core import checkpoint as _ck

        wrapped = {"encoder": params}
        try:
            wrapped, n = _ck.load_into(args.backbone_ckpt, wrapped)
            params = wrapped["encoder"]
        except _ck.NoMatch:
            params, n = _ck.load_into(args.backbone_ckpt, params)
        logging.info(f"Loaded {n} DINOv2 tensors from {args.backbone_ckpt}")
    else:
        logging.warning("No --backbone_ckpt: DINOv2 weights are RANDOM "
                        "(convert with nextgen_uia_tpu.convert dinov2)")
    return cfg, params


def add_dino_flags(p, *, seg: bool = False):
    # the reference dino drivers default to 518-px inputs (37x37 grid, 1370
    # tokens — dino/classification.py:36, segmentation.py:35), unlike the
    # CLIP families' 224
    p.set_defaults(patch_size=14, img_size=518)
    p.add_argument("--dino_arch", type=str, default="vit_base",
                   choices=sorted(DV.DINOV2_ARCHS))
    if seg:
        p.add_argument("--decoder_type", type=str, default="unet",
                       choices=["linear", "unet"])
        # additive TPU flag: bf16 *activations* through the trainable UNet
        # decoder (f32 master params + BN stats). Opt-in — it halves the
        # decoder HBM traffic that dominates the 518-px seg step, but changes
        # trainable-path numerics vs the f32-eager reference, so quality must
        # be validated per scripts/quality_parity.sh before flipping a run.
        p.add_argument("--head_dtype", type=str, default="float32",
                       choices=["float32", "bfloat16"])


def dino_classification_main(argv=None, *, fewshot: bool = False):
    # reference dino CLI defaults: 1000 epochs, batch 24
    # (dino/classification.py:50-51)
    p = base_parser("dino_classification", epochs=1000, batch_size=24,
                    strong_augs=True, weak_augs=True)
    add_dino_flags(p)
    if fewshot:
        _add_fewshot_flags(p)
    args = p.parse_args(argv)
    rng = seed_everything(args.seed)
    run_path = setup_run(args, "test" if args.test else "train")
    bundle = build_dino_cls_bundle(args, rng)
    datasets = D.make_datasets(args.data_root, args.dataset, args.img_size, task="cls", cache=args.cache_images)
    if fewshot:
        _apply_fewshot(args, datasets, "cls")
    return run_supervised(args, bundle, datasets, run_path, "dino_classification")


def build_dino_cls_bundle(args, rng):
    """Frozen DINOv2 encoder + 4-layer cls head, dataset-free (shared by the
    train driver and the serving CLI)."""
    cfg, encoder = _build_dino(args, rng)
    head = DV.cls_head_init(jax.random.fold_in(rng, 5), cfg.width,
                            num_classes=args.num_classes, layers=4)
    params = {"encoder": encoder, "head": head}
    logging.info(model_summary({"model": params}, trainable_pred=by_keywords("head")))
    dt = _dino_compute_dtype(args)

    def logits_fn(params, x):
        feats = DV.get_intermediate_layers(params["encoder"], x, 4, cfg, dtype=dt)
        # trainable-head boundary: head math stays f32 (reference discipline)
        feats = jax.tree.map(lambda a: a.astype(jnp.float32), feats)
        return DV.cls_head_apply(params["head"], feats, layers=4)

    def forward_train(params, bn, batch, rng):
        x, _ = preprocess(batch["image"], None, args, train=True, rng=rng)
        return logits_fn(params, x), None, None

    def forward_eval(params, bn, images_u8):
        x, _ = preprocess(images_u8, None, args, train=False, rng=None)
        return logits_fn(params, x)

    return Bundle(task="cls", params=params, trainable_pred=by_keywords("head"),
                  forward_train=forward_train, forward_eval=forward_eval)


def dino_segmentation_main(argv=None, *, fewshot: bool = False):
    # reference dino CLI defaults: 1000 epochs, batch 24
    # (dino/segmentation.py:49-50)
    p = base_parser("dino_segmentation", epochs=1000, batch_size=24,
                    strong_augs=True, weak_augs=True)
    add_dino_flags(p, seg=True)
    if fewshot:
        _add_fewshot_flags(p)
    args = p.parse_args(argv)
    rng = seed_everything(args.seed)
    run_path = setup_run(args, "test" if args.test else "train")
    bundle = build_dino_seg_bundle(args, rng)
    datasets = D.make_datasets(args.data_root, args.dataset, args.img_size, task="seg", cache=args.cache_images)
    if fewshot:
        _apply_fewshot(args, datasets, "seg")
    return run_supervised(args, bundle, datasets, run_path, "dino_segmentation")


def build_dino_seg_bundle(args, rng):
    """Frozen DINOv2 encoder + linear/UNet decoder, dataset-free (shared by
    the train driver and the serving CLI)."""
    cfg, encoder = _build_dino(args, rng)
    bn_state = None
    if args.decoder_type == "unet":
        head, bn_state = DV.unet_decoder_init(jax.random.fold_in(rng, 5), cfg.width,
                                              num_classes=args.num_classes)
    else:
        head = DV.linear_decoder_init(jax.random.fold_in(rng, 5), cfg.width,
                                      num_classes=args.num_classes)
    params = {"encoder": encoder, "head": head}
    logging.info(model_summary({"model": params}, trainable_pred=by_keywords("head")))

    n_layers = 5 if args.decoder_type == "unet" else 1
    dt = _dino_compute_dtype(args)
    # trainable-head boundary: decoder math stays f32 (reference discipline)
    # unless --head_dtype bfloat16 opts the UNet decoder activations into bf16
    head_dt = (jnp.bfloat16 if getattr(args, "head_dtype", "float32") == "bfloat16"
               and args.decoder_type == "unet" else None)

    def logits_fn(params, bn, x, train):
        feats = DV.get_intermediate_layers(params["encoder"], x, n_layers, cfg,
                                           dtype=dt)
        feats = jax.lax.stop_gradient(feats)  # frozen encoder (dino/segmentation.py)
        if head_dt is None:
            feats = jax.tree.map(lambda a: a.astype(jnp.float32), feats)
        if args.decoder_type == "unet":
            return DV.unet_decoder_apply(params["head"], bn, feats,
                                         image_size=args.img_size,
                                         patch_size=args.patch_size, train=train,
                                         dtype=head_dt)
        return DV.linear_decoder_apply(params["head"], feats[-1][0],
                                       image_size=args.img_size,
                                       patch_size=args.patch_size), None

    def forward_train(params, bn, batch, rng):
        x, m = preprocess(batch["image"], batch.get("mask"), args, train=True, rng=rng)
        logits, new_bn = logits_fn(params, bn, x, True)
        return logits, m, new_bn

    def forward_eval(params, bn, images_u8):
        x, _ = preprocess(images_u8, None, args, train=False, rng=None)
        logits, _ = logits_fn(params, bn, x, False)
        return logits

    return Bundle(task="seg", params=params, trainable_pred=by_keywords("head"),
                  forward_train=forward_train, forward_eval=forward_eval,
                  bn_state=bn_state)


# ---------------------------------------------------------------------------
# Baselines
# ---------------------------------------------------------------------------


def add_baseline_cls_flags(p):
    p.add_argument("--version", type=str, default="resnet18")


def add_baseline_seg_flags(p):
    p.set_defaults(in_channels=1)
    p.add_argument("--init_channels", type=int, default=16)


def baselines_classification_main(argv=None, *, fewshot: bool = False):
    p = base_parser("baselines_classification", epochs=200, batch_size=32,
                    strong_augs=True, weak_augs=True)
    add_baseline_cls_flags(p)
    if fewshot:
        _add_fewshot_flags(p)
    args = p.parse_args(argv)
    rng = seed_everything(args.seed)
    run_path = setup_run(args, "test" if args.test else "train")
    bundle = build_baseline_cls_bundle(args, rng)
    datasets = D.make_datasets(args.data_root, args.dataset, args.img_size, task="cls", cache=args.cache_images)
    if fewshot:
        _apply_fewshot(args, datasets, "cls")
    return run_supervised(args, bundle, datasets, run_path, "baselines_classification")


def build_baseline_cls_bundle(args, rng):
    """ResNet baseline classifier, dataset-free (shared by the train driver
    and the serving CLI)."""
    params, bn_state = resnet_init(rng, args.version, in_channels=args.in_channels,
                                   num_classes=args.num_classes)
    if args.backbone_ckpt:
        flat = ckpt.load_flat(args.backbone_ckpt)  # one read for both merges
        # a converted ImageNet checkpoint carries a 1000-way fc head; the
        # reference replaces the classifier for the task's classes
        # (models/baselines — torchvision weights + new fc), so a
        # width-mismatched head stays at init instead of crashing the load
        skip = ()
        fcw = flat.get("fc/w")
        if fcw is not None and tuple(fcw.shape) != params["fc"]["w"].shape:
            skip = ("fc/",)
            logging.info(f"--backbone_ckpt fc head is {tuple(fcw.shape)}, "
                         f"model wants {params['fc']['w'].shape}: "
                         "reinitializing fc (reference replaces the head)")
        params, n = ckpt.merge_flat(flat, params, source=args.backbone_ckpt,
                                    skip=skip)
        # converted torchvision checkpoints carry BN running stats under
        # '__state__/' (convert CLI); dropping them would leave eval-mode
        # BN at init statistics — garbage for a pretrained tower
        ns = 0
        try:
            st, ns = ckpt.merge_flat(flat, {"__state__": bn_state},
                                     source=args.backbone_ckpt)
            bn_state = st["__state__"]
        except ckpt.NoMatch:
            logging.warning(f"{args.backbone_ckpt} has no __state__/ BN "
                            "running stats; keeping init statistics")
        logging.info(f"Loaded {n} ResNet tensors (+{ns} BN state) from "
                     f"{args.backbone_ckpt}")
    params = {"model": params}
    logging.info(model_summary({"model": params}, trainable_pred=lambda _: True))

    def forward_train(p_, bn, batch, rng):
        x, _ = preprocess(batch["image"], None, args, train=True, rng=rng,
                          in_channels=args.in_channels)
        logits, new_bn = resnet_apply(p_["model"], bn, x, args.version, train=True)
        return logits, None, new_bn

    def forward_eval(p_, bn, images_u8):
        x, _ = preprocess(images_u8, None, args, train=False, rng=None,
                          in_channels=args.in_channels)
        logits, _ = resnet_apply(p_["model"], bn, x, args.version, train=False)
        return logits

    return Bundle(task="cls", params=params, trainable_pred=lambda _: True,
                  forward_train=forward_train, forward_eval=forward_eval,
                  bn_state=bn_state)


def baselines_segmentation_main(argv=None, *, fewshot: bool = False):
    p = base_parser("baselines_segmentation", epochs=200, batch_size=32,
                    strong_augs=True, weak_augs=True)
    add_baseline_seg_flags(p)
    if fewshot:
        _add_fewshot_flags(p)
    args = p.parse_args(argv)
    rng = seed_everything(args.seed)
    run_path = setup_run(args, "test" if args.test else "train")
    bundle = build_baseline_seg_bundle(args, rng)
    datasets = D.make_datasets(args.data_root, args.dataset, args.img_size, task="seg", cache=args.cache_images)
    if fewshot:
        _apply_fewshot(args, datasets, "seg")
    return run_supervised(args, bundle, datasets, run_path, "baselines_segmentation")


def build_baseline_seg_bundle(args, rng):
    """UNet baseline segmenter, dataset-free (shared by the train driver and
    the serving CLI)."""
    params, bn_state = unet_init(rng, args.in_channels, args.num_classes,
                                 init_channels=args.init_channels)
    params = {"model": params}
    logging.info(model_summary({"model": params}, trainable_pred=lambda _: True))

    def forward_train(p_, bn, batch, rng):
        rng, drng = jax.random.split(rng)
        x, m = preprocess(batch["image"], batch.get("mask"), args, train=True,
                          rng=rng, in_channels=args.in_channels)
        logits, new_bn = unet_apply(p_["model"], bn, x, train=True, rng=drng)
        return logits, m, new_bn

    def forward_eval(p_, bn, images_u8):
        x, _ = preprocess(images_u8, None, args, train=False, rng=None,
                          in_channels=args.in_channels)
        logits, _ = unet_apply(p_["model"], bn, x, train=False)
        return logits

    return Bundle(task="seg", params=params, trainable_pred=lambda _: True,
                  forward_train=forward_train, forward_eval=forward_eval,
                  bn_state=bn_state)

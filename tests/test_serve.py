"""E2E tests for the serving / batch-inference CLI (tasks/serve.py).

CPU, tiny towers; synthetic images on disk. Covers the three tasks, ragged
tail batches through the sharded apply, csv/mask outputs, and the
jax.export StableHLO round-trip.
"""

import csv
import glob
import os

import numpy as np
import pytest
from PIL import Image


def _make_images(root, n=7, size=48):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        p = os.path.join(root, f"img_{i:02d}.png")
        Image.fromarray(rng.integers(0, 255, (size, size), np.uint8)).save(p)
        paths.append(p)
    return paths


COMMON = ["--debug_tiny", "--img_size", "32", "--batch_size", "4",
          "--num_workers", "2", "--compute_dtype", "float32"]


def test_predict_zero_shot_e2e(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    paths = _make_images(tmp_path / "imgs")
    from nextgen_uia_tpu.tasks.biomedclip.predict import main

    out = main(["--task", "zero_shot", "--images", str(tmp_path / "imgs"),
                "--dataset", "BUSI", "--exp", "srv_zs"] + COMMON)
    assert out["n_images"] == len(paths)
    with open(os.path.join(out["out"], "predictions.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == len(paths)
    assert [r["path"] for r in rows] == paths  # order preserved over batches
    for r in rows:
        probs = [float(v) for k, v in r.items() if k.startswith("prob_")]
        assert abs(sum(probs) - 1.0) < 1e-5
        assert r["pred"].strip() in ("benign", "malignant", "normal")


def test_predict_cls_and_export_e2e(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _make_images(tmp_path / "imgs", n=5)
    from nextgen_uia_tpu.tasks.clip.predict import main

    out = main(["--task", "cls", "--images", str(tmp_path / "imgs"),
                "--exp", "srv_cls", "--num_classes", "3",
                "--class_names", "a,b,c",
                "--export", "fwd.stablehlo"] + COMMON)
    with open(os.path.join(out["out"], "predictions.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 5 and set(r["pred"] for r in rows) <= {"a", "b", "c"}

    # the artifact pair was round-tripped (deserialize+call) before writing;
    # prove it again here independently, the way a serving host would:
    # numpy-only weight rebuild + deserialize + call
    import jax

    from nextgen_uia_tpu.tasks.serve import load_exported_params

    art = os.path.join(out["out"], "fwd.stablehlo")
    blob = open(art, "rb").read()
    params = load_exported_params(art + ".params.npz")
    re = jax.export.deserialize(blob)
    logits = re.call(params, np.zeros((4, 32, 32), np.uint8))
    assert np.asarray(logits).shape == (4, 3)
    assert np.all(np.isfinite(np.asarray(logits, np.float32)))


def test_predict_seg_e2e(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    paths = _make_images(tmp_path / "imgs", n=3)
    from nextgen_uia_tpu.tasks.biomedclip.predict import main

    out = main(["--task", "seg", "--images", str(tmp_path / "imgs"),
                "--exp", "srv_seg"] + COMMON)
    masks = sorted(glob.glob(os.path.join(out["out"], "*_mask.png")))
    assert len(masks) == len(paths)
    m = np.asarray(Image.open(masks[0]))
    assert m.shape == (32, 32)
    with open(os.path.join(out["out"], "index.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == len(paths)


def test_predict_survives_corrupt_image(tmp_path, monkeypatch):
    """A single unreadable file must not kill the run: its row reports
    decode_error and every other image still gets a prediction."""
    monkeypatch.chdir(tmp_path)
    paths = _make_images(tmp_path / "imgs", n=4)
    bad = os.path.join(tmp_path / "imgs", "img_01.png")
    with open(bad, "wb") as f:
        f.write(b"not a png at all")
    from nextgen_uia_tpu.tasks.biomedclip.predict import main

    out = main(["--task", "zero_shot", "--images", str(tmp_path / "imgs"),
                "--dataset", "BUSI", "--exp", "srv_bad"] + COMMON)
    with open(os.path.join(out["out"], "predictions.csv")) as f:
        rows = {r["path"]: r for r in csv.DictReader(f)}
    assert len(rows) == len(paths)
    assert rows[bad]["status"] == "decode_error" and rows[bad]["pred"] == ""
    for p in paths:
        if p != bad:
            assert rows[p]["status"] == "ok" and rows[p]["pred"]


def test_predict_dino_cls_e2e(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    paths = _make_images(tmp_path / "imgs", n=5)
    from nextgen_uia_tpu.tasks.dino.predict import main

    out = main(["--task", "cls", "--images", str(tmp_path / "imgs"),
                "--exp", "srv_dino", "--num_classes", "2"] + COMMON)
    with open(os.path.join(out["out"], "predictions.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == len(paths)
    assert all(r["pred"] in ("0", "1") for r in rows)


def test_predict_clipseg_e2e(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    paths = _make_images(tmp_path / "imgs", n=3)
    from nextgen_uia_tpu.tasks.clipseg.predict import main

    out = main(["--images", str(tmp_path / "imgs"), "--dataset", "BUSI",
                "--exp", "srv_cseg"] + COMMON)  # default task: seg
    masks = glob.glob(os.path.join(out["out"], "*_mask.png"))
    assert len(masks) == len(paths)


def test_predict_baselines_seg_trained_roundtrip(tmp_path, monkeypatch):
    """The strongest serving contract: a checkpoint TRAINED by the baselines
    driver (UNet + BN running stats) serves directly via --head_weights."""
    from synth_data import make_synth_root

    root, _, _ = make_synth_root(tmp_path / "data", dataset="BUSI", n=12,
                                 img_size=32)
    monkeypatch.chdir(tmp_path)
    from nextgen_uia_tpu.tasks.baselines.predict import main as predict
    from nextgen_uia_tpu.tasks.baselines.segmentation import main as train

    train(["--dataset", "BUSI", "--data_root", str(root), "--exp", "bl",
           "--epochs", "1", "--val_interval", "1", "--patience", "3"]
          + COMMON)
    ckpts = glob.glob("runs/bl/BUSI/train/best_model.npz")
    assert ckpts, "training must save a best model"

    paths = _make_images(tmp_path / "imgs", n=3)
    out = predict(["--task", "seg", "--images", str(tmp_path / "imgs"),
                   "--exp", "srv_bl", "--head_weights", ckpts[0],
                   "--export", "unet.stablehlo"] + COMMON)
    masks = glob.glob(os.path.join(out["out"], "*_mask.png"))
    assert len(masks) == len(paths)
    with open(os.path.join(out["out"], "index.csv")) as f:
        rows = list(csv.DictReader(f))
    assert all(r["status"] == "ok" for r in rows)
    # bundle-family export: module + weights pair written (probe ran at
    # export time); BN running stats ship as ARGUMENTS in the npz, not as
    # baked module constants — a serving host can rebuild + call with them
    art = os.path.join(out["out"], "unet.stablehlo")
    assert os.path.exists(art)
    import jax

    from nextgen_uia_tpu.tasks.serve import load_exported_params

    rebuilt = load_exported_params(art + ".params.npz")
    assert "bn" in rebuilt and "params" in rebuilt
    re = jax.export.deserialize(open(art, "rb").read())
    seg = re.call(rebuilt, np.zeros((4, 32, 32), np.uint8))
    assert np.all(np.isfinite(np.asarray(seg, np.float32)))


def test_predict_clip_cls_trained_roundtrip(tmp_path, monkeypatch):
    """A PyramidHead checkpoint trained by the CLIP supervised driver serves
    via --head_weights (the engine-side counterpart of the baselines test)."""
    from synth_data import make_synth_root

    root, _, _ = make_synth_root(tmp_path / "data", dataset="BUSI", n=12,
                                 img_size=32)
    monkeypatch.chdir(tmp_path)
    from nextgen_uia_tpu.tasks.clip.classification import main as train
    from nextgen_uia_tpu.tasks.clip.predict import main as predict

    train(["--dataset", "BUSI", "--data_root", str(root), "--exp", "ccls2",
           "--epochs", "1", "--val_interval", "1", "--patience", "3"]
          + COMMON)
    ckpts = glob.glob("runs/ccls2/BUSI/train/best_model.npz")
    assert ckpts
    paths = _make_images(tmp_path / "imgs", n=3)
    out = predict(["--task", "cls", "--images", str(tmp_path / "imgs"),
                   "--exp", "srv_ccls", "--head_weights", ckpts[0]] + COMMON)
    with open(os.path.join(out["out"], "predictions.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3 and all(r["status"] == "ok" for r in rows)

    # the reference's evaluate-an-existing-checkpoint flow must accept the
    # same driver-trained file (regression: 'params/'-rooted payloads once
    # failed _build_supervised's name-intersection load)
    stats = train(["--dataset", "BUSI", "--data_root", str(root), "--exp",
                   "ccls2b", "--test", "--head_weights", ckpts[0]] + COMMON)
    assert {"acc", "auc"} <= set(stats)


def test_predict_zero_shot_with_finetuned_mona(tmp_path, monkeypatch):
    """A MONA adapter checkpoint from the contrastive finetune driver plugs
    into zero-shot serving via --mona_weights — the reference's headline
    finetune->evaluate flow, ending at the serving CLI instead."""
    from synth_data import make_finetune_csv

    csv_path, img_dir = make_finetune_csv(tmp_path / "ft", n=16, img_size=32)
    monkeypatch.chdir(tmp_path)
    from nextgen_uia_tpu.tasks.biomedclip.finetune import main as finetune
    from nextgen_uia_tpu.tasks.biomedclip.predict import main as predict

    finetune(["--method", "mona", "--mona_variant", "hybrid", "--exp", "ftm",
              "--epochs", "1", "--patience", "3", "--accumulation_steps", "1",
              "--finetune_csvs", csv_path, "--finetune_img_dirs", img_dir]
             + COMMON)
    ckpts = glob.glob("runs/ftm/best_model.npz")
    assert ckpts
    paths = _make_images(tmp_path / "imgs", n=3)
    out = predict(["--task", "zero_shot", "--images", str(tmp_path / "imgs"),
                   "--dataset", "BUSI", "--exp", "srv_ftm",
                   "--mona_weights", ckpts[0], "--mona_variant", "hybrid"]
                  + COMMON)
    with open(os.path.join(out["out"], "predictions.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3 and all(r["status"] == "ok" for r in rows)


def test_predict_images_txt_list(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    paths = _make_images(tmp_path / "imgs", n=3)
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(paths[::-1]))  # explicit order, reversed
    from nextgen_uia_tpu.tasks.serve import collect_images

    assert collect_images(str(lst)) == paths[::-1]
    with pytest.raises(SystemExit):
        collect_images(str(tmp_path / "nope.csv"))

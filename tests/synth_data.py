"""Synthetic dataset generator following the reference's on-disk conventions."""

import numpy as np
from pathlib import Path
from PIL import Image


def make_synth_root(root, dataset="SYNTH", n=12, img_size=32, seed=0):
    root = Path(root)
    rng = np.random.default_rng(seed)
    (root / "classification" / dataset).mkdir(parents=True, exist_ok=True)
    (root / "all" / "images").mkdir(parents=True, exist_ok=True)
    (root / "all" / "masks").mkdir(parents=True, exist_ok=True)

    names, labels = [], {}
    for i in range(n):
        name = f"img_{i:03d}.png"
        label = i % 2
        img = rng.integers(0, 255, (img_size, img_size), dtype=np.uint8)
        mask = np.zeros((img_size, img_size), np.uint8)
        if label:
            s = img_size // 4
            mask[s:3 * s, s:3 * s] = 255
            img[s:3 * s, s:3 * s] = np.clip(img[s:3 * s, s:3 * s] + 60, 0, 255)
        Image.fromarray(img, "L").save(root / "all" / "images" / name)
        Image.fromarray(mask, "L").save(root / "all" / "masks" / name)
        names.append(name)
        labels[name] = label

    k = n // 3
    splits = {"train": names[:k], "val": names[k:2 * k], "test": names[2 * k:]}
    for split, items in splits.items():
        (root / "classification" / dataset / f"{split}.txt").write_text("\n".join(items))
    with open(root / "classification" / dataset / "labels.csv", "w") as f:
        for name, label in labels.items():
            f.write(f"{name},{label}\n")
    return root, dataset, splits


def make_finetune_csv(root, n=24, img_size=32, seed=0):
    """Caption CSV + image dir following the MedPix/PMC-CURD layout
    (filename,Caption columns; captions must be >20 chars to survive the
    length filter)."""
    root = Path(root)
    (root / "images").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    lines = ["filename,Caption"]
    for i in range(n):
        name = f"ft_{i:03d}.png"
        img = rng.integers(0, 255, (img_size, img_size, 3), dtype=np.uint8)
        Image.fromarray(img).save(root / "images" / name)
        lines.append(f"{name},synthetic ultrasound frame number {i} showing a "
                     f"lesion pattern variant {i % 4}")
    csv = root / "captions.csv"
    csv.write_text("\n".join(lines))
    return str(csv), str(root / "images")

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

"""Experiment scaffolding: logging, param summaries, artifact conventions.

Reproduces the reference's observability layer (src/utils/tools.py:37-105 and
the per-driver artifact flow): file+stdout logging to ``runs/<exp>/.../log.log``,
trainable-parameter tables, ``results.csv`` plus figures archived into a
timestamped ``{time}_{metric}={value}`` backup folder
(e.g. src/models/biomedclip/classification.py:342-363), and an optional
TensorBoard writer.
"""

from __future__ import annotations

import datetime
import logging
import os
import shutil
import sys

from .partition import count_params, flatten_with_paths


def setup_logging(args, log_path: str):
    for handler in logging.root.handlers[:]:
        logging.root.removeHandler(handler)
    os.makedirs(log_path, exist_ok=True)
    logging.basicConfig(
        filename=os.path.join(log_path, "log.log"), filemode="w", level=logging.INFO,
        format="[%(asctime)s] %(message)s", datefmt="%Y-%m-%d %H:%M:%S")
    logging.getLogger().addHandler(logging.StreamHandler(sys.stdout))
    logging.info(str(args))


def format_params(num: int) -> str:
    if num >= 1e6:
        return f"{num / 1e6:.1f} M"
    if num >= 1e3:
        return f"{num / 1e3:.1f} K"
    return str(num)


def model_summary(named_trees: dict, trainable_pred=None) -> str:
    """Parameter table over {name: pytree}; trainable_pred(path) marks rows."""
    lines = [f"\n{'=' * 60}"]
    total = trainable = 0
    for name, tree in named_trees.items():
        n = count_params(tree)
        t = 0
        if trainable_pred is not None:
            t = sum(v.size for p, v in flatten_with_paths(tree)
                    if v is not None and trainable_pred(p))
        total += n
        trainable += t
        lines.append(f"{name:<24} total={format_params(n):>10}  trainable={format_params(t):>10}")
    lines.append(f"{'-' * 60}")
    pct = 100.0 * trainable / total if total else 0.0
    lines.append(f"{'ALL':<24} total={format_params(total):>10}  "
                 f"trainable={format_params(trainable):>10} ({pct:.2f}%)")
    lines.append("=" * 60)
    return "\n".join(lines)


def save_results_csv(stats: dict, path: str, *, scale100=("acc", "rec", "pre", "f1", "auc")):
    """results.csv in the reference's Metric/Mean format (zero_shot.py:263-268)."""
    import pandas as pd

    rows = []
    for k, v in stats.items():
        if k == "loss":
            continue
        val = v * 100 if k in scale100 else v
        rows.append({"Metric": k.capitalize(), "Mean": val})
    df = pd.DataFrame(rows)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    df.to_csv(path, index=False, float_format="%.2f")
    return df


def backup_folder(base_path: str, metric_name: str, metric_value: float) -> str:
    """Timestamped archive folder ``{time}_{metric}={value:.2f}``."""
    ts = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
    folder = os.path.join(base_path, f"{ts}_{metric_name}={metric_value:.2f}")
    os.makedirs(folder, exist_ok=True)
    return folder


def archive_log(log_path: str, dest_folder: str):
    src = os.path.join(log_path, "log.log")
    if os.path.exists(src):
        shutil.move(src, os.path.join(dest_folder, "log.log"))


class TBWriter:
    """Thin TensorBoard scalar writer; silently no-ops when unavailable."""

    def __init__(self, logdir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._w = SummaryWriter(logdir)
        except Exception:
            self._w = None

    @property
    def enabled(self) -> bool:
        """False when tensorboard is unavailable — callers can skip building
        expensive payloads (image grids, matplotlib figures) entirely."""
        return self._w is not None

    def scalar(self, tag: str, value: float, step: int):
        if self._w is not None:
            self._w.add_scalar(tag, value, step)

    def images(self, tag: str, batch_nchw, step: int):
        """Image grid (NCHW float [0,1] or uint8) — the seg drivers' val-round
        input/label/pred grids (segmentation.py:215-217)."""
        if self._w is not None:
            self._w.add_images(tag, batch_nchw, step)

    def figure(self, tag: str, fig, step: int):
        """Matplotlib figure (classification.py:214 val ROC)."""
        if self._w is not None:
            self._w.add_figure(tag, fig, step)

    def close(self):
        if self._w is not None:
            self._w.close()

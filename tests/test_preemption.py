"""Preemption-safe training: GracefulShutdown + mid-epoch resume.

Preemptible TPU pools deliver SIGTERM before reclaiming the host; the
engines must checkpoint the full train state at the next update boundary
and exit cleanly, and --resume must continue exactly where the signal
landed (deterministic seeded batch streams make the mid-epoch position
replayable). The loop-level behavior is tested deterministically with a
trip-wire stand-in for the handler; the real signal path has its own unit
test (in-process SIGTERM — the handler absorbs the first signal and
restores the previous handlers).
"""

import json
import os
import signal

import numpy as np
import pytest

from synth_data import make_finetune_csv, make_synth_root

from nextgen_uia_tpu.core import train as T

TINY = ["--img_size", "32", "--batch_size", "4", "--debug_tiny",
        "--num_workers", "2", "--compute_dtype", "float32"]


def test_graceful_shutdown_signal_roundtrip():
    prev_term = signal.getsignal(signal.SIGTERM)
    sd = T.GracefulShutdown().install()
    try:
        assert not sd.requested
        os.kill(os.getpid(), signal.SIGTERM)  # absorbed by the handler
        assert sd.requested
        # first signal restored the previous handlers (second would kill)
        assert signal.getsignal(signal.SIGTERM) is prev_term
    finally:
        sd.uninstall()
    assert signal.getsignal(signal.SIGTERM) is prev_term


def test_train_state_meta_rides_inside_the_npz(tmp_path):
    """The position metadata must publish ATOMICALLY with the state (one
    os.replace) — the sidecar .meta.json is for human inspection only. A
    preemption kill between two files must never pair new state with stale
    meta (that would double-apply the epoch's updates on resume)."""
    import jax.numpy as jnp

    from nextgen_uia_tpu.core import checkpoint as ckpt

    state = {"w": jnp.ones((2, 2)), "step": jnp.zeros(())}
    path = str(tmp_path / "s.npz")
    ckpt.save_train_state(path, state, extra={"epoch": 3,
                                              "updates_into_epoch": 5})
    os.remove(path + ".meta.json")  # prove the npz alone is authoritative
    restored, meta = ckpt.load_train_state(path, state)
    assert meta == {"epoch": 3, "updates_into_epoch": 5}
    assert np.asarray(restored["w"]).shape == (2, 2)


class TripAfter:
    """Stands in for GracefulShutdown: 'requested' flips True at the N-th
    read and stays True — deterministic mid-epoch preemption."""

    def __init__(self, n):
        self.n = n
        self.calls = 0

    def install(self):
        return self

    def uninstall(self):
        pass

    @property
    def requested(self):
        self.calls += 1
        return self.calls > self.n


def _meta(run_dir):
    with open(os.path.join(run_dir, "last_state.npz.meta.json")) as f:
        return json.load(f)


def test_finetune_preemption_and_mid_epoch_resume(tmp_path, monkeypatch):
    csv, img_dir = make_finetune_csv(tmp_path / "ft", n=24, img_size=32)
    monkeypatch.chdir(tmp_path)
    from nextgen_uia_tpu.tasks.biomedclip.finetune import main

    args = ["--method", "mona", "--mona_variant", "hybrid", "--exp", "pre",
            "--epochs", "2", "--patience", "5", "--seed", "3",
            "--accumulation_steps", "1", "--finetune_csvs", csv,
            "--finetune_img_dirs", img_dir] + TINY
    # n=24 / batch 4 -> 6 updates per epoch; TripAfter(2) lets two
    # update-boundary checks pass, so preemption lands after the 3rd update
    monkeypatch.setattr(T, "GracefulShutdown", lambda: TripAfter(2))
    out = main(args)
    assert out.get("preempted") is True
    run_dir = "runs/pre"
    meta = _meta(run_dir)
    assert meta["epoch"] == 0 and meta["updates_into_epoch"] == 3
    assert meta["update_count"] == 3

    # resume (real handler back): replays exactly the remaining updates of
    # epoch 0, then epoch 1 in full — total must be 2 full epochs' worth
    monkeypatch.undo()
    monkeypatch.chdir(tmp_path)
    out2 = main(args + ["--resume"])
    assert "preempted" not in out2 and np.isfinite(out2["best_val_loss"])
    meta2 = _meta(run_dir)
    assert meta2["epoch"] == 2 and meta2["updates_into_epoch"] == 0
    # exact replay: completed total is even (2 identical-length epochs) and
    # strictly more than the preempted prefix
    assert meta2["update_count"] % 2 == 0
    assert meta2["update_count"] > meta["update_count"]


def test_supervised_preemption_and_mid_epoch_resume(tmp_path, monkeypatch):
    root, _, _ = make_synth_root(tmp_path / "data", dataset="BUSI", n=36,
                                 img_size=32)  # train split 12 -> 3 updates/epoch
    monkeypatch.chdir(tmp_path)
    from nextgen_uia_tpu.tasks.clip.classification import main

    args = ["--dataset", "BUSI", "--data_root", str(root), "--exp", "spre",
            "--epochs", "2", "--val_interval", "1", "--patience", "5",
            "--seed", "3"] + TINY
    monkeypatch.setattr(T, "GracefulShutdown", lambda: TripAfter(1))
    out = main(args)
    assert out.get("preempted") is True
    run_dir = "runs/spre/BUSI/train"
    meta = _meta(run_dir)
    assert meta["epoch"] == 0 and meta["updates_into_epoch"] == 2

    monkeypatch.undo()
    monkeypatch.chdir(tmp_path)
    stats = main(args + ["--resume"])
    assert "preempted" not in stats and {"acc", "auc"} <= set(stats)
    meta2 = _meta(run_dir)
    assert meta2["epoch"] == 2 and meta2["updates_into_epoch"] == 0

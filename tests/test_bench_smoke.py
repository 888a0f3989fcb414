"""Smoke-test bench.py at toy size on the virtual CPU mesh.

bench.py is the round-end artifact the driver runs on real hardware; a
regression there silently voids the round's headline number, so both bench
modes (training step + zero-shot eval) are executed end-to-end here with
NEXTGEN_UIA_BENCH_* shrunk to seconds of CPU work. Numbers are not asserted
(CPU timing is meaningless) — only that each mode runs and emits the one
well-formed JSON line the driver parses.
"""

import importlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE_ENV = {
    "NEXTGEN_UIA_BENCH_BATCH": "2",
    "NEXTGEN_UIA_BENCH_STEPS": "2",
    "NEXTGEN_UIA_BENCH_WARMUP": "1",
    "NEXTGEN_UIA_BENCH_DEPTH": "2",
    "NEXTGEN_UIA_BENCH_IMG": "64",
    "NEXTGEN_UIA_BENCH_DTYPE": "float32",  # CPU bf16 is emulated too slowly
}


def _run_mode(monkeypatch, capsys, fn_name):
    for k, v in SMOKE_ENV.items():
        monkeypatch.setenv(k, v)
    import bench

    bench = importlib.reload(bench)
    getattr(bench, fn_name)()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["unit"] == "images/sec/chip"
    assert rec["value"] > 0
    # CPU smoke rates can round vs_baseline to 0.0; only require presence
    assert rec["vs_baseline"] >= 0
    return rec


def test_bench_train_mode_smoke(monkeypatch, capsys):
    rec = _run_mode(monkeypatch, capsys, "main")
    assert rec["metric"] == "BUSI Mona fine-tune images/sec/chip"


def test_bench_eval_mode_smoke(monkeypatch, capsys):
    rec = _run_mode(monkeypatch, capsys, "eval_bench")
    assert rec["metric"] == "BUSI zero-shot eval images/sec/chip"
    assert rec["batch"] == 2


def test_bench_supervised_mode_smoke(monkeypatch, capsys):
    monkeypatch.setenv("NEXTGEN_UIA_BENCH_SUP_BATCH", "2")
    rec = _run_mode(monkeypatch, capsys, "supervised_bench")
    assert rec["metric"] == "BUSI supervised seg train images/sec/chip"
    assert rec["batch"] == 2 and rec["augs"] is True

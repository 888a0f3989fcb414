"""Trace-attribute the supervised seg train step on the real TPU (round 5).

VERDICT r4 Weak #1 / Next #2: the 224^2 batch-32 supervised step (uint8 ->
on-device augs -> bf16 frozen ViT-B/16 + hybrid MONA -> PyramidHead ->
DiceCE -> AdamW) measured 63.2 ms with only the aug share (17.6 ms) known.
This probe reuses the step from bench/smoke_headorder.py (identical to
bench.py::supervised_bench) and prints per-fusion device-time attribution
so the remaining ~45 ms can be attacked item by item.

Usage: python bench/profile_supervised.py [trace_dir]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from smoke_headorder import build_step


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sup_trace"
    step, state, frozen, mb = build_step()
    rng = jax.random.key(0)

    for _ in range(3):
        rng, k = jax.random.split(rng)
        state, m = step(state, frozen, mb, k)
    print("warm loss:", float(m["loss"]))

    jax.profiler.start_trace(trace_dir)
    for _ in range(5):
        rng, k = jax.random.split(rng)
        state, m = step(state, frozen, mb, k)
    _ = float(m["loss"])
    jax.profiler.stop_trace()
    time.sleep(1)

    path = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))[-1]
    data = json.load(gzip.open(path))
    events = [e for e in data["traceEvents"] if e.get("ph") == "X"]
    pids = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = [p for p, n in pids.items() if "TPU" in n or "/device" in n.lower()]
    if not dev_pids:
        dev_pids = [3]
    print("device pids:", {p: pids.get(p) for p in dev_pids})

    agg = {}
    total = 0.0
    for e in events:
        if e["pid"] in dev_pids:
            name = e["name"]
            dur = e.get("dur", 0) / 1e3  # ms
            agg[name] = agg.get(name, 0.0) + dur
            total += dur
    print(f"\ntotal device time over 5 steps: {total:.1f} ms ({total/5:.1f} ms/step)")
    print(f"{'op':<72} {'ms/step':>8} {'%':>6}")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:60]:
        print(f"{name[:72]:<72} {ms/5:>8.3f} {ms/total*100:>6.2f}")


if __name__ == "__main__":
    main()

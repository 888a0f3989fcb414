"""Profile the flagship Mona-finetune train step on the real TPU and print
per-op device-time attribution (top HLO ops grouped by fusion name).

Usage: python bench/profile_step.py [trace_dir]
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def build_step():
    from nextgen_uia_tpu.core import train as T
    from nextgen_uia_tpu.core.partition import by_keywords, merge, partition, cast_frozen_bf16
    from nextgen_uia_tpu.losses import info_nce
    from nextgen_uia_tpu.models import clip as clip_mod
    from __graft_entry__ import _flagship

    cfg, params = _flagship(depth=12)
    trainable, frozen = partition(params, by_keywords("mona"))
    frozen = cast_frozen_bf16(frozen)
    tcfg = T.TrainConfig(lr=1e-4, accum_steps=1, total_updates=1000)
    opt, _ = T.make_optimizer(tcfg)
    state = T.init_state(trainable, opt)

    def loss_fn(tp, fp, batch, rng):
        p = merge(tp, fp)
        fi, _ = clip_mod.encode_image(p, cfg, batch["image"], rng=rng)
        ft = clip_mod.encode_text(p, cfg, batch["tokens"])
        return info_nce(fi, ft)

    step = T.make_train_step(loss_fn, opt, tcfg, donate=True)
    batch = {
        "image": jax.random.uniform(jax.random.key(1), (1, 64, 224, 224, 3), jnp.float32),
        "tokens": jax.random.randint(jax.random.key(2), (1, 64, 256), 1, 30000),
    }
    return step, state, frozen, batch


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_trace"
    step, state, frozen, batch = build_step()
    rng = jax.random.key(0)

    for _ in range(3):
        rng, k = jax.random.split(rng)
        state, m = step(state, frozen, batch, k)
    print("warm loss:", float(m["loss"]))

    jax.profiler.start_trace(trace_dir)
    for _ in range(5):
        rng, k = jax.random.split(rng)
        state, m = step(state, frozen, batch, k)
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
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{name[:72]:<72} {ms/5:>8.3f} {ms/total*100:>6.2f}")


if __name__ == "__main__":
    main()

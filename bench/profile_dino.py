"""Trace-attribute the dino-seg train step @518 on the real TPU (round 5).

After the factorized equalize, the shipped dino-seg step (augs + frozen
bf16 vit_base encoder @1370 tokens + f32 UNet decoder + DiceCE + AdamW over
the head) measures 270.5 ms/batch-24; encoder forward is ~114.5 ms and augs
~30.5 ms, leaving ~125 ms of decoder/loss/optimizer unattributed. This
probe traces the step (shipped split_f32 decoder) and prints per-fusion
device time so the residue can be attacked or floor-proofed.

Usage: python bench/profile_dino.py [trace_dir]
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
import jax.numpy as jnp

import smoke_decoder as SD


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dino_trace"
    from nextgen_uia_tpu.core import train as T
    from nextgen_uia_tpu.core.partition import cast_frozen_bf16
    from nextgen_uia_tpu.data.augment import augment_batch
    from nextgen_uia_tpu.losses import dice_ce_loss
    from nextgen_uia_tpu.models import dinov2 as DV

    cfg = DV.dinov2_config("vit_base")
    encoder = jax.device_put(cast_frozen_bf16(DV.dinov2_init(jax.random.key(0), cfg)))
    head, bn0 = DV.unet_decoder_init(jax.random.key(1), cfg.width)
    tcfg = T.TrainConfig(lr=1e-4, accum_steps=1, total_updates=1000)
    opt, _ = T.make_optimizer(tcfg)

    def loss_fn(head_p, frozen_p, mb, rng):
        x = mb["image"].astype(jnp.float32)[..., None] / 255.0
        m = mb["mask"].astype(jnp.float32)[..., None]
        rng, arng = jax.random.split(rng)
        x, m = augment_batch(arng, x, m, strong=True, weak=True, out_size=SD.IMG)
        x = jnp.repeat(x, 3, axis=-1)
        feats = DV.get_intermediate_layers(frozen_p["params"], x, 5, cfg,
                                           dtype=jnp.bfloat16)
        feats = jax.tree.map(lambda a: a.astype(jnp.float32), feats)
        logits, new_bn = DV.unet_decoder_apply(head_p, frozen_p["bn"], feats,
                                               image_size=SD.IMG, patch_size=14,
                                               train=True)
        m = jnp.moveaxis(m, -1, 1).astype(jnp.int32)
        return dice_ce_loss(logits, m), new_bn

    step = T.make_train_step(loss_fn, opt, tcfg, donate=True, has_aux=True)
    state = T.init_state(jax.tree.map(jnp.array, head), opt)
    frozen = {"params": encoder, "bn": bn0}
    mb = {"image": jax.random.randint(jax.random.key(2), (1, SD.BATCH, SD.IMG, SD.IMG),
                                      0, 255, jnp.uint8),
          "mask": (jax.random.uniform(jax.random.key(3), (1, SD.BATCH, SD.IMG, SD.IMG))
                   > 0.7).astype(jnp.uint8)}
    rng = jax.random.key(4)
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
    agg, total = {}, 0.0
    for e in events:
        if e["pid"] in dev_pids:
            agg[e["name"]] = agg.get(e["name"], 0.0) + e.get("dur", 0) / 1e3
            total += e.get("dur", 0) / 1e3
    print(f"\ntotal device time over 5 steps: {total:.1f} ms ({total/5:.1f} ms/step)")
    print(f"{'op':<72} {'ms/step':>8} {'%':>6}")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:60]:
        print(f"{name[:72]:<72} {ms/5:>8.3f} {ms/total*100:>6.2f}")


if __name__ == "__main__":
    main()

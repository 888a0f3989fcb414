"""PyramidHead seg-tail ordering A/B (round 5, VERDICT r4 Next #2).

The reference's seg head upsamples the fused 14x14x512 map to 224x224 and
THEN applies the 1x1 conv to num_classes
(/root/reference/src/third_party/timm/clip_adapter.py:46-49). The two ops
are linear and commute exactly, but the order changes HBM traffic by ~256x
on the upsampled tensor: [32,224,224,512] f32 is 3.3 GB written + read
again by the conv (and the same again for the bwd), vs [32,224,224,2] at
13 MB when the conv runs first. On an ~89 GB/s part that difference is
step-time-visible.

This probe times the FULL supervised seg train step (uint8 -> on-device
strong+weak augs -> bf16 frozen ViT-B/16 + hybrid MONA -> PyramidHead ->
DiceCE -> AdamW), identical to bench.py::supervised_bench, under both
orderings via the NEXTGEN_UIA_SEG_CONV_FIRST trace-time toggle.

Methodology per CLAUDE.md: chained steps, host scalar fetch barrier, best
of 2 windows, run solo.  python bench/smoke_headorder.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH = int(os.environ.get("NEXTGEN_UIA_BENCH_SUP_BATCH", "32"))
IMG = int(os.environ.get("NEXTGEN_UIA_BENCH_IMG", "224"))
STEPS = int(os.environ.get("NEXTGEN_UIA_BENCH_STEPS", "10"))


def build_step():
    from nextgen_uia_tpu.core import train as T
    from nextgen_uia_tpu.core.partition import (by_keywords, cast_frozen_bf16,
                                                merge, partition)
    from nextgen_uia_tpu.data.augment import augment_batch
    from nextgen_uia_tpu.losses import dice_ce_loss
    from nextgen_uia_tpu.models import clip as clip_mod
    from nextgen_uia_tpu.models.heads import (PyramidHeadConfig,
                                              pyramid_head_apply,
                                              pyramid_head_init)
    from nextgen_uia_tpu.tasks.clip_tasks import extract_layers_for
    from __graft_entry__ import _flagship

    cfg, backbone = _flagship(depth=12, image_size=IMG,
                              compute_dtype="bfloat16")
    hcfg = PyramidHeadConfig(feature_dim=cfg.vision.width, reduce_dim=512,
                             num_classes=2, img_size=IMG, task="seg",
                             cls_hidden=False)
    head = pyramid_head_init(jax.random.key(7), hcfg)
    trainable, frozen = partition({"backbone": backbone, "head": head},
                                  by_keywords("head", "mona", "lora"))
    frozen = jax.device_put(cast_frozen_bf16(frozen))
    tcfg = T.TrainConfig(lr=1e-4, accum_steps=1, total_updates=1000)
    opt, _ = T.make_optimizer(tcfg)
    state = T.init_state(trainable, opt)
    taps = extract_layers_for(cfg.vision.depth)

    def loss_fn(tp, fp, mb, rng):
        p = merge(tp, fp)
        x = mb["image"].astype(jnp.float32)[..., None] / 255.0
        m = mb["mask"].astype(jnp.float32)[..., None]
        rng, arng = jax.random.split(rng)
        x, m = augment_batch(arng, x, m, strong=True, weak=True, out_size=IMG)
        x = jnp.repeat(x, 3, axis=-1)
        rng, drng, hrng = jax.random.split(rng, 3)
        _, acts = clip_mod.encode_image(p["backbone"], cfg, x, rng=drng,
                                        extract_layers=taps)
        logits = pyramid_head_apply(p["head"], hcfg, acts, rng=hrng)
        m = jnp.moveaxis(m, -1, 1).astype(jnp.int32)
        return dice_ce_loss(logits, m)

    step = T.make_train_step(loss_fn, opt, tcfg, donate=True)
    mb = {
        "image": jax.random.randint(jax.random.key(1), (1, BATCH, IMG, IMG),
                                    0, 255, jnp.uint8),
        "mask": (jax.random.uniform(jax.random.key(2), (1, BATCH, IMG, IMG))
                 > 0.7).astype(jnp.uint8),
    }
    return step, state, frozen, mb


def time_variant(conv_first: bool):
    os.environ["NEXTGEN_UIA_SEG_CONV_FIRST"] = "1" if conv_first else "0"
    step, state, frozen, mb = build_step()
    rng = jax.random.key(0)
    for _ in range(3):
        rng, k = jax.random.split(rng)
        state, metrics = step(state, frozen, mb, k)
    float(metrics["loss"])
    dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            rng, k = jax.random.split(rng)
            state, metrics = step(state, frozen, mb, k)
        float(metrics["loss"])
        dts.append(time.perf_counter() - t0)
    return min(dts) / STEPS, float(metrics["loss"])


def main():
    results = {}
    for name, conv_first in (("ref_order_resize_conv", False),
                             ("conv_first", True)):
        dt, loss = time_variant(conv_first)
        results[f"{name}_ms"] = round(dt * 1e3, 1)
        results[f"{name}_img_s"] = round(BATCH / dt, 1)
        print(f"supervised step {name:22s}: {dt * 1e3:7.1f} ms/step "
              f"({BATCH / dt:7.1f} img/s)  loss={loss:.4f}", flush=True)
    results["speedup"] = round(results["ref_order_resize_conv_ms"]
                               / results["conv_first_ms"], 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

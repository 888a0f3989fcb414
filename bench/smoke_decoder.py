"""Dino-seg UNet decoder traffic A/B (round 4).

PERF.md's round-4 analysis identified decoder HBM traffic as the dominant
non-encoder cost of the 518-px dino-seg step (~170 ms outside encoder fwd +
augs): the 37->592 upsampling pyramid reads/writes tens of MB per image per
level, f32, fwd and bwd, on an ~89 GB/s part. Two levers land this round:

  1. concat-free concat-conv (nn/layers.py:conv2d_cat) — numerics-exact
     (within f32 accumulation order), ON by default;
  2. bf16 decoder *activations* (f32 master params + BN stats) — opt-in
     via --head_dtype bfloat16 (changes trainable-path numerics vs the
     f32-eager reference).

This probe measures the full dino-seg train step (frozen bf16 ViT-B/14
encoder @518 + augs + UNet decoder fwd/bwd + DiceCE + AdamW) in three
variants: (a) round-3 shape — materialized concat, f32 decoder (inlined
here as the baseline); (b) shipped — conv2d_cat, f32; (c) opt-in —
conv2d_cat, bf16 activations.

Methodology per CLAUDE.md: chained steps, host scalar fetch as the barrier,
best of 2 windows, run solo. python bench/smoke_decoder.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH = int(os.environ.get("NEXTGEN_UIA_BENCH_BATCH", "24"))
IMG = int(os.environ.get("NEXTGEN_UIA_BENCH_IMG", "518"))
STEPS = int(os.environ.get("NEXTGEN_UIA_BENCH_STEPS", "10"))


def concat_f32_decoder(params, state, layer_feats, *, image_size, patch_size,
                       train):
    """Round-3 decoder shape: materialized concat, all-f32 — the baseline."""
    from nextgen_uia_tpu.nn.layers import (batchnorm, conv2d, conv_transpose2d,
                                           resize_bilinear_align_corners)

    g = image_size // patch_size

    def to_map(i):
        t = layer_feats[i][0]
        return t.reshape(t.shape[0], g, g, t.shape[-1])

    x = to_map(4)
    skips = [to_map(3), to_map(2), to_map(1), to_map(0)]
    new_state = {}
    for i in range(4):
        up = params[f"up{i}"]
        st = state[f"up{i}"]
        x = conv_transpose2d(up["upconv"], x, stride=2)
        sk = conv2d(up["skip_conv"], skips[i])
        sk, s_skip = batchnorm(up["skip_bn"], st["skip_bn"], sk, train=train)
        sk = jax.nn.relu(sk)
        sk = resize_bilinear_align_corners(sk, (x.shape[1], x.shape[2]))
        x = jnp.concatenate([x, sk], axis=-1)
        x = conv2d(up["conv"], x)
        x, s_conv = batchnorm(up["conv_bn"], st["conv_bn"], x, train=train)
        x = jax.nn.relu(x)
        new_state[f"up{i}"] = {"conv_bn": s_conv, "skip_bn": s_skip}
    b, h, w, c = x.shape
    x = jax.image.resize(x, (b, image_size, image_size, c), method="bicubic")
    return jnp.moveaxis(x, -1, 1), new_state


def main():
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

    def make_loss(decoder):
        def loss_fn(head_p, frozen_p, mb, rng):
            x = mb["image"].astype(jnp.float32)[..., None] / 255.0
            m = mb["mask"].astype(jnp.float32)[..., None]
            rng, arng = jax.random.split(rng)
            x, m = augment_batch(arng, x, m, strong=True, weak=True, out_size=IMG)
            x = jnp.repeat(x, 3, axis=-1)
            feats = DV.get_intermediate_layers(frozen_p["params"], x, 5, cfg,
                                               dtype=jnp.bfloat16)
            feats = jax.tree.map(lambda a: a.astype(jnp.float32), feats)
            logits, new_bn = decoder(head_p, frozen_p["bn"], feats)
            m = jnp.moveaxis(m, -1, 1).astype(jnp.int32)
            return dice_ce_loss(logits, m), new_bn
        return loss_fn

    variants = {
        "concat_f32": make_loss(lambda p, s, f: concat_f32_decoder(
            p, s, f, image_size=IMG, patch_size=14, train=True)),
        "split_f32": make_loss(lambda p, s, f: DV.unet_decoder_apply(
            p, s, f, image_size=IMG, patch_size=14, train=True)),
        "split_bf16": make_loss(lambda p, s, f: DV.unet_decoder_apply(
            p, s, f, image_size=IMG, patch_size=14, train=True,
            dtype=jnp.bfloat16)),
    }

    mb = {"image": jax.random.randint(jax.random.key(2), (1, BATCH, IMG, IMG),
                                      0, 255, jnp.uint8),
          "mask": (jax.random.uniform(jax.random.key(3), (1, BATCH, IMG, IMG))
                   > 0.7).astype(jnp.uint8)}
    frozen = {"params": encoder, "bn": bn0}

    results = {}
    for label, loss_fn in variants.items():
        step = T.make_train_step(loss_fn, opt, tcfg, donate=True, has_aux=True)
        state = T.init_state(jax.tree.map(jnp.array, head), opt)
        rng = jax.random.key(4)
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
        dt = min(dts) / STEPS
        results[label] = dt
        print(f"dino seg step {label:11s}: {dt * 1e3:8.1f} ms/step "
              f"({BATCH / dt:7.1f} img/s)", flush=True)

    print(json.dumps({
        **{f"{k}_ms": round(v * 1e3, 1) for k, v in results.items()},
        "split_speedup": round(results["concat_f32"] / results["split_f32"], 3),
        "bf16_speedup": round(results["concat_f32"] / results["split_bf16"], 3),
        "batch": BATCH, "img": IMG,
    }))


if __name__ == "__main__":
    main()

"""DINOv2 long-sequence attention A/B: einsum routing vs the long-N flash
kernel (round 4).

The reference's dino tasks run ViT-B/14 at --img_size 518 (default,
/root/reference/src/models/dino/classification.py:36) = 1370 tokens, frozen
encoder, 200-epoch supervised configs — the longest sequences in the
framework. Until round 4 mha() routed N > 512 through the einsum path, where
XLA materializes the [B, 12, 1370, 1370] f32 score tensor in HBM (~2.9 GB at
batch 32, ~3 round-trips per layer through an ~89 GB/s HBM). The flash
kernel now covers 512 < N <= 2048 with one head per grid cell and a raised
scoped-vmem ceiling (ops/flash_attention.py).

Measures, on the real TPU (bf16, batch 32 @ 518, the task configuration):
  1. frozen forward_features (what every dino train step computes under the
     frozen encoder) — einsum routing (NEXTGEN_UIA_FLASH_NMAX=512) vs flash;
  2. the full dino-seg train step (forward + UNet decoder fwd/bwd + augs).

Methodology per CLAUDE.md: chained steps, host scalar fetch as the barrier,
best of 2 windows. Run solo: python bench/smoke_dino.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH = int(os.environ.get("NEXTGEN_UIA_BENCH_BATCH", "32"))
IMG = int(os.environ.get("NEXTGEN_UIA_BENCH_IMG", "518"))
STEPS = int(os.environ.get("NEXTGEN_UIA_BENCH_STEPS", "10"))


def _timed(fn, *args):
    acc = jnp.float32(0.0)
    acc = fn(acc, *args)  # compile warmup
    float(acc)
    dts = []
    for _ in range(2):
        acc = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            acc = fn(acc, *args)
        float(acc)  # relay-safe barrier
        dts.append(time.perf_counter() - t0)
    return min(dts) / STEPS


def forward_ab():
    from nextgen_uia_tpu.core.partition import cast_frozen_bf16
    from nextgen_uia_tpu.models import dinov2 as DV

    cfg = DV.dinov2_config("vit_base")
    params = cast_frozen_bf16(DV.dinov2_init(jax.random.key(0), cfg))
    params = jax.device_put(params)
    images = jax.random.normal(jax.random.key(1), (BATCH, IMG, IMG, 3),
                               jnp.float32)

    results = {}
    for label, nmax in (("einsum", "512"), ("flash", "2048")):
        os.environ["NEXTGEN_UIA_FLASH_NMAX"] = nmax

        @jax.jit
        def step(acc, params, images):
            f = DV.forward_features(params, images, cfg, dtype=jnp.bfloat16)
            return acc + jnp.float32(jnp.sum(f["x_norm_clstoken"]))

        dt = _timed(step, params, images)
        results[label] = dt
        print(f"forward_features {label:7s}: {dt * 1e3:8.1f} ms/step "
              f"({BATCH / dt:7.1f} img/s)", flush=True)
    return results


def seg_step_ab():
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
        x, m = augment_batch(arng, x, m, strong=True, weak=True, out_size=IMG)
        x = jnp.repeat(x, 3, axis=-1)
        feats = DV.get_intermediate_layers(frozen_p["params"], x, 5, cfg,
                                           dtype=jnp.bfloat16)
        feats = jax.tree.map(lambda a: a.astype(jnp.float32), feats)
        logits, new_bn = DV.unet_decoder_apply(
            head_p, frozen_p["bn"], feats, image_size=IMG, train=True)
        m = jnp.moveaxis(m, -1, 1).astype(jnp.int32)
        return dice_ce_loss(logits, m), new_bn

    mb = {"image": jax.random.randint(jax.random.key(2), (1, BATCH, IMG, IMG),
                                      0, 255, jnp.uint8),
          "mask": (jax.random.uniform(jax.random.key(3), (1, BATCH, IMG, IMG))
                   > 0.7).astype(jnp.uint8)}

    results = {}
    frozen = {"params": encoder, "bn": bn0}
    for label, nmax in (("einsum", "512"), ("flash", "2048")):
        os.environ["NEXTGEN_UIA_FLASH_NMAX"] = nmax
        step = T.make_train_step(loss_fn, opt, tcfg, donate=True, has_aux=True)
        # fresh buffers per leg: the first step donates state, and init_state
        # captures `head`'s arrays by reference
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
        print(f"dino seg train step {label:7s}: {dt * 1e3:8.1f} ms/step "
              f"({BATCH / dt:7.1f} img/s)", flush=True)
    return results


if __name__ == "__main__":
    fwd = forward_ab()
    seg = seg_step_ab()
    print(json.dumps({
        "fwd_einsum_ms": round(fwd["einsum"] * 1e3, 1),
        "fwd_flash_ms": round(fwd["flash"] * 1e3, 1),
        "fwd_speedup": round(fwd["einsum"] / fwd["flash"], 2),
        "seg_einsum_ms": round(seg["einsum"] * 1e3, 1),
        "seg_flash_ms": round(seg["flash"] * 1e3, 1),
        "seg_speedup": round(seg["einsum"] / seg["flash"], 2),
        "batch": BATCH, "img": IMG,
    }))

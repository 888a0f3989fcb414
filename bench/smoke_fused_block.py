"""TPU smoke + A/B for the whole-block megakernel (ops/fused_block.py).

Numeric parity (composed vs fused_infer at ViT-B/16 and BERT-256 dims, bf16)
plus optional chained-step timing windows (relay-safe: one scalar fetch per
window — CLAUDE.md measurement methodology).

Usage: python bench/smoke_fused_block.py [--time]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def main():
    do_time = "--time" in sys.argv
    print("backend:", jax.default_backend(), flush=True)

    from nextgen_uia_tpu.adapters.mona import inject_mona
    from nextgen_uia_tpu.models.bert import BertConfig, bert_apply, bert_init
    from nextgen_uia_tpu.models.vit import VIT_B16_TIMM, vit_apply, vit_init

    rng = jax.random.PRNGKey(0)
    cfg = dataclasses.replace(VIT_B16_TIMM, mona_variant="hybrid")
    params = vit_init(rng, cfg)
    params, _ = inject_mona(jax.random.fold_in(rng, 1), params, dim=cfg.width,
                            variant="hybrid")
    params = jax.device_put(params)

    B = 64 if do_time else 8
    imgs = jax.random.normal(jax.random.fold_in(rng, 2), (B, 224, 224, 3),
                             jnp.float32)
    fused_cfg = dataclasses.replace(cfg, block_impl="fused_infer")

    outs = {}
    for name, c in (("auto", cfg), ("fused", fused_cfg)):
        t0 = time.time()
        f = jax.jit(lambda p, x, c=c: vit_apply(p, c, x, dtype=jnp.bfloat16)[0])
        y = f(params, imgs)
        s = float(jnp.sum(y.astype(jnp.float32)))
        print(f"vit {name}: compile+run {time.time()-t0:.1f}s sum={s:.3f}",
              flush=True)
        outs[name] = y.astype(jnp.float32)
        if do_time:
            def chain(acc, n=30):
                for _ in range(n):
                    acc = acc + jnp.sum(f(params, imgs).astype(jnp.float32))
                return acc
            float(chain(jnp.float32(0.0)))  # warm
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                float(chain(jnp.float32(0.0)))
                dt = (time.perf_counter() - t0) / 30
                best = dt if best is None else min(best, dt)
            print(f"vit {name}: {best*1e3:.2f} ms/batch-{B} fwd "
                  f"({B/best:.0f} img/s)", flush=True)
    d = float(jnp.max(jnp.abs(outs["fused"] - outs["auto"])))
    m = float(jnp.max(jnp.abs(outs["auto"])))
    print(f"ViT max abs diff: {d:.6f} (max |ref| {m:.3f})", flush=True)

    # the BERT megakernel is opt-in on TPU (measured slower than the
    # composed post-norm chain — bert.py gate); the A/B must force it on or
    # the 'fused' variant silently re-times the composed path
    os.environ["NEXTGEN_UIA_FUSED_BLOCK_BERT"] = "1"
    bcfg = BertConfig()
    bp = jax.device_put(bert_init(jax.random.fold_in(rng, 3), bcfg))
    ids = jax.random.randint(jax.random.fold_in(rng, 4), (B, 256), 1, 30000)
    ids = ids.at[:, 120:].set(0)
    bfused = dataclasses.replace(bcfg, block_impl="fused_infer")
    bouts = {}
    for name, c in (("auto", bcfg), ("fused", bfused)):
        t0 = time.time()
        g = jax.jit(lambda p, t, c=c: bert_apply(p, c, t, dtype=jnp.bfloat16))
        z = g(bp, ids)
        s = float(jnp.sum(z.astype(jnp.float32)))
        print(f"bert {name}: compile+run {time.time()-t0:.1f}s sum={s:.3f}",
              flush=True)
        bouts[name] = z.astype(jnp.float32)
        if do_time:
            def chain(acc, n=30):
                for _ in range(n):
                    acc = acc + jnp.sum(g(bp, ids).astype(jnp.float32))
                return acc
            float(chain(jnp.float32(0.0)))
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                float(chain(jnp.float32(0.0)))
                dt = (time.perf_counter() - t0) / 30
                best = dt if best is None else min(best, dt)
            print(f"bert {name}: {best*1e3:.2f} ms/batch-{B} fwd", flush=True)
    d = float(jnp.max(jnp.abs(bouts["fused"] - bouts["auto"])))
    print(f"BERT max abs diff: {d:.6f} "
          f"(max |ref| {float(jnp.max(jnp.abs(bouts['auto']))):.3f})",
          flush=True)
    print("SMOKE OK", flush=True)


if __name__ == "__main__":
    main()

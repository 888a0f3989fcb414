"""A/B the eval forward across implementation strategies (TPU, solo run).

The zero-shot eval forward (bf16 MONA-adapted ViT-B/16, batch 64) runs at
~20 ms = ~60 TF/s effective while the same chip does 144 TF/s on large plain
matmuls (bench/smoke_int8.py). This script pins down where the remaining
time actually is by timing the SAME forward under four strategies:

  mega     : shipped default — whole-block megakernel (ops/fused_block.py)
  composed : per-sublayer Pallas chain (fused LN+QKV, attn+o+res, LN+MLP)
  flash    : mlp_impl='xla' — XLA LN/MLP, Pallas flash attention only
  xla      : pure XLA — no Pallas anywhere (einsum attention)

plus a no-MONA ablation of the winner (adapter cost) and a batch-256 row.

Chained windows, one scalar fetch per window (CLAUDE.md methodology).

Usage: python bench/smoke_eval_variants.py
"""

from __future__ import annotations

import dataclasses
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def _time_fwd(f, params, imgs, steps=30):
    y = f(params, imgs)
    float(jnp.sum(y.astype(jnp.float32)))  # compile + warm

    def chain(acc):
        for _ in range(steps):
            acc = acc + jnp.sum(f(params, imgs).astype(jnp.float32))
        return acc

    float(chain(jnp.float32(0.0)))
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        float(chain(jnp.float32(0.0)))
        dt = (time.perf_counter() - t0) / steps
        best = dt if best is None else min(best, dt)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    from nextgen_uia_tpu.adapters.mona import inject_mona
    from nextgen_uia_tpu.models.vit import VIT_B16_TIMM, vit_apply, vit_init
    import nextgen_uia_tpu.models.vit as V
    import nextgen_uia_tpu.nn.attention as A

    rng = jax.random.PRNGKey(0)
    cfg = dataclasses.replace(VIT_B16_TIMM, mona_variant="hybrid")
    params = vit_init(rng, cfg)
    params, _ = inject_mona(jax.random.fold_in(rng, 1), params, dim=cfg.width,
                            variant="hybrid")
    params = jax.device_put(params)
    imgs = jax.random.normal(jax.random.fold_in(rng, 2), (64, 224, 224, 3),
                             jnp.float32)

    mega_cfg = dataclasses.replace(cfg, block_impl="fused_infer")
    xla_cfg = dataclasses.replace(cfg, mlp_impl="xla")

    orig_mha = A.mha

    def run(name, c, *, einsum_attn=False, batch_imgs=None, p=params):
        x = imgs if batch_imgs is None else batch_imgs
        if einsum_attn:
            # vit.py binds mha by value at import time — patch BOTH the
            # source attribute and vit's module-global binding, or the
            # einsum variant silently re-measures flash
            A.mha = functools.partial(orig_mha, impl="einsum")
            V.mha = A.mha
        try:
            f = jax.jit(lambda pp, xx, c=c: vit_apply(pp, c, xx,
                                                      dtype=jnp.bfloat16)[0])
            dt = _time_fwd(f, p, x)
        finally:
            A.mha = orig_mha
            V.mha = orig_mha
        b = x.shape[0]
        print(f"{name:10s}: {dt*1e3:6.2f} ms/batch-{b} ({b/dt:7.0f} img/s)",
              flush=True)
        return dt

    run("mega", mega_cfg)
    run("composed", cfg)
    run("flash", xla_cfg)
    run("xla", xla_cfg, einsum_attn=True)

    # ablations on the megakernel path
    no_mona = vit_init(rng, cfg)  # same tower, no adapter slots
    no_mona = jax.device_put(no_mona)
    run("mega-noMONA", mega_cfg, p=no_mona)

    imgs256 = jax.random.normal(jax.random.fold_in(rng, 3),
                                (256, 224, 224, 3), jnp.float32)
    run("mega-b256", mega_cfg, batch_imgs=imgs256)


if __name__ == "__main__":
    main()

"""Ablate round-2 perf changes: token_pad, prepack_qkv, flash bf16 bwd.

Usage: python bench/ablate_r2.py <token_pad> <prepack 0|1>
Prints ms/step for the flagship Mona train step.
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def main():
    token_pad = int(sys.argv[1])
    prepack = bool(int(sys.argv[2]))

    from nextgen_uia_tpu.core import train as T
    from nextgen_uia_tpu.core.partition import (by_keywords, cast_frozen_bf16,
                                                merge, partition, prepack_qkv)
    from nextgen_uia_tpu.losses import info_nce
    from nextgen_uia_tpu.models import clip as clip_mod
    from __graft_entry__ import _flagship

    cfg, params = _flagship(depth=12)
    cfg = dataclasses.replace(
        cfg, vision=dataclasses.replace(cfg.vision, token_pad=token_pad))
    trainable, frozen = partition(params, by_keywords("mona"))
    frozen = cast_frozen_bf16(frozen)
    if prepack:
        frozen = prepack_qkv(frozen)

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
    rng = jax.random.key(0)
    for _ in range(3):
        rng, k = jax.random.split(rng)
        state, m = step(state, frozen, batch, k)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(30):
        rng, k = jax.random.split(rng)
        state, m = step(state, frozen, batch, k)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / 30
    print(f"token_pad={token_pad} prepack={prepack}: {dt*1e3:.2f} ms/step "
          f"({64/dt:.0f} img/s)")


if __name__ == "__main__":
    main()

"""A/B attention configs on the flagship step: flash G sizes vs einsum."""
import dataclasses, os, sys, time
import jax, jax.numpy as jnp
sys.path.insert(0, ".")

def run(tag):
    from nextgen_uia_tpu.core import train as T
    from nextgen_uia_tpu.core.partition import by_keywords, cast_frozen_bf16, merge, partition
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
    batch = {"image": jax.random.uniform(jax.random.key(1), (1, 64, 224, 224, 3), jnp.float32),
             "tokens": jax.random.randint(jax.random.key(2), (1, 64, 256), 1, 30000)}
    rng = jax.random.key(0)
    for _ in range(3):
        rng, k = jax.random.split(rng); state, m = step(state, frozen, batch, k)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(30):
        rng, k = jax.random.split(rng); state, m = step(state, frozen, batch, k)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / 30
    print(f"{tag}: {dt*1e3:.2f} ms/step ({64/dt:.0f} img/s)", flush=True)

run(f"G={os.environ.get('NEXTGEN_UIA_FLASH_G','4')}")

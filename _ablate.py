import time, sys, jax, jax.numpy as jnp
from nextgen_uia_tpu.core import train as T
from nextgen_uia_tpu.core.partition import by_keywords, merge, partition
from nextgen_uia_tpu.losses import info_nce
from nextgen_uia_tpu.models import clip as clip_mod
from __graft_entry__ import _flagship

mode = sys.argv[1]
cfg, params = _flagship(depth=12, mona_layers=(1 if mode == "mona1" else None))
trainable, frozen = partition(params, by_keywords("mona"))
tcfg = T.TrainConfig(lr=1e-4, accum_steps=1, total_updates=1000)
opt, _ = T.make_optimizer(tcfg)
state = T.init_state(trainable, opt)

def loss_fn(tp, fp, batch, rng):
    p = merge(tp, fp)
    if mode == "text_only":
        t = clip_mod.encode_text(p, cfg, batch["tokens"])
        i = t  # contrast text with itself; image tower unused -> DCE'd
    elif mode == "no_text":
        i, _ = clip_mod.encode_image(p, cfg, batch["image"], rng=rng)
        t = jax.lax.stop_gradient(i)
    else:
        i, _ = clip_mod.encode_image(p, cfg, batch["image"], rng=rng)
        t = clip_mod.encode_text(p, cfg, batch["tokens"])
    return info_nce(i, t)

if mode == "fwd_only":
    @jax.jit
    def step(state, frozen, batch, rng):
        p = merge(state["params"], frozen)
        i, _ = clip_mod.encode_image(p, cfg, batch["image"])
        t = clip_mod.encode_text(p, cfg, batch["tokens"])
        loss = info_nce(i, t)
        return state, {"loss": loss}
else:
    step = T.make_train_step(loss_fn, opt, tcfg, donate=False)

B = 64
batch = {"image": jax.random.uniform(jax.random.key(1), (1, B, 224, 224, 3), jnp.float32),
         "tokens": jax.random.randint(jax.random.key(2), (1, B, 256), 1, 30000)}
if mode == "fwd_only":
    batch = {k: v[0] for k, v in batch.items()}
rng = jax.random.key(0)
for _ in range(2):
    rng, k = jax.random.split(rng)
    state, m = step(state, frozen, batch, k)
float(m["loss"])
N = 30
t0 = time.perf_counter()
for _ in range(N):
    rng, k = jax.random.split(rng)
    state, m = step(state, frozen, batch, k)
float(m["loss"])
dt = time.perf_counter() - t0
print(f"{mode}: {dt/N*1e3:.1f} ms/step", flush=True)

import time, sys, dataclasses, jax, jax.numpy as jnp
from nextgen_uia_tpu.core import train as T
from nextgen_uia_tpu.core.partition import by_keywords, merge, partition, cast_frozen_bf16
from nextgen_uia_tpu.losses import info_nce
from nextgen_uia_tpu.models import clip as clip_mod
from nextgen_uia_tpu.adapters.mona import inject_mona

remat = sys.argv[1] == "remat"
cfg = clip_mod.clip_config("biomedclip", compute_dtype="bfloat16", mona_variant="hybrid")
cfg = dataclasses.replace(cfg, vision=dataclasses.replace(cfg.vision, remat=remat))
params = clip_mod.clip_init(jax.random.key(0), cfg)
params["visual"], _ = inject_mona(jax.random.key(1), params["visual"], dim=768, variant="hybrid")
trainable, frozen = partition(params, by_keywords("mona"))
frozen = cast_frozen_bf16(frozen)
tcfg = T.TrainConfig(lr=1e-4, accum_steps=1, total_updates=1000)
opt, _ = T.make_optimizer(tcfg)
state = T.init_state(trainable, opt)
def loss_fn(tp, fp, batch, rng):
    p = merge(tp, fp)
    i, _ = clip_mod.encode_image(p, cfg, batch["image"], rng=rng)
    t = clip_mod.encode_text(p, cfg, batch["tokens"])
    return info_nce(i, t)
step = T.make_train_step(loss_fn, opt, tcfg, donate=True)
B = 64
batch = {"image": jax.random.uniform(jax.random.key(1), (1, B, 224, 224, 3), jnp.float32),
         "tokens": jax.random.randint(jax.random.key(2), (1, B, 256), 1, 30000)}
rng = jax.random.key(0)
for _ in range(3):
    rng, k = jax.random.split(rng)
    state, m = step(state, frozen, batch, k)
float(m["loss"])
N = 30
t0 = time.perf_counter()
for _ in range(N):
    rng, k = jax.random.split(rng)
    state, m = step(state, frozen, batch, k)
final = float(m["loss"])
dt = time.perf_counter() - t0
print(f"remat={remat}: {dt/N*1e3:.1f} ms/step -> {B*N/dt:.0f} img/s (loss={final:.3f})")

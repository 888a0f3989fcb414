import jax, jax.numpy as jnp
from nextgen_uia_tpu.core import train as T
from nextgen_uia_tpu.core.partition import by_keywords, merge, partition, cast_frozen_bf16
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
    i, _ = clip_mod.encode_image(p, cfg, batch["image"], rng=rng)
    t = clip_mod.encode_text(p, cfg, batch["tokens"])
    return info_nce(i, t)
step = T.make_train_step(loss_fn, opt, tcfg, donate=False)
B = 64
batch = {"image": jax.random.uniform(jax.random.key(1), (1, B, 224, 224, 3), jnp.float32),
         "tokens": jax.random.randint(jax.random.key(2), (1, B, 256), 1, 30000)}
rng = jax.random.key(0)
for _ in range(3):
    rng, k = jax.random.split(rng)
    s2, m = step(state, frozen, batch, k)
float(m["loss"])
jax.profiler.start_trace("/tmp/step_trace")
for _ in range(3):
    rng, k = jax.random.split(rng)
    s2, m = step(state, frozen, batch, k)
float(m["loss"])
jax.profiler.stop_trace()
print("traced")

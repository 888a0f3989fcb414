import time, sys, jax, jax.numpy as jnp
import nextgen_uia_tpu.nn.attention as ATT
from nextgen_uia_tpu.core import train as T
from nextgen_uia_tpu.core.partition import by_keywords, merge, partition
from nextgen_uia_tpu.losses import info_nce
from nextgen_uia_tpu.models import clip as clip_mod
from __graft_entry__ import _flagship

impl = sys.argv[1]
# monkeypatch default impl for the A/B
orig = ATT.mha
def mha_forced(*a, **kw):
    kw["impl"] = impl
    return orig(*a, **kw)
ATT.mha = mha_forced
import nextgen_uia_tpu.models.vit as V, nextgen_uia_tpu.models.bert as Bm, nextgen_uia_tpu.models.text_clip as Tm
V.mha = mha_forced; Bm.mha = mha_forced

cfg, params = _flagship(depth=12)
trainable, frozen = partition(params, by_keywords("mona"))
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
print("warm loss:", float(m["loss"]), flush=True)
N = 30
t0 = time.perf_counter()
for _ in range(N):
    rng, k = jax.random.split(rng)
    state, m = step(state, frozen, batch, k)
final = float(m["loss"])
dt = time.perf_counter() - t0
print(f"{impl}: {dt/N*1e3:.1f} ms/step -> {B*N/dt:.0f} img/s (loss={final:.3f})")

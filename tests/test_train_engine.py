"""Train-step engine, checkpointing, and multi-device sharding tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nextgen_uia_tpu.core import checkpoint as ckpt
from nextgen_uia_tpu.core import train as T
from nextgen_uia_tpu.core.mesh import (batch_sharding, make_mesh, param_spec,
                                       shard_params)
from nextgen_uia_tpu.core.partition import by_keywords, merge, partition


def _toy_loss(params, frozen, batch, rng):
    pred = batch["x"] @ params["w"] + frozen["b"]
    return jnp.mean((pred - batch["y"]) ** 2)


def test_train_step_converges():
    cfg = T.TrainConfig(lr=0.1, accum_steps=2, total_updates=100, grad_clip=1.0)
    opt, _ = T.make_optimizer(cfg)
    params = {"w": jnp.zeros((4, 1))}
    frozen = {"b": jnp.zeros((1,))}
    state = T.init_state(params, opt)
    step = T.make_train_step(_toy_loss, opt, cfg, donate=False)

    true_w = jnp.array([[1.0], [-2.0], [0.5], [3.0]])
    k = jax.random.key(0)
    losses = []
    for i in range(60):
        k, k1, k2 = jax.random.split(k, 3)
        x = jax.random.normal(k1, (8, 4))
        y = x @ true_w
        batch = T.stack_microbatches({"x": x, "y": y}, cfg.accum_steps)
        state, m = step(state, frozen, batch, k2)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.05
    assert int(state["step"]) == 60


def test_train_step_skips_nonfinite():
    cfg = T.TrainConfig(lr=0.1, accum_steps=2, total_updates=10)
    opt, _ = T.make_optimizer(cfg)
    params = {"w": jnp.ones((2, 1))}
    state = T.init_state(params, opt)
    step = T.make_train_step(_toy_loss, opt, cfg, donate=False)
    x = jnp.ones((4, 2))
    y = jnp.full((4, 1), jnp.nan)  # all-nan loss -> both microbatches skipped
    batch = T.stack_microbatches({"x": x, "y": y}, 2)
    state2, m = step(state, {"b": jnp.zeros(1)}, batch, jax.random.key(0))
    assert int(m["skipped"]) == 2
    np.testing.assert_allclose(np.asarray(state2["params"]["w"]),
                               np.asarray(params["w"]))  # params unchanged
    # optimizer state must not advance either (reference skip-the-step):
    # Adam moments stay zero and the schedule step count stays put
    for old, new in zip(jax.tree_util.tree_leaves(state["opt"]),
                        jax.tree_util.tree_leaves(state2["opt"])):
        np.testing.assert_allclose(np.asarray(new), np.asarray(old))

    # a subsequent good batch must still train normally
    yg = jnp.ones((4, 1))
    good = T.stack_microbatches({"x": x, "y": yg}, 2)
    state3, m3 = step(state2, {"b": jnp.zeros(1)}, good, jax.random.key(1))
    assert int(m3["skipped"]) == 0
    assert not np.allclose(np.asarray(state3["params"]["w"]),
                           np.asarray(params["w"]))


def test_early_stopper():
    es = T.EarlyStopper(patience=2, mode="min")
    assert es.update(1.0, 0) and not es.should_stop
    assert not es.update(1.5, 1)
    assert not es.update(1.4, 2) and es.should_stop
    assert es.best == 1.0 and es.best_step == 0


def test_checkpoint_roundtrip_and_filter(tmp_path):
    params = {"visual": {"blocks": [{"mona": {"w": jnp.ones((2, 2))},
                                     "attn": {"q": {"w": jnp.zeros((2, 2))}}}]}}
    p = str(tmp_path / "best.npz")
    n = ckpt.save(p, params, keyword_filter=["mona"])
    assert n == 1
    target = jax.tree_util.tree_map(lambda x: x * 0 + 5.0, params)
    loaded, count = ckpt.load_into(p, target)
    assert count == 1
    np.testing.assert_allclose(np.asarray(loaded["visual"]["blocks"][0]["mona"]["w"]), 1.0)
    np.testing.assert_allclose(np.asarray(loaded["visual"]["blocks"][0]["attn"]["q"]["w"]), 5.0)


def test_mesh_sharded_data_parallel_step():
    """Full DP train step over an 8-device CPU mesh: batch sharded on 'data',
    params replicated; loss/grads must match the single-device result."""
    mesh = make_mesh(n_data=8, n_model=1)
    cfg = T.TrainConfig(lr=0.1, accum_steps=1, total_updates=10)
    opt, _ = T.make_optimizer(cfg)
    params = {"w": jnp.zeros((4, 1))}
    frozen = {"b": jnp.zeros((1,))}

    x = jax.random.normal(jax.random.key(1), (16, 4))
    y = x @ jnp.array([[1.0], [2.0], [3.0], [4.0]])

    state = T.init_state(params, opt)
    step = T.make_train_step(_toy_loss, opt, cfg, donate=False)
    batch = T.stack_microbatches({"x": x, "y": y}, 1)
    ref_state, ref_m = step(state, frozen, batch, jax.random.key(0))

    bs = batch_sharding(mesh)
    sharded_batch = {k: jax.device_put(v, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "data")))
                     for k, v in batch.items()}
    state2 = T.init_state(params, opt)
    dp_state, dp_m = step(state2, frozen, sharded_batch, jax.random.key(0))
    np.testing.assert_allclose(float(dp_m["loss"]), float(ref_m["loss"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dp_state["params"]["w"]),
                               np.asarray(ref_state["params"]["w"]), rtol=1e-5)


def test_sharded_train_step_matches_plain():
    """shard_map DP step (the Pallas-safe multi-chip path) == plain jit step."""
    mesh = make_mesh(8, 1)
    cfg = T.TrainConfig(lr=0.1, accum_steps=2, total_updates=10)
    opt, _ = T.make_optimizer(cfg)
    params = {"w": jnp.zeros((4, 1))}
    x = jax.random.normal(jax.random.key(0), (2, 16, 4))
    y = x @ jnp.array([[1.0], [2.0], [3.0], [4.0]])
    batch = {"x": x, "y": y}

    def loss_fn(p, f, b, r):
        return jnp.mean((b["x"] @ p["w"] - b["y"]) ** 2)

    plain = T.make_train_step(loss_fn, opt, cfg, donate=False)
    s1, m1 = plain(T.init_state(params, opt), {}, batch, jax.random.key(1))

    sharded = T.make_sharded_train_step(loss_fn, opt, cfg, mesh, donate=False)
    sb = {k: jax.device_put(v, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "data"))) for k, v in batch.items()}
    s2, m2 = sharded(T.init_state(params, opt), {}, sb, jax.random.key(1))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s1["params"]["w"]),
                               np.asarray(s2["params"]["w"]), rtol=1e-5)


def test_param_spec_policy():
    assert param_spec("visual/blocks/0/mlp/fc1/w", (768, 3072), model_axis_size=2) == \
        jax.sharding.PartitionSpec(None, "model")
    assert param_spec("visual/blocks/0/mona/down/w", (768, 64), model_axis_size=2) == \
        jax.sharding.PartitionSpec()
    assert param_spec("visual/norm/scale", (768,), model_axis_size=2) == \
        jax.sharding.PartitionSpec()
    # odd trailing dim falls back to leading-dim sharding
    assert param_spec("text/token_embedding/w", (49408, 512), model_axis_size=2) == \
        jax.sharding.PartitionSpec(None, "model")


def test_model_sharded_vit_forward():
    """ViT forward with frozen weights sharded over a ('data','model') mesh."""
    from nextgen_uia_tpu.models.vit import ViTConfig, vit_apply, vit_init

    mesh = make_mesh(n_data=4, n_model=2)
    cfg = ViTConfig(image_size=32, patch_size=16, width=64, depth=2, heads=4, proj_dim=32)
    params = vit_init(jax.random.key(0), cfg)
    ref, _ = vit_apply(params, cfg, jnp.ones((8, 32, 32, 3)))

    sharded = shard_params(params, mesh)
    x = jax.device_put(jnp.ones((8, 32, 32, 3)), batch_sharding(mesh))
    out, _ = jax.jit(lambda p, x: vit_apply(p, cfg, x))(sharded, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_global_negatives_dp_matches_plain():
    """DP with all_gathered (global) InfoNCE negatives == plain step on the
    full batch: loss, grads, and updated params must match. Exercises the
    scale_gradient compensation for the engine's grad pmean."""
    from nextgen_uia_tpu.losses import info_nce

    mesh = make_mesh(8, 1)
    cfg = T.TrainConfig(lr=0.1, accum_steps=2, total_updates=10)
    opt, _ = T.make_optimizer(cfg)
    ks = jax.random.split(jax.random.key(3), 4)
    params = {"wi": 0.1 * jax.random.normal(ks[0], (4, 8)),
              "wt": 0.1 * jax.random.normal(ks[1], (4, 8))}
    batch = {"a": jax.random.normal(ks[2], (2, 16, 4)),
             "b": jax.random.normal(ks[3], (2, 16, 4))}

    def plain_loss(p, f, b, r):
        return info_nce(b["a"] @ p["wi"], b["b"] @ p["wt"])

    def dp_loss(p, f, b, r):
        fi = T.scale_gradient(b["a"] @ p["wi"], 8.0)
        ft = T.scale_gradient(b["b"] @ p["wt"], 8.0)
        fi = jax.lax.all_gather(fi, "data", axis=0, tiled=True)
        ft = jax.lax.all_gather(ft, "data", axis=0, tiled=True)
        return info_nce(fi, ft)

    plain = T.make_train_step(plain_loss, opt, cfg, donate=False)
    s1, m1 = plain(T.init_state(params, opt), {}, batch, jax.random.key(9))

    step, sh = T.make_step_for_mesh(dp_loss, opt, cfg, mesh, donate=False)
    assert sh is not None
    sb = {k: jax.device_put(v, sh) for k, v in batch.items()}
    s2, m2 = step(T.init_state(params, opt), {}, sb, jax.random.key(9))

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(s2["params"]),
                     jax.tree_util.tree_leaves(s1["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-7)


def test_make_step_for_mesh_plain_on_single_data_axis():
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    cfg = T.TrainConfig(lr=0.1, accum_steps=1, total_updates=10)
    opt, _ = T.make_optimizer(cfg)
    step, sh = T.make_step_for_mesh(_toy_loss, opt, cfg, mesh, donate=False)
    assert sh is None
    x = jax.random.normal(jax.random.key(0), (1, 8, 2))
    batch = {"x": x, "y": jnp.ones((1, 8, 1))}
    params = {"w": jnp.zeros((2, 1))}
    state, m = step(T.init_state(params, opt), {"b": jnp.zeros(1)}, batch,
                    jax.random.key(0))
    assert np.isfinite(float(m["loss"]))


def test_fsdp_frozen_sharded_step_matches_plain():
    """FSDP step (frozen matrices sharded over 'model', batch over BOTH mesh
    axes) == plain step on the full batch: loss and updated params match."""
    mesh = make_mesh(4, 2)
    cfg = T.TrainConfig(lr=0.1, accum_steps=2, total_updates=10)
    opt, _ = T.make_optimizer(cfg)
    ks = jax.random.split(jax.random.key(5), 4)
    params = {"w": jnp.zeros((6, 1))}
    # frozen "tower": one matrix large enough for the 'model' policy plus a
    # small replicated bias (min_size in param_spec is 2^16 elements)
    frozen = {"proj": {"w": 0.05 * jax.random.normal(ks[0], (512, 128))},
              "bias": jnp.zeros((128,))}
    x = jax.random.normal(ks[1], (2, 16, 6))
    y = jax.random.normal(ks[2], (2, 16, 1))
    batch = {"x": x, "y": y}

    def loss_fn(p, f, b, r):
        h = jnp.tanh(b["x"] @ p["w"])                     # [bs, 1]
        feat = h * (f["proj"]["w"].sum() * 1e-3 + 1.0)    # consumes frozen
        return jnp.mean((feat - b["y"]) ** 2) + 1e-6 * f["bias"].sum()

    plain = T.make_train_step(loss_fn, opt, cfg, donate=False)
    s1, m1 = plain(T.init_state(params, opt), frozen, batch, jax.random.key(7))

    frozen_sharded = shard_params(frozen, mesh)
    # the big matrix must actually be sharded over 'model'
    spec = frozen_sharded["proj"]["w"].sharding.spec
    assert any(ax == "model" or (isinstance(ax, tuple) and "model" in ax)
               for ax in spec if ax), f"policy did not shard proj/w: {spec}"

    step, sh = T.make_step_for_mesh(loss_fn, opt, cfg, mesh, donate=False,
                                    frozen_example=frozen_sharded)
    assert sh is not None and sh.spec == jax.sharding.PartitionSpec(
        None, ("data", "model"))
    sb = {k: jax.device_put(v, sh) for k, v in batch.items()}
    s2, m2 = step(T.init_state(params, opt), frozen_sharded, sb, jax.random.key(7))

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s2["params"]["w"]),
                               np.asarray(s1["params"]["w"]), rtol=1e-5, atol=1e-7)


def test_fsdp_leading_dim_gather():
    """P('model', None) frozen leaves (odd trailing dim) gather on axis 0."""
    mesh = make_mesh(4, 2)
    cfg = T.TrainConfig(lr=0.1, accum_steps=1, total_updates=5)
    opt, _ = T.make_optimizer(cfg)
    params = {"w": jnp.zeros((4, 1))}
    # trailing dim 333 not divisible by 2 -> leading-dim sharding
    frozen = {"emb": {"w": 0.01 * jax.random.normal(jax.random.key(0), (512, 333))}}
    assert param_spec("emb/w", (512, 333), model_axis_size=2) == \
        jax.sharding.PartitionSpec("model", None)
    batch = {"x": jax.random.normal(jax.random.key(1), (1, 16, 4)),
             "y": jnp.ones((1, 16, 1))}

    def loss_fn(p, f, b, r):
        s = f["emb"]["w"].mean()  # touches every shard
        return jnp.mean((b["x"] @ p["w"] + s * 1e-3 - b["y"]) ** 2)

    plain = T.make_train_step(loss_fn, opt, cfg, donate=False)
    s1, m1 = plain(T.init_state(params, opt), frozen, batch, jax.random.key(2))

    fs = shard_params(frozen, mesh)
    step, sh = T.make_step_for_mesh(loss_fn, opt, cfg, mesh, donate=False,
                                    frozen_example=fs)
    sb = {k: jax.device_put(v, sh) for k, v in batch.items()}
    s2, m2 = step(T.init_state(params, opt), fs, sb, jax.random.key(2))
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s2["params"]["w"]),
                               np.asarray(s1["params"]["w"]), rtol=1e-5, atol=1e-7)


def test_pad_eval_batch():
    b = {"image": np.arange(10, dtype=np.uint8).reshape(5, 2),
         "label": np.arange(5), "name": ["a", "b", "c", "d", "e"]}
    padded, n = T.pad_eval_batch(b, 8)
    assert n == 5
    assert padded["image"].shape == (8, 2) and padded["label"].shape == (8,)
    np.testing.assert_array_equal(padded["image"][5:], np.tile(b["image"][-1:], (3, 1)))
    assert padded["name"] == b["name"]  # non-arrays pass through
    same, n2 = T.pad_eval_batch(b, 5)
    assert n2 == 5 and same["image"].shape == (5, 2)
    same1, _ = T.pad_eval_batch(b, 1)
    assert same1["image"].shape == (5, 2)


def test_sharded_apply_matches_plain():
    """DP eval apply over an 8-device mesh == plain forward; ragged batches
    pad to the DP width and slice back exactly (VERDICT r2 Weak #5)."""
    mesh = make_mesh(8, 1)
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    tp = {"w": jax.random.normal(k1, (6, 4))}
    fz = {"b": jax.random.normal(k2, (4,))}

    def fwd(p, f, batch):
        return jnp.tanh(batch["x"] @ p["w"] + f["b"])

    apply, sharding, dp = T.make_sharded_apply(fwd, mesh)
    assert dp == 8 and sharding is not None
    x = np.asarray(jax.random.normal(k3, (13, 6)), np.float32)  # ragged: 13 % 8 != 0
    batch, n_real = T.pad_eval_batch({"x": x}, dp)
    out = np.asarray(apply(tp, fz, batch))[:n_real]
    ref = np.asarray(fwd(tp, fz, {"x": jnp.asarray(x)}))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_sharded_apply_fsdp_consumes_sharded_frozen():
    """Eval apply on a (4,2) mesh consumes the FSDP 'model'-sharded frozen
    tree directly (all-gather at use) — no unsharded eval copy needed."""
    from nextgen_uia_tpu.core.mesh import param_pspecs

    mesh = make_mesh(4, 2)
    ks = jax.random.split(jax.random.key(1), 3)
    tp = {"w": jax.random.normal(ks[0], (8, 4))}
    frozen = {"proj": {"w": 0.05 * jax.random.normal(ks[1], (512, 128))},
              "bias": jnp.zeros((128,))}
    frozen_sharded = shard_params(frozen, mesh)
    specs = param_pspecs(frozen_sharded, mesh)

    def fwd(p, f, batch):
        h = jnp.tanh(batch["x"] @ p["w"])  # [bs, 4]
        scale = f["proj"]["w"].sum() * 1e-3 + 1.0 + f["bias"].sum()
        return h * scale

    apply, sharding, dp = T.make_sharded_apply(fwd, mesh, frozen_specs=specs)
    assert dp == 8
    x = np.asarray(jax.random.normal(ks[2], (16, 8)), np.float32)
    out = np.asarray(apply(tp, frozen_sharded, {"x": x}))
    ref = np.asarray(fwd(tp, frozen, {"x": jnp.asarray(x)}))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_sharded_apply_single_device_passthrough():
    mesh = make_mesh(1, 1)

    def fwd(p, f, batch):
        return batch["x"] * p["s"]

    apply, sharding, dp = T.make_sharded_apply(fwd, mesh)
    assert dp == 1 and sharding is None
    out = apply({"s": jnp.float32(2.0)}, {}, {"x": jnp.ones((3,))})
    np.testing.assert_allclose(np.asarray(out), 2.0 * np.ones(3))


def test_cosine_lr_value_matches_optax_schedule():
    """Host-side lr logging helper must equal make_optimizer's actual
    schedule at every non-negative update count (clamped at 0 below)."""
    cfg = T.TrainConfig(lr=1e-4, lr_min=1e-8, total_updates=37)
    _, sched = T.make_optimizer(cfg)
    for k in [0, 1, 5, 18, 36, 37, 40]:
        # optax evaluates in f32; the host helper in f64
        assert abs(float(sched(k)) - T.cosine_lr_value(cfg, k)) < 1e-6 * cfg.lr
    assert T.cosine_lr_value(cfg, -1) == cfg.lr  # "before any update" = init

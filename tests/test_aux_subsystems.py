"""Auxiliary subsystems: recon metrics, train-state resume, profiling utils."""

import jax
import jax.numpy as jnp
import numpy as np

from nextgen_uia_tpu.core import checkpoint as ckpt
from nextgen_uia_tpu.core import train as T
from nextgen_uia_tpu.core.profiling import StepTimer, force_completion, trace
from nextgen_uia_tpu.metrics.reconstruction import ReconAccumulator, psnr, ssim


def test_psnr_ssim_semantics():
    x = np.random.default_rng(0).uniform(size=(2, 1, 32, 32))
    np.testing.assert_allclose(ssim(x, x), [1.0, 1.0], atol=1e-9)
    assert np.isinf(psnr(x, x)).all()
    noisy = np.clip(x + 0.1, 0, 1)
    assert (ssim(x, noisy) < 1.0).all()
    p = psnr(x, noisy)
    assert (p > 10).all() and (p < 30).all()
    acc = ReconAccumulator()
    acc.update(noisy, x)
    stats = acc.compute()
    assert 0 < stats["ssim_mean"] < 1


def test_train_state_resume_roundtrip(tmp_path):
    cfg = T.TrainConfig(lr=0.1, accum_steps=1, total_updates=10)
    opt, _ = T.make_optimizer(cfg)
    params = {"w": jnp.ones((3, 2))}
    state = T.init_state(params, opt)
    step = T.make_train_step(
        lambda p, f, b, r: jnp.sum((b["x"] @ p["w"]) ** 2), opt, cfg, donate=False)
    batch = T.stack_microbatches({"x": jnp.ones((4, 3))}, 1)
    state, _ = step(state, {}, batch, jax.random.key(0))
    state, _ = step(state, {}, batch, jax.random.key(1))

    path = str(tmp_path / "last_state.npz")
    n = ckpt.save_train_state(path, state, extra={"epoch": 2, "best": 0.5})
    assert n > 0

    fresh = T.init_state(params, opt)
    restored, meta = ckpt.load_train_state(path, fresh)
    assert meta["epoch"] == 2 and meta["best"] == 0.5
    assert int(restored["step"]) == 2
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # resumed training continues identically
    s1, m1 = step(state, {}, batch, jax.random.key(2))
    s2, m2 = step(restored, {}, batch, jax.random.key(2))
    np.testing.assert_allclose(np.asarray(s1["params"]["w"]),
                               np.asarray(s2["params"]["w"]))


def test_profiling_utils(tmp_path):
    t = StepTimer(warmup=1)
    x = jnp.ones((4,))
    for _ in range(3):
        t.start()
        y = x * 2
        t.stop(y)
    assert len(t.times) == 2 and t.mean_ms >= 0
    assert force_completion({"a": jnp.ones((2, 2)) * 3.0}) == 3.0
    with trace(None):
        pass  # no-op path


def test_load_into_distinguishes_nomatch_from_shape_mismatch(tmp_path):
    """Dual-root fallbacks catch ckpt.NoMatch; a genuine shape mismatch must
    NOT be swallowed by them (it would mask a wrong-config error, e.g. a
    reduce_dim mismatch, behind a misleading 'nothing matched' retry)."""
    import numpy as np
    import pytest

    path = str(tmp_path / "c.npz")
    ckpt.save(path, {"a": {"w": np.zeros((2, 3), np.float32)}})
    # zero intersection -> NoMatch (a ValueError subclass, so old callers
    # that catch ValueError keep working)
    with pytest.raises(ckpt.NoMatch):
        ckpt.load_into(path, {"b": {"w": np.zeros((2, 3), np.float32)}})
    # name matches but the shape differs -> plain ValueError, not NoMatch
    with pytest.raises(ValueError) as ei:
        ckpt.load_into(path, {"a": {"w": np.zeros((9, 9), np.float32)}})
    assert not isinstance(ei.value, ckpt.NoMatch)
    # skip= leaves the listed prefixes at template values
    tmpl = {"a": {"w": np.ones((9, 9), np.float32)},
            "c": np.zeros((1,), np.float32)}
    ckpt.save(path, {"a": {"w": np.zeros((2, 3), np.float32)},
                     "c": np.ones((1,), np.float32)})
    out, n = ckpt.load_into(path, tmpl, skip=("a/",))
    assert n == 1 and out["a"]["w"].shape == (9, 9) and float(out["c"][0]) == 1.0

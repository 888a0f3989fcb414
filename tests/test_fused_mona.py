"""Fused whole-adapter MONA kernel vs the composed path (fwd, dx, all param
grads), all four variants, with and without dropout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextgen_uia_tpu.adapters.mona import mona_apply, mona_init
from nextgen_uia_tpu.ops.fused_mona import mona_block_fused

B, H, W, D, N = 2, 4, 4, 128, 4 * 4 + 1 + 7  # CLS + 16 spatial + 7 pad tail


def _setup(variant):
    p = mona_init(jax.random.key(0), D, bottleneck=64, variant=variant)
    # perturb the defaults so scale/bias swaps can't hide
    ks = jax.random.split(jax.random.key(1), 4)
    p["gamma"] = p["gamma"] + jax.random.normal(ks[0], (D,)) * 0.3
    p["norm"]["scale"] = p["norm"]["scale"] + jax.random.normal(ks[1], (D,)) * 0.1
    if "freq_filter" in p:
        p["freq_filter"] = p["freq_filter"] + jax.random.normal(ks[2], (64,)) * 0.2
    x = jax.random.normal(ks[3], (B, N, D)) * 0.6
    return p, x


def _mask(rng, rate=0.1):
    keep = jax.random.bernoulli(rng, 1.0 - rate, (B, N, 64))
    return keep.astype(jnp.float32) / (1.0 - rate)


@pytest.mark.parametrize("variant", ["baseline", "noise_aware",
                                     "freq_enhanced", "hybrid"])
def test_fused_mona_forward(variant):
    p, x = _setup(variant)
    ref = mona_apply(p, x, (H, W), variant=variant)  # CPU -> composed path
    out = mona_block_fused(p, x, (H, W), variant=variant)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("variant", ["hybrid", "baseline"])
def test_fused_mona_grads(variant):
    p, x = _setup(variant)

    def loss_ref(p, x):
        return jnp.sum(mona_apply(p, x, (H, W), variant=variant) ** 2)

    def loss_fused(p, x):
        return jnp.sum(mona_block_fused(p, x, (H, W), variant=variant) ** 2)

    (gp_r, gx_r) = jax.grad(loss_ref, argnums=(0, 1))(p, x)
    (gp_f, gx_f) = jax.grad(loss_fused, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=2e-4, rtol=2e-4, err_msg="dx")
    flat_r = jax.tree_util.tree_leaves_with_path(gp_r)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gp_f))
    for path, ref_leaf in flat_r:
        got = flat_f[path]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref_leaf), atol=2e-3, rtol=2e-3,
            err_msg=jax.tree_util.keystr(path))


def test_fused_mona_dropout_stream_matches():
    """Same rng key => fused mask equals the composed path's dropout draw."""
    p, x = _setup("hybrid")
    rng = jax.random.key(42)
    ref = mona_apply(p, x, (H, W), variant="hybrid", rng=rng)
    out = mona_block_fused(p, x, (H, W), variant="hybrid", mask=_mask(rng))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_fused_mona_ineligible_returns_none():
    p, x = _setup("hybrid")
    assert mona_block_fused(p, x[:, :10], (H, W), variant="hybrid") is None


def test_variant_params_mismatch_falls_back():
    """Inconsistent (params, variant) pairs must decline, not crash: the
    backward's cotangent tree has to match p exactly."""
    p, x = _setup("hybrid")  # hybrid params carry freq_filter + noise_est
    assert mona_block_fused(p, x, (H, W), variant="baseline") is None
    p2, _ = _setup("baseline")
    assert mona_block_fused(p2, x, (H, W), variant="hybrid") is None

"""Pallas per-sample depthwise conv vs the XLA batch-in-channels reference
(interpret mode on CPU), values and gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from nextgen_uia_tpu.adapters.mona import _dwconv7_per_sample
from nextgen_uia_tpu.ops.dwconv import dwconv7_per_sample


def _ref(x, k5):
    # the XLA formulation (batch folded into channels)
    return _dwconv7_per_sample(x, k5)


def test_dwconv_forward_matches_xla():
    b, h, w, c = 3, 14, 14, 64
    ks = jax.random.split(jax.random.key(0), 2)
    x = jax.random.normal(ks[0], (b, h, w, c), jnp.float32)
    k = jax.random.normal(ks[1], (b, 7, 7, c), jnp.float32) * 0.2
    ref = _ref(x, k[:, :, :, None, :])
    out = dwconv7_per_sample(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_dwconv_odd_spatial():
    b, h, w, c = 2, 9, 11, 32
    ks = jax.random.split(jax.random.key(1), 2)
    x = jax.random.normal(ks[0], (b, h, w, c), jnp.float32)
    k = jax.random.normal(ks[1], (b, 7, 7, c), jnp.float32) * 0.2
    ref = _ref(x, k[:, :, :, None, :])
    out = dwconv7_per_sample(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_dwconv_tiny_spatial_padded_path():
    """HW=4 (debug_tiny towers: 64px/16 -> 4x4 grid) takes the zero-pad-to-8
    path that works around the Mosaic lowering abort; values and grads must
    stay EXACT vs the XLA formulation (zero padding reproduces the SAME-conv
    boundary; extra positions contribute g=0 to every reduction)."""
    from nextgen_uia_tpu.ops.dwconv import mona_spatial

    b, h, w, c = 4, 4, 4, 64
    ks = jax.random.split(jax.random.key(7), 4)
    x = jax.random.normal(ks[0], (b, h, w, c), jnp.float32)
    k = jax.random.normal(ks[1], (b, 7, 7, c), jnp.float32) * 0.2
    ref = _ref(x, k[:, :, :, None, :])
    out = dwconv7_per_sample(x, k)
    assert out.shape == (b, h, w, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    gr = jax.grad(lambda x, k: jnp.sum(_ref(x, k[:, :, :, None, :]) ** 2),
                  argnums=(0, 1))(x, k)
    gp = jax.grad(lambda x, k: jnp.sum(dwconv7_per_sample(x, k) ** 2),
                  argnums=(0, 1))(x, k)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)

    # fused mona_spatial at the same tiny shape: composed reference
    freq = jax.random.normal(ks[2], (c,), jnp.float32)
    bias = jax.random.normal(ks[3], (b, c), jnp.float32) * 0.1
    want = _ref(x * freq[None, None, None, :],
                k[:, :, :, None, :]) + bias[:, None, None, :] + x
    got = mona_spatial(x, freq, k, bias)
    assert got.shape == (b, h, w, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    grm = jax.grad(lambda s, f, kk, bb: jnp.sum(
        mona_spatial(s, f, kk, bb) ** 2), argnums=(0, 1, 2, 3))(x, freq, k, bias)
    grr = jax.grad(lambda s, f, kk, bb: jnp.sum(
        (_ref(s * f[None, None, None, :], kk[:, :, :, None, :])
         + bb[:, None, None, :] + s) ** 2), argnums=(0, 1, 2, 3))(x, freq, k, bias)
    for a, b_ in zip(grm, grr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_dwconv_gradients_match_xla():
    b, h, w, c = 2, 14, 14, 16
    ks = jax.random.split(jax.random.key(2), 2)
    x = jax.random.normal(ks[0], (b, h, w, c), jnp.float32)
    k = jax.random.normal(ks[1], (b, 7, 7, c), jnp.float32) * 0.2

    def loss_ref(x, k):
        return jnp.sum(_ref(x, k[:, :, :, None, :]) ** 2)

    def loss_pl(x, k):
        return jnp.sum(dwconv7_per_sample(x, k) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    gp = jax.grad(loss_pl, argnums=(0, 1))(x, k)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_mona_spatial_matches_composed():
    """Fused mona_spatial == freq-scale -> dwconv -> +bias -> +identity
    composed from jnp ops, values and all four gradients."""
    from nextgen_uia_tpu.ops.dwconv import mona_spatial

    b, h, w, c = 2, 14, 14, 64
    ks = jax.random.split(jax.random.key(5), 4)
    s = jax.random.normal(ks[0], (b, h, w, c), jnp.float32)
    freq = 1.0 + 0.1 * jax.random.normal(ks[1], (c,), jnp.float32)
    k = jax.random.normal(ks[2], (b, 7, 7, c), jnp.float32) * 0.2
    bias = jax.random.normal(ks[3], (b, c), jnp.float32) * 0.1

    def composed(s, freq, k, bias):
        f = s * freq[None, None, None, :]
        y = _ref(f, k[:, :, :, None, :])
        return y + bias[:, None, None, :] + s

    ref = composed(s, freq, k, bias)
    out = mona_spatial(s, freq, k, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    gr = jax.grad(lambda *a: jnp.sum(composed(*a) ** 2), argnums=(0, 1, 2, 3))(
        s, freq, k, bias)
    gp = jax.grad(lambda *a: jnp.sum(mona_spatial(*a) ** 2), argnums=(0, 1, 2, 3))(
        s, freq, k, bias)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=2e-4)


def test_mona_spatial_shared_kernel_grads():
    """Broadcast shared kernels: autodiff must sum dk over the batch."""
    from nextgen_uia_tpu.ops.dwconv import mona_spatial

    b, h, w, c = 3, 9, 9, 32
    ks = jax.random.split(jax.random.key(6), 3)
    s = jax.random.normal(ks[0], (b, h, w, c), jnp.float32)
    kshared = jax.random.normal(ks[1], (7, 7, c), jnp.float32) * 0.2
    freq = jnp.ones((c,))
    bias = jnp.zeros((b, c))

    def loss_shared(kk):
        kb = jnp.broadcast_to(kk[None], (b, 7, 7, c))
        return jnp.sum(mona_spatial(s, freq, kb, bias) ** 2)

    def loss_ref(kk):
        kb = jnp.broadcast_to(kk[None], (b, 7, 7, c))
        f = s
        y = _ref(f, kb[:, :, :, None, :])
        return jnp.sum((y + s) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(loss_shared)(kshared)),
                               np.asarray(jax.grad(loss_ref)(kshared)),
                               atol=2e-4, rtol=2e-4)

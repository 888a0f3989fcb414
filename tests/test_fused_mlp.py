"""Fused frozen-MLP kernel correctness (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextgen_uia_tpu.ops.fused_mlp import fused_mlp


def ref_mlp(x, w1, b1, w2, b2, act):
    h = x.astype(jnp.float32) @ w1.astype(jnp.float32) + b1
    if act == "gelu":
        h = jax.nn.gelu(h, approximate=False)
    else:
        h = h * jax.nn.sigmoid(1.702 * h)
    return (h @ w2.astype(jnp.float32) + b2).astype(x.dtype)


@pytest.mark.parametrize("act", ["gelu", "quick_gelu"])
@pytest.mark.parametrize("m,d,hidden", [(64, 128, 256), (128, 128, 512)])
def test_fused_forward(act, m, d, hidden):
    ks = jax.random.split(jax.random.key(0), 5)
    x = jax.random.normal(ks[0], (m, d), jnp.float32) * 0.5
    w1 = jax.random.normal(ks[1], (d, hidden), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[2], (hidden,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[3], (hidden, d), jnp.float32) * 0.05
    b2 = jax.random.normal(ks[4], (d,), jnp.float32) * 0.1
    out = fused_mlp(x, w1, b1, w2, b2, act=act)
    ref = ref_mlp(x, w1, b1, w2, b2, act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_backward_dx():
    ks = jax.random.split(jax.random.key(1), 5)
    m, d, hidden = 64, 128, 256
    x = jax.random.normal(ks[0], (m, d), jnp.float32) * 0.5
    w1 = jax.random.normal(ks[1], (d, hidden), jnp.float32) * 0.05
    b1 = jnp.zeros((hidden,))
    w2 = jax.random.normal(ks[3], (hidden, d), jnp.float32) * 0.05
    b2 = jnp.zeros((d,))
    g_f = jax.grad(lambda x: jnp.sum(fused_mlp(x, w1, b1, w2, b2) ** 2))(x)
    g_r = jax.grad(lambda x: jnp.sum(ref_mlp(x, w1, b1, w2, b2, "gelu") ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r), atol=1e-4, rtol=1e-4)


def test_fused_weight_grads_are_structural_zeros():
    """The frozen-weight contract: weight grads come back zero (drivers must
    use mlp_impl='xla' for full fine-tuning)."""
    m, d, hidden = 64, 128, 256
    x = jnp.ones((m, d))
    w1 = jnp.ones((d, hidden)) * 0.01
    g = jax.grad(lambda w: jnp.sum(fused_mlp(x, w, jnp.zeros(hidden),
                                             jnp.ones((hidden, d)) * 0.01,
                                             jnp.zeros(d))))(w1)
    assert float(jnp.abs(g).max()) == 0.0


def test_odd_rows_fall_back():
    """Row counts that don't tile (e.g. 63) silently use the XLA path."""
    x = jnp.ones((7, 9, 128)) * 0.1  # m = 63
    w1 = jnp.ones((128, 256)) * 0.01
    w2 = jnp.ones((256, 128)) * 0.01
    out = fused_mlp(x, w1, jnp.zeros(256), w2, jnp.zeros(128))
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()

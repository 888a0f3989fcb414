"""Fused attention-block kernel vs the einsum mha path (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextgen_uia_tpu.nn.attention import attention_init, mha
from nextgen_uia_tpu.ops.fused_attention import fused_attn_block


@pytest.mark.parametrize("n,causal,with_bias", [
    (25, False, False),
    (16, True, False),
    (40, False, True),
])
def test_fused_block_forward(n, causal, with_bias):
    b, d, heads = 8, 128, 4
    p = attention_init(jax.random.key(0), d)
    x = jax.random.normal(jax.random.key(1), (b, n, d)) * 0.5
    bias = None
    if with_bias:
        keep = jax.random.bernoulli(jax.random.key(2), 0.8, (b, n))
        bias = jnp.where(keep, 0.0, -1e9).astype(jnp.float32)
    ref = mha(p, x, num_heads=heads, impl="einsum", causal=causal,
              key_padding_bias=bias)
    out = fused_attn_block(x, p, heads=heads, bias=bias, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_block_backward_dx():
    b, n, d, heads = 8, 24, 128, 4
    p = attention_init(jax.random.key(3), d)
    x = jax.random.normal(jax.random.key(4), (b, n, d)) * 0.5

    g_ref = jax.grad(lambda x: jnp.sum(
        mha(p, x, num_heads=heads, impl="einsum") ** 2))(x)
    g_fus = jax.grad(lambda x: jnp.sum(
        fused_attn_block(x, p, heads=heads) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_hybrid_block_matches_einsum_fwd_and_bwd():
    from nextgen_uia_tpu.ops.fused_attention import hybrid_attn_block

    b, n, d, heads = 8, 24, 128, 4
    p = attention_init(jax.random.key(5), d)
    x = jax.random.normal(jax.random.key(6), (b, n, d)) * 0.5
    keep = jax.random.bernoulli(jax.random.key(7), 0.8, (b, n))
    bias = jnp.where(keep, 0.0, -1e9).astype(jnp.float32)

    for kw in ({}, {"causal": True}, {"bias": bias}):
        ref_kw = {"causal": kw.get("causal", False),
                  "key_padding_bias": kw.get("bias")}
        ref = mha(p, x, num_heads=heads, impl="einsum", **ref_kw)
        out = hybrid_attn_block(x, p, heads=heads, **kw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
        g_ref = jax.grad(lambda x: jnp.sum(
            mha(p, x, num_heads=heads, impl="einsum", **ref_kw) ** 2))(x)
        g_hyb = jax.grad(lambda x: jnp.sum(
            hybrid_attn_block(x, p, heads=heads, **kw) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g_hyb), np.asarray(g_ref),
                                   atol=1e-4, rtol=1e-4)


def test_fused_block_ineligible_batch_returns_none():
    p = attention_init(jax.random.key(0), 128)
    x = jnp.ones((3, 16, 128))
    assert fused_attn_block(x, p, heads=4) is None

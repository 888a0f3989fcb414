"""Flash-attention kernel correctness vs the einsum reference (interpret mode)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextgen_uia_tpu.ops.flash_attention import flash_attention


def ref_attention(q, k, v, bias=None, causal=False):
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(d)
    if bias is not None:
        logits = logits + bias[:, None, None, :]
    if causal:
        n = q.shape[1]
        mask = jnp.triu(jnp.full((n, n), -jnp.inf), k=1)
        logits = logits + mask[None, None]
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


@pytest.mark.parametrize("n,causal,with_bias", [
    (197, False, False),   # ViT
    (77, True, False),     # CLIP text
    (256, False, True),    # BERT with padding mask
    (33, False, False),    # odd small
])
def test_flash_forward_matches(n, causal, with_bias):
    b, h, d = 2, 4, 64
    ks = jax.random.split(jax.random.key(0), 4)
    q = jax.random.normal(ks[0], (b, n, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, n, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, n, h, d), jnp.float32)
    bias = None
    if with_bias:
        keep = jax.random.bernoulli(ks[3], 0.8, (b, n))
        bias = jnp.where(keep, 0.0, -1e9).astype(jnp.float32)
    ref = ref_attention(q, k, v, bias, causal)
    out = flash_attention(q, k, v, bias=bias, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_flash_long_sequence_matches():
    """Long-N regime (512 < N: one head per grid cell, raised vmem ceiling —
    the DINOv2 @518 px routing, ops/flash_attention.py). Forward + grads at
    the real 1370-token length, and the group-size switchover itself."""
    from nextgen_uia_tpu.ops.flash_attention import _group_size, _pad_len

    assert _group_size(12, _pad_len(197, jnp.float32)) == 4
    assert _group_size(12, _pad_len(1370, jnp.float32)) == 1

    b, n, h, d = 1, 1370, 2, 64
    ks = jax.random.split(jax.random.key(3), 3)
    q = jax.random.normal(ks[0], (b, n, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, n, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, n, h, d), jnp.float32)
    ref = ref_attention(q, k, v)
    out = flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    g_ref = jax.grad(lambda *a: jnp.sum(ref_attention(*a) ** 2),
                     argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(lambda *a: jnp.sum(flash_attention(*a) ** 2),
                    argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_fl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=2e-4)


def test_mha_auto_routes_long_sequences_to_flash(monkeypatch):
    """mha impl='auto' on TPU now routes 512 < N <= NEXTGEN_UIA_FLASH_NMAX
    through the flash kernel; einsum only beyond the cap. Checked via the
    gate inputs (backend-independent), plus einsum/flash value parity at a
    long N on this backend."""
    from nextgen_uia_tpu.nn.attention import _flash_n_max, attention_init, mha

    assert _flash_n_max() == 2048
    monkeypatch.setenv("NEXTGEN_UIA_FLASH_NMAX", "512")
    assert _flash_n_max() == 512

    d, heads, n, b = 64, 2, 700, 1
    p = attention_init(jax.random.key(0), d)
    x = jax.random.normal(jax.random.key(1), (b, n, d))
    out_e = mha(p, x, num_heads=heads, impl="einsum")
    out_f = mha(p, x, num_heads=heads, impl="flash")
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e),
                               atol=2e-5, rtol=2e-5)


def test_flash_backward_matches():
    b, n, h, d = 2, 33, 2, 64
    ks = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(ks[0], (b, n, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, n, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, n, h, d), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(ref_attention(q, k, v) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_fl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4)


def test_mha_flash_impl_matches_einsum():
    """The full mha() flash path (head-major einsum projections + kernel +
    fused o-proj) against the einsum path, values and grads, incl. LoRA."""
    from nextgen_uia_tpu.nn.attention import attention_init, mha
    from nextgen_uia_tpu.adapters.lora import lora_pair_init

    d, heads, n, b = 64, 4, 33, 2
    p = attention_init(jax.random.key(0), d)
    p["lora"] = {"q": lora_pair_init(jax.random.key(1), d, d, 4),
                 "o": lora_pair_init(jax.random.key(2), d, d, 4)}
    p["lora"]["q"]["b"] = jax.random.normal(jax.random.key(3), (4, d)) * 0.1
    p["lora"]["o"]["b"] = jax.random.normal(jax.random.key(4), (4, d)) * 0.1
    x = jax.random.normal(jax.random.key(5), (b, n, d))

    out_e = mha(p, x, num_heads=heads, impl="einsum", lora_alpha=8.0)
    out_f = mha(p, x, num_heads=heads, impl="flash", lora_alpha=8.0)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e),
                               atol=2e-5, rtol=2e-5)

    ge = jax.grad(lambda x: jnp.sum(mha(p, x, num_heads=heads, impl="einsum",
                                        lora_alpha=8.0) ** 2))(x)
    gf = jax.grad(lambda x: jnp.sum(mha(p, x, num_heads=heads, impl="flash",
                                        lora_alpha=8.0) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(ge), atol=1e-4, rtol=1e-4)

    # causal + padding-bias flash paths through mha
    bias = jnp.where(jax.random.bernoulli(jax.random.key(6), 0.8, (b, n)), 0.0, -1e9)
    for kw in ({"causal": True}, {"key_padding_bias": bias}):
        oe = mha(p, x, num_heads=heads, impl="einsum", lora_alpha=8.0, **kw)
        of = mha(p, x, num_heads=heads, impl="flash", lora_alpha=8.0, **kw)
        np.testing.assert_allclose(np.asarray(of), np.asarray(oe), atol=2e-5, rtol=2e-5)


def test_flash_backward_causal_bias():
    b, n, h, d = 2, 20, 2, 64
    ks = jax.random.split(jax.random.key(2), 4)
    q = jax.random.normal(ks[0], (b, n, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, n, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, n, h, d), jnp.float32)
    keep = jax.random.bernoulli(ks[3], 0.7, (b, n))
    bias = jnp.where(keep, 0.0, -1e9).astype(jnp.float32)

    g_ref = jax.grad(lambda *a: jnp.sum(ref_attention(*a, bias=bias) ** 2),
                     argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(lambda *a: jnp.sum(flash_attention(*a, bias=bias) ** 2),
                    argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_fl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4)

    gc_ref = jax.grad(lambda *a: jnp.sum(ref_attention(*a, causal=True) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
    gc_fl = jax.grad(lambda *a: jnp.sum(flash_attention(*a, causal=True) ** 2),
                     argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gc_fl, gc_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4)


def test_flash_bias_gradient():
    """d(loss)/d(bias) through the flash kernel matches the einsum reference
    (the backward kernel accumulates dbias across head-group grid cells)."""
    b, n, h, d = 2, 33, 4, 64
    ks = jax.random.split(jax.random.key(7), 4)
    q = jax.random.normal(ks[0], (b, n, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, n, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, n, h, d), jnp.float32)
    bias = 0.3 * jax.random.normal(ks[3], (b, n), jnp.float32)

    g_ref = jax.grad(lambda bb: jnp.sum(ref_attention(q, k, v, bias=bb) ** 2))(bias)
    g_fl = jax.grad(lambda bb: jnp.sum(flash_attention(q, k, v, bias=bb) ** 2))(bias)
    np.testing.assert_allclose(np.asarray(g_fl), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_prepacked_qkv_matches_unpacked():
    """prepack_qkv's fused projection (flash path) == per-name projections,
    values and grads, with and without LoRA slots."""
    from nextgen_uia_tpu.adapters.lora import lora_pair_init
    from nextgen_uia_tpu.core.partition import prepack_qkv
    from nextgen_uia_tpu.nn.attention import attention_init, mha

    d, heads, n, b = 64, 4, 33, 2
    p = attention_init(jax.random.key(0), d)
    x = jax.random.normal(jax.random.key(1), (b, n, d))

    pp = prepack_qkv(p)
    assert "qkv" in pp and pp["qkv"]["w"].shape == (d, 3 * d)
    base = mha(p, x, num_heads=heads, impl="flash")
    packed = mha(pp, x, num_heads=heads, impl="flash")
    np.testing.assert_allclose(np.asarray(packed), np.asarray(base),
                               atol=1e-5, rtol=1e-5)

    gb = jax.grad(lambda x: jnp.sum(mha(p, x, num_heads=heads, impl="flash") ** 2))(x)
    gp = jax.grad(lambda x: jnp.sum(mha(pp, x, num_heads=heads, impl="flash") ** 2))(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gb), atol=1e-4, rtol=1e-4)

    # with LoRA: pack the frozen base, keep lora slots live
    p["lora"] = {"q": lora_pair_init(jax.random.key(2), d, d, 4),
                 "v": lora_pair_init(jax.random.key(3), d, d, 4)}
    p["lora"]["q"]["b"] = jax.random.normal(jax.random.key(4), (4, d)) * 0.1
    p["lora"]["v"]["b"] = jax.random.normal(jax.random.key(5), (4, d)) * 0.1
    pp = prepack_qkv(p)
    base = mha(p, x, num_heads=heads, impl="flash", lora_alpha=8.0)
    packed = mha(pp, x, num_heads=heads, impl="flash", lora_alpha=8.0)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(base),
                               atol=1e-5, rtol=1e-5)

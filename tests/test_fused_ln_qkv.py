"""Fused LN+QKV kernel vs the unfused reference chain (fwd + dx)."""

import jax
import jax.numpy as jnp
import numpy as np

from nextgen_uia_tpu.nn.attention import attention_init
from nextgen_uia_tpu.nn.layers import layernorm, layernorm_init
from nextgen_uia_tpu.ops.fused_ln_qkv import fused_ln_qkv

D, HEADS, B, N = 256, 4, 2, 32


def _setup():
    ks = jax.random.split(jax.random.key(0), 3)
    ln = layernorm_init(D)
    ln["scale"] = ln["scale"] + jax.random.normal(ks[0], (D,)) * 0.1
    ln["bias"] = ln["bias"] + jax.random.normal(ks[1], (D,)) * 0.1
    attn = attention_init(ks[2], D)
    return ln, attn


def ref_chain(x, ln, attn, eps=1e-5):
    z = layernorm(ln, x, eps=eps)
    outs = []
    for name in ("q", "k", "v"):
        y = z @ attn[name]["w"] + attn[name]["b"]
        outs.append(y.reshape(*x.shape[:2], HEADS, D // HEADS)
                     .transpose(0, 2, 1, 3))
    return tuple(outs)


def test_fused_forward():
    ln, attn = _setup()
    x = jax.random.normal(jax.random.key(5), (B, N, D)) * 0.7
    out = fused_ln_qkv(x, ln, attn, heads=HEADS)
    ref = ref_chain(x, ln, attn)
    for o, r, name in zip(out, ref, "qkv"):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=2e-5, rtol=2e-5, err_msg=name)


def test_fused_backward_dx():
    ln, attn = _setup()
    x = jax.random.normal(jax.random.key(6), (B, N, D)) * 0.7

    def loss_fused(x):
        q, k, v = fused_ln_qkv(x, ln, attn, heads=HEADS)
        return jnp.sum(q ** 2) + 2 * jnp.sum(k ** 2) - jnp.sum(v ** 3)

    def loss_ref(x):
        q, k, v = ref_chain(x, ln, attn)
        return jnp.sum(q ** 2) + 2 * jnp.sum(k ** 2) - jnp.sum(v ** 3)

    g_f = jax.grad(loss_fused)(x)
    g_r = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r),
                               atol=1e-3, rtol=1e-3)


def test_ineligible_shapes_return_none():
    ln, attn = _setup()
    assert fused_ln_qkv(jnp.ones((B, 30, D)), ln, attn, heads=HEADS) is None
    assert fused_ln_qkv(jnp.ones((B, N, D)), ln,
                        {k: {"w": v["w"]} for k, v in attn.items()},
                        heads=HEADS) is None


def test_mha_ln_path_matches_explicit_ln():
    """mha(x, ln=...) == mha(layernorm(x)) on the (CPU) einsum fallback."""
    from nextgen_uia_tpu.nn.attention import mha

    ln, attn = _setup()
    x = jax.random.normal(jax.random.key(7), (B, N, D)) * 0.7
    a = mha(attn, x, num_heads=HEADS, ln=ln, ln_eps=1e-5)
    b = mha(attn, layernorm(ln, x, eps=1e-5), num_heads=HEADS)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6)


def test_fused_attn_o_residual_parity():
    """fused_attn_o_residual == flash-equivalent einsum chain (fwd + grads)."""
    from nextgen_uia_tpu.ops.fused_attn_o import fused_attn_o_residual

    ks = jax.random.split(jax.random.key(9), 5)
    q = jax.random.normal(ks[0], (B, HEADS, N, D // HEADS)) * 0.5
    k = jax.random.normal(ks[1], (B, HEADS, N, D // HEADS)) * 0.5
    v = jax.random.normal(ks[2], (B, HEADS, N, D // HEADS)) * 0.5
    x = jax.random.normal(ks[3], (B, N, D)) * 0.7
    o = {"w": jax.random.normal(ks[4], (D, D)) * 0.05,
         "b": jnp.linspace(-0.1, 0.1, D)}
    bias = jnp.zeros((B, N)).at[:, -5:].set(-1e9)  # padded-key mask

    def ref(q, k, v, x):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(D / HEADS)
        s = s + bias[:, None, None, :]
        p = jax.nn.softmax(s, axis=-1)
        oh = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        flat = jnp.einsum("bhne,hed->bnd", oh, o["w"].reshape(HEADS, D // HEADS, D))
        return x + flat + o["b"]

    out = fused_attn_o_residual(q, k, v, x, o, heads=HEADS, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(q, k, v, x)),
                               atol=2e-5, rtol=2e-5)

    def loss_f(q, k, v, x):
        return jnp.sum(fused_attn_o_residual(q, k, v, x, o, heads=HEADS,
                                             bias=bias) ** 2)

    def loss_r(q, k, v, x):
        return jnp.sum(ref(q, k, v, x) ** 2)

    gf = jax.grad(loss_f, argnums=(0, 1, 2, 3))(q, k, v, x)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(q, k, v, x)
    for a, b_, name in zip(gf, gr, ("dq", "dk", "dv", "dx")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-3, rtol=1e-3, err_msg=name)

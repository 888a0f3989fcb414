"""Parity tests for the post-norm (BERT) fused kernel suite:
raw-x head-major qkv (fused_ln_qkv with ln_params=None), attention+o+residual
with LN epilogue (fused_attn_o post_ln), and post-norm MLP+LN
(fused_postnorm_mlp_ln). All run in Pallas interpreter mode on CPU (the real
Mosaic lowering is covered by the TPU kernel-parity drive)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nextgen_uia_tpu.nn.layers import gelu, layernorm


def _mk_attn(rng, d):
    def lin(k):
        return {"w": 0.1 * jax.random.normal(k, (d, d)),
                "b": 0.1 * jax.random.normal(jax.random.fold_in(k, 1), (d,))}
    ks = jax.random.split(rng, 4)
    return {"q": lin(ks[0]), "k": lin(ks[1]), "v": lin(ks[2]), "o": lin(ks[3])}


def test_qkv_no_ln_matches_reference():
    from nextgen_uia_tpu.ops.fused_ln_qkv import fused_ln_qkv

    b, n, d, h = 2, 16, 128, 4
    x = jax.random.normal(jax.random.key(0), (b, n, d))
    attn = _mk_attn(jax.random.key(1), d)
    out = fused_ln_qkv(x, None, attn, heads=h)
    assert out is not None
    for got, name in zip(out, ("q", "k", "v")):
        ref = (x @ attn[name]["w"] + attn[name]["b"]).reshape(b, n, h, d // h)
        ref = ref.transpose(0, 2, 1, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5, err_msg=name)


def test_qkv_no_ln_backward_dx():
    from nextgen_uia_tpu.ops.fused_ln_qkv import fused_ln_qkv

    b, n, d, h = 1, 8, 128, 2
    x = jax.random.normal(jax.random.key(0), (b, n, d))
    attn = _mk_attn(jax.random.key(1), d)

    def f_kernel(x_):
        q, k, v = fused_ln_qkv(x_, None, attn, heads=h)
        return jnp.sum(q * 1.0 + k * 0.5 + v * 0.25)

    def f_ref(x_):
        q = (x_ @ attn["q"]["w"] + attn["q"]["b"])
        k = (x_ @ attn["k"]["w"] + attn["k"]["b"])
        v = (x_ @ attn["v"]["w"] + attn["v"]["b"])
        return jnp.sum(q * 1.0 + k * 0.5 + v * 0.25)

    np.testing.assert_allclose(np.asarray(jax.grad(f_kernel)(x)),
                               np.asarray(jax.grad(f_ref)(x)),
                               atol=1e-5, rtol=1e-5)


def _ref_attn_o_ln(x, attn, ln, h, bias, eps):
    b, n, d = x.shape
    hd = d // h
    q = (x @ attn["q"]["w"] + attn["q"]["b"]).reshape(b, n, h, hd)
    k = (x @ attn["k"]["w"] + attn["k"]["b"]).reshape(b, n, h, hd)
    v = (x @ attn["v"]["w"] + attn["v"]["b"]).reshape(b, n, h, hd)
    s = jnp.einsum("bqhe,bkhe->bhqk", q, k) / (hd ** 0.5)
    if bias is not None:
        s = s + bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhe->bqhe", p, v).reshape(b, n, d)
    y = o @ attn["o"]["w"] + attn["o"]["b"] + x
    return layernorm(ln, y, eps=eps)


def test_attn_o_post_ln_matches_reference():
    from nextgen_uia_tpu.ops.fused_attn_o import fused_attn_o_residual
    from nextgen_uia_tpu.ops.fused_ln_qkv import fused_ln_qkv

    b, n, d, h = 2, 16, 128, 4
    eps = 1e-12
    x = jax.random.normal(jax.random.key(0), (b, n, d))
    attn = _mk_attn(jax.random.key(1), d)
    ln = {"scale": 1.0 + 0.1 * jax.random.normal(jax.random.key(2), (d,)),
          "bias": 0.1 * jax.random.normal(jax.random.key(3), (d,))}
    bias = jnp.where(jnp.arange(n)[None, :] < 12, 0.0, -1e9
                     ) * jnp.ones((b, 1))

    q, k, v = fused_ln_qkv(x, None, attn, heads=h)
    got = fused_attn_o_residual(q, k, v, x, attn["o"], heads=h, bias=bias,
                                post_ln=ln, ln_eps=eps)
    assert got is not None
    ref = _ref_attn_o_ln(x, attn, ln, h, bias, eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_attn_o_post_ln_backward_dx():
    from nextgen_uia_tpu.ops.fused_attn_o import fused_attn_o_residual
    from nextgen_uia_tpu.ops.fused_ln_qkv import fused_ln_qkv

    b, n, d, h = 1, 8, 128, 2
    eps = 1e-12
    x = jax.random.normal(jax.random.key(0), (b, n, d))
    attn = _mk_attn(jax.random.key(1), d)
    ln = {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}

    def f_kernel(x_):
        q, k, v = fused_ln_qkv(x_, None, attn, heads=h)
        return jnp.sum(fused_attn_o_residual(q, k, v, x_, attn["o"], heads=h,
                                             post_ln=ln, ln_eps=eps) ** 2)

    def f_ref(x_):
        return jnp.sum(_ref_attn_o_ln(x_, attn, ln, h, None, eps) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(f_kernel)(x)),
                               np.asarray(jax.grad(f_ref)(x)),
                               atol=1e-4, rtol=1e-4)


def test_postnorm_mlp_ln_matches_reference():
    from nextgen_uia_tpu.ops.fused_ln_mlp import fused_postnorm_mlp_ln

    b, n, d, hidden = 2, 16, 128, 256
    eps = 1e-12
    x = jax.random.normal(jax.random.key(0), (b, n, d))
    ks = jax.random.split(jax.random.key(1), 2)
    mlp = {"fc1": {"w": 0.1 * jax.random.normal(ks[0], (d, hidden)),
                   "b": jnp.zeros((hidden,)) + 0.05},
           "fc2": {"w": 0.1 * jax.random.normal(ks[1], (hidden, d)),
                   "b": jnp.zeros((d,)) - 0.02}}
    ln = {"scale": 1.0 + 0.1 * jax.random.normal(jax.random.key(2), (d,)),
          "bias": 0.1 * jax.random.normal(jax.random.key(3), (d,))}
    got = fused_postnorm_mlp_ln(x, mlp, ln, act="gelu", eps=eps)
    assert got is not None
    h = gelu(x @ mlp["fc1"]["w"] + mlp["fc1"]["b"])
    ref = layernorm(ln, x + h @ mlp["fc2"]["w"] + mlp["fc2"]["b"], eps=eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_bert_layer_matches_unfused():
    """The whole 3-kernel layer == the op-by-op post-norm layer, and the
    fused path is reachable exactly when mlp_impl == 'auto' on TPU."""
    import nextgen_uia_tpu.models.bert as B

    cfg = B.BertConfig(vocab_size=64, width=128, depth=1, heads=4,
                       intermediate=256, max_positions=40, embed_dim=32,
                       context_length=32)
    p = B.bert_init(jax.random.key(0), cfg)
    layer = p["layers"][0]
    x = jax.random.normal(jax.random.key(1), (2, 32, 128))
    pad = jnp.where(jnp.arange(32)[None, :] < 20, 0.0, -1e9) * jnp.ones((2, 1))

    got = B._fused_bert_layer(layer, x, cfg, pad, None)
    assert got is not None

    from nextgen_uia_tpu.nn.attention import mha

    a = mha(layer["attn"], x, num_heads=cfg.heads, key_padding_bias=pad)
    y = layernorm(layer["attn_ln"], x + a, eps=cfg.ln_eps)
    h = gelu(y @ layer["ffn"]["fc1"]["w"] + layer["ffn"]["fc1"]["b"])
    ref = layernorm(layer["ffn_ln"], y + h @ layer["ffn"]["fc2"]["w"]
                    + layer["ffn"]["fc2"]["b"], eps=cfg.ln_eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

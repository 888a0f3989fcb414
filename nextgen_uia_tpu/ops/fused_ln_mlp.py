"""Fused LayerNorm + MLP + residual Pallas kernel (frozen weights).

Computes y = x + fc2(act(fc1(LN(x)))) in one pass. LayerNorm statistics are
row-local, so the whole chain tiles perfectly: per row tile the kernel does
LN (f32 stats) -> fc1 -> act -> fc2 -> +x with the hidden activations and
normalized values never leaving VMEM. Compared to the unfused chain
(LN write + MLP read + hidden round trip + residual reads) this cuts the
per-layer HBM traffic to read-x + write-y + resident weights — the dominant
cost on this bandwidth-bound part (PERF.md).

Backward (custom VJP, frozen fc/LN weights — adapter fine-tuning):
dx = g + LN_bwd(MLP_bwd(g)), both row-local, recomputed in-kernel from x.
Weight/scale grads are structural zeros; full fine-tuning must use
mlp_impl='xla'.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import _act_fns, _ln_rows, _tile8, _tiles


def _fwd_kernel(x_ref, g_ref_, b_ref_, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                *, act, n_hc, hc_size, eps):
    x = x_ref[...]
    x32 = x.astype(jnp.float32)
    gamma = g_ref_[0].astype(jnp.float32)
    beta = b_ref_[0].astype(jnp.float32)
    z, _, _ = _ln_rows(x32, gamma, beta, eps)
    z = z.astype(x.dtype)
    fwd, _ = _act_fns(act)
    acc = x32 + b2_ref[0].astype(jnp.float32)[None, :]
    for hc in range(n_hc):
        w1c = w1_ref[:, hc * hc_size:(hc + 1) * hc_size]
        a = jax.lax.dot(z, w1c, preferred_element_type=jnp.float32)
        a = a + b1_ref[0, hc * hc_size:(hc + 1) * hc_size].astype(jnp.float32)[None, :]
        h = fwd(a).astype(x.dtype)
        w2c = w2_ref[hc * hc_size:(hc + 1) * hc_size, :]
        acc = acc + jax.lax.dot(h, w2c, preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def _bwd_kernel(x_ref, g_ref_, b_ref_, w1_ref, b1_ref, w2_ref, grad_ref, dx_ref,
                *, act, n_hc, hc_size, eps):
    x = x_ref[...]
    x32 = x.astype(jnp.float32)
    gamma = g_ref_[0].astype(jnp.float32)
    beta = b_ref_[0].astype(jnp.float32)
    z32, xhat, rstd = _ln_rows(x32, gamma, beta, eps)
    z = z32.astype(x.dtype)
    g = grad_ref[...].astype(x.dtype)
    _, gradf = _act_fns(act)

    # MLP backward wrt its input z
    dz = jnp.zeros(z32.shape, jnp.float32)
    for hc in range(n_hc):
        w1c = w1_ref[:, hc * hc_size:(hc + 1) * hc_size]
        a = jax.lax.dot(z, w1c, preferred_element_type=jnp.float32)
        a = a + b1_ref[0, hc * hc_size:(hc + 1) * hc_size].astype(jnp.float32)[None, :]
        w2c = w2_ref[hc * hc_size:(hc + 1) * hc_size, :]
        dh = jax.lax.dot_general(g, w2c, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dpre = (dh * gradf(a)).astype(x.dtype)
        dz = dz + jax.lax.dot_general(dpre, w1c, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    # LayerNorm backward (row-local): dxhat = dz * gamma
    dxhat = dz * gamma[None, :]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = (dxhat - m1 - xhat * m2) * rstd
    dx_ref[...] = (grad_ref[...].astype(jnp.float32) + dx_ln).astype(dx_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused(x, gamma, beta, w1, b1, w2, b2, act, eps):
    return _fwd_impl(x, gamma, beta, w1, b1, w2, b2, act, eps)


def _specs(tm, d, hidden):
    row = pl.BlockSpec((tm, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_d = pl.BlockSpec((8, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec_h = pl.BlockSpec((8, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM)
    w1s = pl.BlockSpec((d, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM)
    w2s = pl.BlockSpec((hidden, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return row, vec_d, vec_h, w1s, w2s


def _fwd_impl(x, gamma, beta, w1, b1, w2, b2, act, eps):
    m, d = x.shape
    hidden = w1.shape[1]
    tm, n_hc = _tiles(m, hidden)
    hc_size = hidden // n_hc
    row, vec_d, vec_h, w1s, w2s = _specs(tm, d, hidden)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, act=act, n_hc=n_hc, hc_size=hc_size, eps=eps),
        grid=(m // tm,),
        in_specs=[row, vec_d, vec_d, w1s, vec_h, w2s, vec_d],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(x, _tile8(gamma), _tile8(beta), w1, _tile8(b1), w2, _tile8(b2))


def _fwd_rule(x, gamma, beta, w1, b1, w2, b2, act, eps):
    out = _fwd_impl(x, gamma, beta, w1, b1, w2, b2, act, eps)
    return out, (x, gamma, beta, w1, b1, w2, b2)


def _bwd_rule(act, eps, res, g):
    x, gamma, beta, w1, b1, w2, b2 = res
    m, d = x.shape
    hidden = w1.shape[1]
    tm, n_hc = _tiles(m, hidden)
    hc_size = hidden // n_hc
    row, vec_d, vec_h, w1s, w2s = _specs(tm, d, hidden)
    # the backward's transients (dz accumulator, dpre) on top of the resident
    # w1+w2 sit ~120 KB over Mosaic's default 16 MB scoped-vmem cap when
    # neighboring layouts shift — raise the cap rather than shrink the row
    # tile (tm=64 measured ~1% slower end-to-end; v5e has headroom)
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, act=act, n_hc=n_hc, hc_size=hc_size, eps=eps),
        grid=(m // tm,),
        in_specs=[row, vec_d, vec_d, w1s, vec_h, w2s, row],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(x, _tile8(gamma), _tile8(beta), w1, _tile8(b1), w2, g.astype(x.dtype))
    zeros = jax.tree_util.tree_map(jnp.zeros_like, (gamma, beta, w1, b1, w2, b2))
    return (dx, *zeros)


_fused.defvjp(_fwd_rule, _bwd_rule)


def _postnorm_fwd_kernel(x_ref, g_ref_, b_ref_, w1_ref, b1_ref, w2_ref, b2_ref,
                         o_ref, *, act, n_hc, hc_size, eps):
    """Post-norm layout (BERT ffn): y = LN(x + fc2(act(fc1(x))))."""
    x = x_ref[...]
    x32 = x.astype(jnp.float32)
    fwd, _ = _act_fns(act)
    acc = x32 + b2_ref[0].astype(jnp.float32)[None, :]
    for hc in range(n_hc):
        w1c = w1_ref[:, hc * hc_size:(hc + 1) * hc_size]
        a = jax.lax.dot(x, w1c, preferred_element_type=jnp.float32)
        a = a + b1_ref[0, hc * hc_size:(hc + 1) * hc_size].astype(jnp.float32)[None, :]
        h = fwd(a).astype(x.dtype)
        w2c = w2_ref[hc * hc_size:(hc + 1) * hc_size, :]
        acc = acc + jax.lax.dot(h, w2c, preferred_element_type=jnp.float32)
    z, _, _ = _ln_rows(acc, g_ref_[0].astype(jnp.float32),
                       b_ref_[0].astype(jnp.float32), eps)
    o_ref[...] = z.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused_postnorm(x, gamma, beta, w1, b1, w2, b2, act, eps):
    return _postnorm_fwd_impl(x, gamma, beta, w1, b1, w2, b2, act, eps)


def _postnorm_fwd_impl(x, gamma, beta, w1, b1, w2, b2, act, eps):
    m, d = x.shape
    hidden = w1.shape[1]
    tm, n_hc = _tiles(m, hidden)
    hc_size = hidden // n_hc
    row, vec_d, vec_h, w1s, w2s = _specs(tm, d, hidden)
    return pl.pallas_call(
        functools.partial(_postnorm_fwd_kernel, act=act, n_hc=n_hc,
                          hc_size=hc_size, eps=eps),
        grid=(m // tm,),
        in_specs=[row, vec_d, vec_d, w1s, vec_h, w2s, vec_d],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(x, _tile8(gamma), _tile8(beta), w1, _tile8(b1), w2, _tile8(b2))


def _postnorm_fwd_rule(x, gamma, beta, w1, b1, w2, b2, act, eps):
    out = _postnorm_fwd_impl(x, gamma, beta, w1, b1, w2, b2, act, eps)
    return out, (x, gamma, beta, w1, b1, w2, b2)


def _postnorm_bwd_rule(act, eps, res, g):
    # correctness-only: this variant serves the frozen in-step text tower
    # (never differentiated — no trainable inputs feed it); exact XLA
    # recomposition if it ever is
    x, gamma, beta, w1, b1, w2, b2 = res
    fwd_act, _ = _act_fns(act)

    def ref(x_):
        h = fwd_act(x_.astype(jnp.float32) @ w1.astype(jnp.float32)
                    + b1[None, :]).astype(x_.dtype)
        y = (x_.astype(jnp.float32) + h.astype(jnp.float32)
             @ w2.astype(jnp.float32) + b2[None, :])
        mu = y.mean(-1, keepdims=True)
        var = ((y - mu) ** 2).mean(-1, keepdims=True)
        return ((y - mu) * jax.lax.rsqrt(var + eps) * gamma + beta
                ).astype(x_.dtype)

    _, vjp = jax.vjp(ref, x)
    (dx,) = vjp(g)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, (gamma, beta, w1, b1, w2, b2))
    return (dx, *zeros)


_fused_postnorm.defvjp(_postnorm_fwd_rule, _postnorm_bwd_rule)


def fused_postnorm_mlp_ln(x, mlp_params, ln_params, *, act: str = "gelu",
                          eps: float = 1e-12):
    """Post-norm (BERT) ffn sublayer: LN(x + fc2(act(fc1(x)))), frozen
    weights. Returns None when the row count doesn't tile."""
    shape = x.shape
    d = shape[-1]
    m = x.size // d
    tm, _ = _tiles(m, mlp_params["fc1"]["w"].shape[1])
    if tm is None:
        return None
    out = _fused_postnorm(x.reshape(m, d),
                          ln_params["scale"].astype(jnp.float32),
                          ln_params["bias"].astype(jnp.float32),
                          mlp_params["fc1"]["w"].astype(x.dtype),
                          mlp_params["fc1"]["b"].astype(jnp.float32),
                          mlp_params["fc2"]["w"].astype(x.dtype),
                          mlp_params["fc2"]["b"].astype(jnp.float32),
                          act, eps)
    return out.reshape(shape)


def fused_ln_mlp_residual(x, ln_params, mlp_params, *, act: str = "gelu",
                          eps: float = 1e-5):
    """x [..., D] -> x + fc2(act(fc1(LN(x)))) with frozen LN/MLP weights.

    Returns None when the row count doesn't tile (caller falls back).
    """
    shape = x.shape
    d = shape[-1]
    m = x.size // d
    tm, _ = _tiles(m, mlp_params["fc1"]["w"].shape[1])
    if tm is None:
        return None
    out = _fused(x.reshape(m, d),
                 ln_params["scale"].astype(jnp.float32),
                 ln_params["bias"].astype(jnp.float32),
                 mlp_params["fc1"]["w"].astype(x.dtype),
                 mlp_params["fc1"]["b"].astype(jnp.float32),
                 mlp_params["fc2"]["w"].astype(x.dtype),
                 mlp_params["fc2"]["b"].astype(jnp.float32),
                 act, eps)
    return out.reshape(shape)

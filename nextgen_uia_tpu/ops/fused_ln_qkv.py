"""Fused LayerNorm + q/k/v projection Pallas kernel (frozen weights).

Replaces the pre-attention chain LN -> three [D, D] projections -> head-major
relayout with ONE kernel per image: LN statistics (f32) and the normalized
activations never leave VMEM, each projection runs as a full-width
[N, 768] x [768, 768] matmul (6x128 MXU lanes — the per-head einsum
"bnd,dhe->bhne" the XLA path uses tiles into [., 64]-wide outputs that leave
half the MXU idle; profiled at ~29% utilization, PERF.md round 3), and the
head-major [H, N, Dh] layout the flash kernel consumes is produced by an
in-VMEM swap, not an HBM round trip.

Backward (custom VJP, frozen weights — adapter fine-tuning only):
dx = LN_bwd(dq @ Wq^T + dk @ Wk^T + dv @ Wv^T), all in one kernel, LN stats
recomputed from x. Weight/bias/scale grads are structural zeros; full
fine-tuning routes through the XLA path (ViTConfig.mlp_impl = 'xla' gates
both this and the fused MLP kernels — see models/vit.py).

Reference semantics covered: timm fused-qkv attention and torch
nn.MultiheadAttention in_proj (/root/reference/src/adapters/lora.py:93-199,
298-313) — converters split either layout into the separate q/k/v trees this
kernel reads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import _ln_rows, _tile8


def _fwd_kernel(x_ref, g_ref, b_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                wv_ref, bv_ref, q_ref, k_ref, v_ref, *, heads, eps, has_ln):
    x = x_ref[0]                               # [N, D]
    n, d = x.shape
    hd = d // heads
    if has_ln:
        z, _, _ = _ln_rows(x.astype(jnp.float32), g_ref[0].astype(jnp.float32),
                           b_ref[0].astype(jnp.float32), eps)
        z = z.astype(x.dtype)
    else:
        # post-norm towers (BERT): q/k/v project the RAW residual stream —
        # this variant exists for the full-width matmuls + head-major layout
        z = x
    for w_ref, bias_ref, o_ref in ((wq_ref, bq_ref, q_ref),
                                   (wk_ref, bk_ref, k_ref),
                                   (wv_ref, bv_ref, v_ref)):
        y = jax.lax.dot(z, w_ref[...], preferred_element_type=jnp.float32)
        y = (y + bias_ref[0].astype(jnp.float32)[None, :]).astype(o_ref.dtype)
        # head-major relayout via per-head lane slices (Mosaic here rejects
        # the (N, D) -> (N, H, hd) shape cast; 64-lane slices compile fine)
        for h in range(heads):
            o_ref[0, h] = y[:, h * hd:(h + 1) * hd]


def _bwd_kernel(x_ref, g_ref, b_ref, wq_ref, wk_ref, wv_ref,
                dq_ref, dk_ref, dv_ref, dx_ref, *, heads, eps, has_ln):
    x = x_ref[0]
    n, d = x.shape
    heads_n = dq_ref.shape[1]
    dz = jnp.zeros((n, d), jnp.float32)
    for w_ref, g_out in ((wq_ref, dq_ref), (wk_ref, dk_ref), (wv_ref, dv_ref)):
        # inverse of the forward's per-head slices: lane-concat [N, hd] heads
        dy = jnp.concatenate([g_out[0, h] for h in range(heads_n)],
                             axis=-1).astype(x.dtype)
        dz = dz + jax.lax.dot_general(dy, w_ref[...], (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    if not has_ln:
        dx_ref[0] = dz.astype(dx_ref.dtype)
        return
    _, xhat, rstd = _ln_rows(x.astype(jnp.float32), g_ref[0].astype(jnp.float32),
                             b_ref[0].astype(jnp.float32), eps)
    dxhat = dz * g_ref[0].astype(jnp.float32)[None, :]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[0] = ((dxhat - m1 - xhat * m2) * rstd).astype(dx_ref.dtype)


def _row_spec(n, d):
    return pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _vec_spec(d):
    return pl.BlockSpec((8, d), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _w_spec(d):
    return pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _head_spec(heads, n, hd):
    return pl.BlockSpec((1, heads, n, hd), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _fused(x, gamma, beta, wq, bq, wk, bk, wv, bv, heads, eps, has_ln):
    return _fwd_impl(x, gamma, beta, wq, bq, wk, bk, wv, bv, heads, eps, has_ln)


def _fwd_impl(x, gamma, beta, wq, bq, wk, bk, wv, bv, heads, eps, has_ln=True):
    b, n, d = x.shape
    hd = d // heads
    out = jax.ShapeDtypeStruct((b, heads, n, hd), x.dtype)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, eps=eps, has_ln=has_ln),
        grid=(b,),
        in_specs=[_row_spec(n, d), _vec_spec(d), _vec_spec(d),
                  _w_spec(d), _vec_spec(d), _w_spec(d), _vec_spec(d),
                  _w_spec(d), _vec_spec(d)],
        out_specs=(_head_spec(heads, n, hd),) * 3,
        out_shape=(out,) * 3,
        interpret=jax.default_backend() == "cpu",
    )(x, _tile8(gamma), _tile8(beta), wq, _tile8(bq), wk, _tile8(bk),
      wv, _tile8(bv))


def _fwd_rule(x, gamma, beta, wq, bq, wk, bk, wv, bv, heads, eps, has_ln):
    out = _fwd_impl(x, gamma, beta, wq, bq, wk, bk, wv, bv, heads, eps, has_ln)
    return out, (x, gamma, beta, wq, bq, wk, bk, wv, bv)


def _bwd_rule(heads, eps, has_ln, res, grads):
    x, gamma, beta, wq, bq, wk, bk, wv, bv = res
    dq, dk, dv = grads
    b, n, d = x.shape
    hd = d // heads
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, eps=eps, has_ln=has_ln),
        grid=(b,),
        in_specs=[_row_spec(n, d), _vec_spec(d), _vec_spec(d),
                  _w_spec(d), _w_spec(d), _w_spec(d)] +
                 [_head_spec(heads, n, hd)] * 3,
        out_specs=_row_spec(n, d),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(x, _tile8(gamma), _tile8(beta), wq, wk, wv,
      dq.astype(x.dtype), dk.astype(x.dtype), dv.astype(x.dtype))
    zeros = jax.tree_util.tree_map(jnp.zeros_like,
                                   (gamma, beta, wq, bq, wk, bk, wv, bv))
    return (dx, *zeros)


_fused.defvjp(_fwd_rule, _bwd_rule)


def fused_ln_qkv(x, ln_params, attn_params, *, heads: int, eps: float = 1e-5):
    """x [B, N, D] -> (q, k, v) each [B, H, N, D/H], with LN fused in.

    ``ln_params=None`` gives the post-norm variant (BERT): q/k/v project the
    raw residual stream — the kernel still wins its full-width matmuls and
    in-VMEM head-major relayout over the XLA per-head einsum.

    Frozen-weight contract (see module docstring). Returns None when the
    shapes don't tile (caller falls back to the XLA path): N must be a
    sublane multiple and D a lane multiple, and q/k/v must carry biases
    (both reference attention layouts do).
    """
    b, n, d = x.shape
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    if n % sub or d % 128 or d % heads:
        return None
    if any("b" not in attn_params[k] for k in ("q", "k", "v")):
        return None
    has_ln = ln_params is not None
    gamma = (ln_params["scale"] if has_ln else jnp.ones((d,))).astype(jnp.float32)
    beta = (ln_params["bias"] if has_ln else jnp.zeros((d,))).astype(jnp.float32)
    return _fused(
        x, gamma, beta,
        attn_params["q"]["w"].astype(x.dtype),
        attn_params["q"]["b"].astype(jnp.float32),
        attn_params["k"]["w"].astype(x.dtype),
        attn_params["k"]["b"].astype(jnp.float32),
        attn_params["v"]["w"].astype(x.dtype),
        attn_params["v"]["b"].astype(jnp.float32),
        heads, eps, has_ln)

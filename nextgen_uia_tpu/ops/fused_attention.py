"""Fused attention block: qkv projection + flash attention + o projection in
one Pallas kernel (frozen weights).

On this bandwidth-bound part (PERF.md), the unfused path writes q, k, v
(57 MB at ViT-B/batch-64 shapes) to HBM after the projections and reads them
back in the attention kernel, then round-trips the attention output through
the o-projection. This kernel holds everything in VMEM: a batch chunk of the
(already-LayerNormed) input is read once, all four projection matrices stay
resident, heads are looped in-kernel, and only the final o-projected output
is written. Per layer the traffic drops from ~5 tensors to read-x + write-out.

Backward assumes FROZEN projection weights (adapter fine-tuning): a second
kernel recomputes per-head attention and emits dx only; weight grads are
structural zeros. mha() routes here only when the attention carries no LoRA
slot and no generic mask; LoRA attention uses the standalone flash kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _head_probs(q, k, bias_rows, *, scale, causal):
    """q, k: [BC, N, Dh] -> softmax probs [BC, N, N] (f32)."""
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    if bias_rows is not None:
        s = s + bias_rows[:, None, :]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col > row, NEG_INF, s)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _proj_head(x_flat, w_ref, b_ref, h, dh):
    w = w_ref[:, h * dh:(h + 1) * dh]
    y = jax.lax.dot(x_flat, w, preferred_element_type=jnp.float32)
    y = y + b_ref[0, h * dh:(h + 1) * dh].astype(jnp.float32)[None, :]
    return y


def _fwd_kernel(x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                wo_ref, bo_ref, bias_ref, o_ref, *, heads, scale, causal):
    bc, n, d = x_ref.shape
    dh = d // heads
    x = x_ref[...]
    x_flat = x.reshape(bc * n, d)
    bias_rows = bias_ref[...] if bias_ref is not None else None
    acc = jnp.broadcast_to(bo_ref[0].astype(jnp.float32)[None, :], (bc * n, d))
    for h in range(heads):
        q = _proj_head(x_flat, wq_ref, bq_ref, h, dh).astype(x.dtype).reshape(bc, n, dh)
        k = _proj_head(x_flat, wk_ref, bk_ref, h, dh).astype(x.dtype).reshape(bc, n, dh)
        v = _proj_head(x_flat, wv_ref, bv_ref, h, dh).astype(x.dtype).reshape(bc, n, dh)
        p = _head_probs(q, k, bias_rows, scale=scale, causal=causal)
        oh = jax.lax.dot_general(p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        oh_flat = oh.astype(x.dtype).reshape(bc * n, dh)
        wo_h = wo_ref[h * dh:(h + 1) * dh, :]
        acc = acc + jax.lax.dot(oh_flat, wo_h, preferred_element_type=jnp.float32)
    o_ref[...] = acc.reshape(bc, n, d).astype(o_ref.dtype)


def _bwd_kernel(x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                wo_ref, bias_ref, g_ref, dx_ref, *, heads, scale, causal):
    bc, n, d = x_ref.shape
    dh = d // heads
    x = x_ref[...]
    x_flat = x.reshape(bc * n, d)
    g_flat = g_ref[...].astype(x.dtype).reshape(bc * n, d)
    bias_rows = None
    if bias_ref is not None:
        # bias ships pre-chunked as [n_chunks, 8, n]; our rows are the first
        # bc of this chunk's 8-row (sublane-aligned) block
        bias_rows = bias_ref[0, :bc, :]
    dx = jnp.zeros((bc * n, d), jnp.float32)
    for h in range(heads):
        q = _proj_head(x_flat, wq_ref, bq_ref, h, dh).astype(x.dtype).reshape(bc, n, dh)
        k = _proj_head(x_flat, wk_ref, bk_ref, h, dh).astype(x.dtype).reshape(bc, n, dh)
        v = _proj_head(x_flat, wv_ref, bv_ref, h, dh).astype(x.dtype).reshape(bc, n, dh)
        p = _head_probs(q, k, bias_rows, scale=scale, causal=causal)  # [BC,N,N] f32

        wo_h = wo_ref[h * dh:(h + 1) * dh, :]
        # d(oh) = g @ Wo_h^T
        doh = jax.lax.dot_general(g_flat, wo_h, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        doh = doh.reshape(bc, n, dh)
        # dv = p^T doh ; dp = doh v^T
        dv = jax.lax.dot_general(p, doh, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(doh.astype(x.dtype), v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
        dsx = ds.astype(x.dtype)
        dq = jax.lax.dot_general(dsx, k, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(dsx, q, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        # back through projections: dx += dq Wq_h^T + dk Wk_h^T + dv Wv_h^T
        for dmat, w_ref in ((dq, wq_ref), (dk, wk_ref), (dv, wv_ref)):
            dflat = dmat.astype(x.dtype).reshape(bc * n, dh)
            w_h = w_ref[:, h * dh:(h + 1) * dh]
            dx = dx + jax.lax.dot_general(dflat, w_h, (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32)
    dx_ref[...] = dx.reshape(bc, n, d).astype(dx_ref.dtype)


def _tile8(b):
    return jnp.broadcast_to(b[None, :], (8, b.shape[0]))


def _chunk(batch: int) -> int | None:
    """Batch chunk per grid step; None when ineligible (batch not a multiple
    of the 8-sublane tile — callers fall back to the unfused path)."""
    return 8 if batch % 8 == 0 else None


def eligible(x, bias) -> bool:
    return _chunk(x.shape[0]) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def _fused_attn(x, wq, bq, wk, bk, wv, bv, wo, bo, bias, heads, causal):
    return _fwd_impl(x, wq, bq, wk, bk, wv, bv, wo, bo, bias, heads, causal)


def _common_specs(bc, n, d, with_bias):
    x_spec = pl.BlockSpec((bc, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((8, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    specs = [x_spec, w_spec, b_spec, w_spec, b_spec, w_spec, b_spec, w_spec]
    bias_spec = pl.BlockSpec((bc, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return x_spec, specs, bias_spec


def _fwd_impl(x, wq, bq, wk, bk, wv, bv, wo, bo, bias, heads, causal):
    b, n, d = x.shape
    bc = _chunk(b)
    scale = 1.0 / ((d // heads) ** 0.5)
    x_spec, specs, bias_spec = _common_specs(bc, n, d, bias is not None)
    in_specs = specs + [pl.BlockSpec((8, d), lambda i: (0, 0), memory_space=pltpu.VMEM)]
    args = [x, wq, _tile8(bq), wk, _tile8(bk), wv, _tile8(bv), wo, _tile8(bo)]
    if bias is not None:
        in_specs.append(bias_spec)
        args.append(bias.astype(jnp.float32))
        kernel = functools.partial(_fwd_kernel, heads=heads, scale=scale, causal=causal)
    else:
        def kernel(xr, wqr, bqr, wkr, bkr, wvr, bvr, wor, bor, orf):
            _fwd_kernel(xr, wqr, bqr, wkr, bkr, wvr, bvr, wor, bor, None, orf,
                        heads=heads, scale=scale, causal=causal)
    return pl.pallas_call(
        kernel, grid=(b // bc,), in_specs=in_specs, out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(*args)


def _fwd_rule(x, wq, bq, wk, bk, wv, bv, wo, bo, bias, heads, causal):
    out = _fwd_impl(x, wq, bq, wk, bk, wv, bv, wo, bo, bias, heads, causal)
    return out, (x, wq, bq, wk, bk, wv, bv, wo, bo, bias)


def _bwd_rule(heads, causal, res, g):
    x, wq, bq, wk, bk, wv, bv, wo, bo, bias = res
    b, n, d = x.shape
    bc = 4  # smaller chunk: backward transients (~3 score-sized f32 buffers
            # per head + f32 dx accumulator) must fit scoped VMEM
    scale = 1.0 / ((d // heads) ** 0.5)
    x_spec, specs, _ = _common_specs(bc, n, d, bias is not None)
    in_specs = list(specs)
    args = [x, wq, _tile8(bq), wk, _tile8(bk), wv, _tile8(bv), wo]
    if bias is not None:
        # pre-chunk bias to [n_chunks, 8, n] so each grid step reads an
        # aligned 8-row block holding its bc rows first
        bias_c = bias.astype(jnp.float32).reshape(b // bc, bc, n)
        bias_c = jnp.pad(bias_c, ((0, 0), (0, 8 - bc), (0, 0)))
        in_specs.append(pl.BlockSpec((1, 8, n), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias_c)
        kernel = functools.partial(_bwd_kernel, heads=heads, scale=scale, causal=causal)
    else:
        def kernel(xr, wqr, bqr, wkr, bkr, wvr, bvr, wor, gr, dxr):
            _bwd_kernel(xr, wqr, bqr, wkr, bkr, wvr, bvr, wor, None, gr, dxr,
                        heads=heads, scale=scale, causal=causal)
    in_specs.append(x_spec)  # g
    args.append(g)
    dx = pl.pallas_call(
        kernel, grid=(b // bc,), in_specs=in_specs, out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(*args)
    zeros = jax.tree_util.tree_map(jnp.zeros_like,
                                   (wq, bq, wk, bk, wv, bv, wo, bo))
    dbias = jnp.zeros_like(bias) if bias is not None else None
    return (dx, *zeros, dbias)


_fused_attn.defvjp(_fwd_rule, _bwd_rule)


def _xla_fwd(x, wq, bq, wk, bk, wv, bv, wo, bo, bias, heads, causal):
    """Fast forward: head-major einsum projections + flash kernel + einsum
    o-projection (the measured-fastest forward decomposition)."""
    from .flash_attention import flash_attention

    b, n, d = x.shape
    dh = d // heads

    def proj(w, bvec):
        y = jnp.einsum("bnd,dhe->bhne", x, w.reshape(d, heads, dh))
        return y + bvec.astype(y.dtype).reshape(heads, dh)[None, :, None, :]

    q, k, v = proj(wq, bq), proj(wk, bk), proj(wv, bv)
    out = flash_attention(q, k, v, bias=bias, causal=causal, layout="bhnd")
    o = jnp.einsum("bhne,hed->bnd", out, wo.reshape(heads, dh, d))
    return o + bo.astype(o.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def _hybrid_attn(x, wq, bq, wk, bk, wv, bv, wo, bo, bias, heads, causal):
    """XLA-decomposed forward + all-in-one fused backward (dx direct)."""
    return _xla_fwd(x, wq, bq, wk, bk, wv, bv, wo, bo, bias, heads, causal)


def _hybrid_fwd_rule(x, wq, bq, wk, bk, wv, bv, wo, bo, bias, heads, causal):
    out = _xla_fwd(x, wq, bq, wk, bk, wv, bv, wo, bo, bias, heads, causal)
    return out, (x, wq, bq, wk, bk, wv, bv, wo, bo, bias)


_hybrid_attn.defvjp(_hybrid_fwd_rule, _bwd_rule)


def hybrid_attn_block(x, attn_params, *, heads: int, bias=None, causal: bool = False):
    """Fast-forward / fused-backward attention block (frozen weights).

    Forward is the einsum+flash decomposition; backward is one Pallas kernel
    computing dx straight through the frozen projections — dq/dk/dv never
    round-trip HBM. Returns None when ineligible (batch % 8)."""
    if _chunk(x.shape[0]) is None:
        return None
    d = x.shape[-1]

    def wb(name):
        w = attn_params[name]["w"].astype(x.dtype)
        b = attn_params[name].get("b")
        return w, (b.astype(jnp.float32) if b is not None else jnp.zeros((d,), jnp.float32))

    wq, bq = wb("q")
    wk, bk = wb("k")
    wv, bv = wb("v")
    wo, bo = wb("o")
    return _hybrid_attn(x, wq, bq, wk, bk, wv, bv, wo, bo, bias, heads, causal)


def fused_attn_block(x, attn_params, *, heads: int, bias=None, causal: bool = False):
    """x [B, N, D] (already normed) -> o-projected attention output [B, N, D].

    attn_params: {'q','k','v','o'} each {'w' [D,D], 'b' [D]} — FROZEN weights
    (structural-zero grads; LoRA/full-FT must use the unfused path).
    Returns None when the shape is ineligible (caller falls back).
    """
    if _chunk(x.shape[0]) is None:
        return None
    d = x.shape[-1]

    def wb(name):
        w = attn_params[name]["w"].astype(x.dtype)
        b = attn_params[name].get("b")
        return w, (b.astype(jnp.float32) if b is not None else jnp.zeros((d,), jnp.float32))

    wq, bq = wb("q")
    wk, bk = wb("k")
    wv, bv = wb("v")
    wo, bo = wb("o")
    return _fused_attn(x, wq, bq, wk, bk, wv, bv, wo, bo, bias, heads, causal)

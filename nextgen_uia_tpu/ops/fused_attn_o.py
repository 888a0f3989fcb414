"""Fused attention + o-projection + residual Pallas kernel (frozen Wo).

Consumes the head-major q/k/v the LN+QKV kernel (ops/fused_ln_qkv.py) emits
and finishes the whole attention sublayer in one grid cell per image:
per-head-group softmax(qk)v (scores never leave VMEM, same math as
ops/flash_attention.py), lane-concat of the head outputs back to [N, D], one
full-width [N, D] x [D, D] o-projection, residual add. Versus the unfused
tail (flash writes [B, H, N, dh] to HBM, the o-proj einsum reads it back,
the residual reads x again) this saves the attention-output round trip and
runs the o-proj at full MXU lane width.

Backward (custom VJP, frozen Wo — adapter fine-tuning): recomputes the
probs from q/k/v, back-projects g through Wo with one wide matmul, lane-
slices per head for the attention backward, and emits head-major dq/dk/dv
directly (which the LN+QKV backward consumes). d(residual x) = g exactly, so
no extra kernel output is needed. Wo/bo grads are structural zeros; full
fine-tuning routes through the XLA path (same mlp_impl='xla' gate as the
other frozen-weight kernels — models/vit.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import _tile8

NEG_INF = -1e30


def _group_probs(q, k, bias_row, *, scale, n_real, causal):
    """[G, N, dh] x [G, N, dh] -> softmax probs [G, N, N] (f32)."""
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col >= n_real, NEG_INF, s)
    if bias_row is not None:
        s = s + bias_row[None, None, :]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col > row, NEG_INF, s)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, x_ref, wo_ref, bo_ref, g_ref, b_ref,
                bias_ref, o_ref, *, heads, g_size, scale, n_real, causal,
                post_ln, ln_eps):
    n, d = x_ref.shape[1], x_ref.shape[2]
    hd = d // heads
    bias_row = bias_ref[0, 0] if bias_ref is not None else None
    outs = []
    for gi in range(heads // g_size):
        q = q_ref[0, gi * g_size:(gi + 1) * g_size]
        k = k_ref[0, gi * g_size:(gi + 1) * g_size]
        v = v_ref[0, gi * g_size:(gi + 1) * g_size]
        p = _group_probs(q, k, bias_row, scale=scale, n_real=n_real,
                         causal=causal)
        oh = jax.lax.dot_general(p.astype(v.dtype), v,
                                 (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        # [G, N, hd] -> G lane-slices of the concat target
        outs.extend(oh[i].astype(x_ref.dtype) for i in range(g_size))
    cat = jnp.concatenate(outs, axis=-1)              # [N, D]
    y = jax.lax.dot(cat, wo_ref[...], preferred_element_type=jnp.float32)
    y = y + bo_ref[0].astype(jnp.float32)[None, :]
    y = y + x_ref[0].astype(jnp.float32)
    if post_ln:
        # post-norm epilogue (BERT): out = LN(attn_o + residual) — the
        # pre-LN sum never round-trips HBM
        from .fused_mlp import _ln_rows

        y, _, _ = _ln_rows(y, g_ref[0].astype(jnp.float32),
                           b_ref[0].astype(jnp.float32), ln_eps)
    o_ref[0] = y.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, wo_ref, bias_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, heads, g_size, scale, n_real,
                causal):
    n, d = g_ref.shape[1], g_ref.shape[2]
    hd = d // heads
    bias_row = bias_ref[0, 0] if bias_ref is not None else None
    g = g_ref[0]
    # back through the o-projection with ONE wide matmul, then lane-slice
    doh_flat = jax.lax.dot_general(g.astype(q_ref.dtype), wo_ref[...],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    for gi in range(heads // g_size):
        q = q_ref[0, gi * g_size:(gi + 1) * g_size]
        k = k_ref[0, gi * g_size:(gi + 1) * g_size]
        v = v_ref[0, gi * g_size:(gi + 1) * g_size]
        p = _group_probs(q, k, bias_row, scale=scale, n_real=n_real,
                         causal=causal)
        doh = jnp.stack([
            doh_flat[:, (gi * g_size + i) * hd:(gi * g_size + i + 1) * hd]
            for i in range(g_size)]).astype(q.dtype)   # [G, N, hd]
        dv = jax.lax.dot_general(p.astype(q.dtype), doh,
                                 (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(doh, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
              ).astype(q.dtype)
        dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        sl = slice(gi * g_size, (gi + 1) * g_size)
        dq_ref[0, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, sl] = dv.astype(dv_ref.dtype)


def _head_spec(h, n, hd):
    return pl.BlockSpec((1, h, n, hd), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _row_spec(n, d):
    return pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _bias_spec(n):
    return pl.BlockSpec((1, 8, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _g_size(heads: int, n: int) -> int:
    """Heads per grid-cell group. All heads at once measured fastest at the
    N=208 headline shape (G=12 1358.9 img/s vs G=6 1355.8 vs G=4 1346.1),
    but the backward holds ~4 score-sized [G, N, N] f32 tensors per cell, so
    G is capped so those fit the (raised) VMEM budget at larger N. The env
    override walks down to the nearest divisor; a non-integer value falls
    back to the default rather than crashing at trace time."""
    import os

    try:
        pref = int(os.environ.get("NEXTGEN_UIA_ATTNO_G", str(heads)))
    except ValueError:
        pref = heads
    budget = 4 * 1024 * 1024                    # per score-tensor, f32
    cap = max(1, budget // max(n * n * 4, 1))
    for g in range(min(pref, heads, cap), 0, -1):
        if heads % g == 0:
            return g
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def _fused(q, k, v, x, wo, bo, gamma, beta, bias, heads, n_real, causal,
           post_ln, ln_eps):
    return _fwd_impl(q, k, v, x, wo, bo, gamma, beta, bias, heads, n_real,
                     causal, post_ln, ln_eps)


def _fwd_impl(q, k, v, x, wo, bo, gamma, beta, bias, heads, n_real, causal,
              post_ln=False, ln_eps=1e-12):
    b, h, n, hd = q.shape
    d = h * hd
    gs = _g_size(heads, n)
    scale = 1.0 / (hd ** 0.5)
    vec = pl.BlockSpec((8, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [_head_spec(h, n, hd)] * 3 + [_row_spec(n, d),
                pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                vec, vec, vec]
    args = [q, k, v, x, wo, _tile8(bo), _tile8(gamma), _tile8(beta)]
    if bias is not None:
        in_specs.append(_bias_spec(n))
        args.append(jnp.broadcast_to(bias.astype(jnp.float32)[:, None, :],
                                     (b, 8, n)))
        kernel = functools.partial(_fwd_kernel, heads=heads, g_size=gs,
                                   scale=scale, n_real=n_real, causal=causal,
                                   post_ln=post_ln, ln_eps=ln_eps)
    else:
        def kernel(qr, kr, vr, xr, wor, bor, gr_, br_, orf):
            _fwd_kernel(qr, kr, vr, xr, wor, bor, gr_, br_, None, orf,
                        heads=heads, g_size=gs, scale=scale, n_real=n_real,
                        causal=causal, post_ln=post_ln, ln_eps=ln_eps)
    return pl.pallas_call(
        kernel, grid=(b,), in_specs=in_specs, out_specs=_row_spec(n, d),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(*args)


def _xla_reference(q, k, v, x, wo, bo, gamma, beta, bias, heads, n_real,
                   causal, post_ln, ln_eps):
    """Plain-XLA recomposition of the kernel math (used only to derive the
    post-LN backward, which the frozen text path never actually traces)."""
    b, h, n, hd = q.shape
    d = h * hd
    s = jnp.einsum("bhqe,bhke->bhqk", q, k,
                   preferred_element_type=jnp.float32) / (hd ** 0.5)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
    s = jnp.where(col >= n_real, NEG_INF, s)
    if bias is not None:
        s = s + bias.astype(jnp.float32)[:, None, None, :]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col > row, NEG_INF, s)
    p = jax.nn.softmax(s, axis=-1)
    oh = jnp.einsum("bhqk,bhke->bhqe", p.astype(v.dtype), v,
                    preferred_element_type=jnp.float32)
    cat = oh.transpose(0, 2, 1, 3).reshape(b, n, d).astype(x.dtype)
    y = cat.astype(jnp.float32) @ wo.astype(jnp.float32) + bo[None, None, :]
    y = y + x.astype(jnp.float32)
    if post_ln:
        mu = y.mean(-1, keepdims=True)
        var = ((y - mu) ** 2).mean(-1, keepdims=True)
        y = (y - mu) * jax.lax.rsqrt(var + ln_eps) * gamma + beta
    return y.astype(x.dtype)


def _fwd_rule(q, k, v, x, wo, bo, gamma, beta, bias, heads, n_real, causal,
              post_ln, ln_eps):
    out = _fwd_impl(q, k, v, x, wo, bo, gamma, beta, bias, heads, n_real,
                    causal, post_ln, ln_eps)
    return out, (q, k, v, x, wo, bo, gamma, beta, bias)


def _bwd_rule(heads, n_real, causal, post_ln, ln_eps, res, g):
    q, k, v, x, wo, bo, gamma, beta, bias = res
    if post_ln:
        # correctness-only: the post-LN variant serves the frozen in-step
        # text tower, which is never differentiated (no trainable inputs);
        # if it ever is, fall back to exact XLA recomposition
        _, vjp = jax.vjp(
            lambda q_, k_, v_, x_: _xla_reference(
                q_, k_, v_, x_, wo, bo, gamma, beta, bias, heads, n_real,
                causal, post_ln, ln_eps), q, k, v, x)
        dq, dk, dv, dx = vjp(g)
        zb = jnp.zeros_like(bias) if bias is not None else None
        return (dq, dk, dv, dx, jnp.zeros_like(wo), jnp.zeros_like(bo),
                jnp.zeros_like(gamma), jnp.zeros_like(beta), zb)
    b, h, n, hd = q.shape
    d = h * hd
    gs = _g_size(heads, n)
    scale = 1.0 / (hd ** 0.5)
    in_specs = [_head_spec(h, n, hd)] * 3 + [
        pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM)]
    args = [q, k, v, wo]
    if bias is not None:
        in_specs.append(_bias_spec(n))
        args.append(jnp.broadcast_to(bias.astype(jnp.float32)[:, None, :],
                                     (b, 8, n)))
        kernel = functools.partial(_bwd_kernel, heads=heads, g_size=gs,
                                   scale=scale, n_real=n_real, causal=causal)
    else:
        def kernel(qr, kr, vr, wor, gr, dqr, dkr, dvr):
            _bwd_kernel(qr, kr, vr, wor, None, gr, dqr, dkr, dvr, heads=heads,
                        g_size=gs, scale=scale, n_real=n_real, causal=causal)
    in_specs.append(_row_spec(n, d))
    args.append(g)
    hs = _head_spec(h, n, hd)
    dq, dk, dv = pl.pallas_call(
        kernel, grid=(b,), in_specs=in_specs, out_specs=(hs,) * 3,
        out_shape=(jax.ShapeDtypeStruct((b, h, n, hd), q.dtype),) * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(*args)
    dbias = jnp.zeros_like(bias) if bias is not None else None
    # residual: d(x) = g exactly; frozen Wo/bo get structural zeros
    return (dq, dk, dv, g, jnp.zeros_like(wo), jnp.zeros_like(bo),
            jnp.zeros_like(gamma), jnp.zeros_like(beta), dbias)


_fused.defvjp(_fwd_rule, _bwd_rule)


def fused_attn_o_residual(q, k, v, x, o_params, *, heads: int, bias=None,
                          n_real: int | None = None, causal: bool = False,
                          post_ln=None, ln_eps: float = 1e-12):
    """(q,k,v [B,H,N,dh], x [B,N,D]) -> x + Wo(attention(q,k,v)) + bo,
    optionally LayerNormed (``post_ln`` = LN params dict — the BERT post-norm
    epilogue; the pre-LN sum never leaves VMEM).

    Frozen-Wo contract (see module docstring). bias: optional additive [B, N]
    key-padding mask (constant — no dbias). n_real: number of real (unpadded)
    keys; defaults to N. Returns None when ineligible.
    """
    b, h, n, hd = q.shape
    d = h * hd
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    if n % sub or d % 128 or "b" not in o_params:
        return None
    has_ln = post_ln is not None
    # pre-norm callers ship constant ones/zeros so both layouts share one
    # kernel signature + VJP; the dead operands are two 8xD f32 tiles
    # (~48 KB/call, const-folded by XLA) — far below measurement noise
    gamma = (post_ln["scale"] if has_ln else jnp.ones((d,))).astype(jnp.float32)
    beta = (post_ln["bias"] if has_ln else jnp.zeros((d,))).astype(jnp.float32)
    return _fused(q, k, v, x,
                  o_params["w"].astype(x.dtype),
                  o_params["b"].astype(jnp.float32),
                  gamma, beta,
                  bias, heads, n_real if n_real is not None else n, causal,
                  has_ln, ln_eps)

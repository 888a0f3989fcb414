"""Pallas flash attention for the short-sequence ViT/BERT regime.

Motivation: XLA's unfused attention materializes the [B, H, N, N] f32 score
tensor in HBM — for ViT-B/16 at batch 64 that is ~1.2 GB of softmax traffic
per layer pass. At N<=512 the score matrix for a group of heads fits in VMEM,
so no online-softmax tiling is needed: grid over (batch, head-group), one
shot per cell, scores never leave VMEM.

Long-N regime (512 < N <= ~2048, i.e. DINOv2 at 518 px = 1370 tokens): same
one-shot design with ONE head per grid cell and a raised scoped-vmem ceiling
(the 16 MB limit is a compiler default; one 1376^2 f32 score buffer is
7.6 MB, and v5e VMEM is ~128 MB). Still no online softmax: the whole row
block fits, so the extra max/rescale passes of a tiled flash would only add
VPU work. Beyond ~2048 tokens a KV-tiled kernel would be needed — no model
in this framework runs there (nn/attention.py routes those to einsum).

Layout: inputs [B, N, H, D] are transposed/padded once to [B, H, Np, D]; the
kernel processes G=4 heads per grid cell via batched dot_general (VMEM for
the backward pass: ~4 score-sized f32 buffers * G = ~3.5 MB at Np=256).
Padded *keys* are masked with -inf in-kernel (static pad width); padded query
rows are sliced off by the wrapper. Optional additive bias [B, N] covers BERT
padding masks; ``causal=True`` covers the CLIP text tower.

Backward is a recompute-p flash backward kernel wired through jax.custom_vjp.
Numerical contract: scores and softmax in f32, outputs cast to input dtype;
verified against the einsum reference in tests/test_flash_attention.py.
Runs in interpreter mode on CPU so the same code path is testable off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _pad_len(n: int, dtype) -> int:
    tile = 16 if dtype == jnp.bfloat16 else 8
    base = ((n + tile - 1) // tile) * tile
    return max(base, 128)


def _scores(q, k, bias_row, *, scale, n, causal):
    """[G, Np, D] x [G, Np, D] -> masked softmax probs [G, Np, Np] (f32)."""
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col >= n, NEG_INF, s)
    if bias_row is not None:
        s = s + bias_row[None, None, :]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col > row, NEG_INF, s)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, n, causal):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]  # [G, Np, D]
    bias_row = bias_ref[0, 0] if bias_ref is not None else None
    p = _scores(q, k, bias_row, scale=scale, n=n, causal=causal)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref, dq_ref, dk_ref, dv_ref,
                dbias_ref, *, scale, n, causal):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    g = g_ref[0]
    bias_row = bias_ref[0, 0] if bias_ref is not None else None
    p = _scores(q, k, bias_row, scale=scale, n=n, causal=causal)  # [G, Np, Np]

    # Matmul operands stay in the INPUT dtype (bf16 in production): the MXU
    # runs bf16 contractions at full rate while f32 ones cost ~3x. Softmax
    # stats, ds, and all accumulations remain f32. With f32 inputs the math
    # is bit-identical to the reference einsum backward (golden tests).
    dv = jax.lax.dot_general(p.astype(q.dtype), g, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)  # [G, Np, D]
    dp = jax.lax.dot_general(g, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)  # [G, Np, Np]
    # ds_raw = d(loss)/d(pre-softmax logits); bias enters the logits with
    # coefficient 1, q·k with coefficient `scale`
    ds_raw = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = (ds_raw * scale).astype(q.dtype)
    dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)
    if dbias_ref is not None:
        # bias is broadcast over heads and query rows; its cotangent is the
        # sum of ds_raw over both. Head groups revisit the same output block
        # (index map drops the gi grid axis), so accumulate across grid steps.
        @pl.when(pl.program_id(1) == 0)
        def _init():
            dbias_ref[...] = jnp.zeros(dbias_ref.shape, dbias_ref.dtype)

        db = jnp.sum(ds_raw, axis=(0, 1))  # [Np]
        row = jax.lax.broadcasted_iota(jnp.int32, (8, db.shape[0]), 0)
        dbias_ref[0] += jnp.where(row == 0, db[None, :], 0.0).astype(dbias_ref.dtype)


def _group_size(h: int, np_: int) -> int:
    import os

    pref = int(os.environ.get("NEXTGEN_UIA_FLASH_G", "4"))
    if np_ > 512:
        # long-sequence regime (DINOv2 @ 518 px = 1370 tokens): ONE f32
        # score buffer is already ~7.6 MB — one head per grid cell, with a
        # raised scoped-vmem ceiling (_compiler_params). Still VMEM-resident:
        # the einsum path streams ~5.8 GB of softmax traffic per layer at
        # batch 32 through an ~89 GB/s HBM (PERF.md round 4).
        pref = 1
    for g in range(min(pref, h), 0, -1):
        if h % g == 0:
            return g
    return 1


def _compiler_params(g: int, np_: int, *, bwd: bool) -> dict:
    """Raise the scoped-vmem ceiling for the long-N regime. The 16 MB limit
    is a compiler default, not the hardware's (~128 MB on v5e); the forward
    holds ~2 score-sized f32 buffers per cell, the backward ~3 plus operand
    copies."""
    score_mb = g * np_ * np_ * 4 / (1024 * 1024)
    if np_ <= 512:
        return {}
    limit = int((4 if bwd else 2.5) * score_mb) + 8
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=limit * 1024 * 1024)}


def _build_specs(b, h, g, np_, d, with_bias):
    """Grid (B, H//G); qkv blocks [1, G, Np, D] from [B, H, Np, D] input."""
    qkv = pl.BlockSpec((1, g, np_, d), lambda bi, gi: (bi, gi, 0, 0),
                       memory_space=pltpu.VMEM)
    specs = [qkv] * 3
    if with_bias:
        # bias ships as [B, 8, Np] (sublane-tiled broadcast) to satisfy the
        # (8, 128) min-tile constraint; kernels read row [0, 0]
        specs.append(pl.BlockSpec((1, 8, np_), lambda bi, gi: (bi, 0, 0),
                                  memory_space=pltpu.VMEM))
    return (b, h // g), specs, qkv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, bias, causal, n, bias_grad):
    return _flash_fwd_impl(q, k, v, bias, causal, n)


def _flash_fwd_impl(q, k, v, bias, causal, n):
    b, h, np_, d = q.shape
    g = _group_size(h, np_)
    scale = 1.0 / (d ** 0.5)
    grid, in_specs, out_spec = _build_specs(b, h, g, np_, d, bias is not None)
    if bias is None:
        def kernel(qr, kr, vr, orf):
            _fwd_kernel(qr, kr, vr, None, orf, scale=scale, n=n, causal=causal)
    else:
        kernel = functools.partial(_fwd_kernel, scale=scale, n=n, causal=causal)
    args = (q, k, v) + ((bias,) if bias is not None else ())
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, np_, d), q.dtype),
        interpret=_should_interpret(),
        **_compiler_params(g, np_, bwd=False),
    )(*args)


def _flash_fwd_rule(q, k, v, bias, causal, n, bias_grad):
    return _flash_fwd_impl(q, k, v, bias, causal, n), (q, k, v, bias)


def _flash_bwd_rule(causal, n, bias_grad, res, grad):
    q, k, v, bias = res
    b, h, np_, d = q.shape
    g = _group_size(h, np_)
    scale = 1.0 / (d ** 0.5)
    grid, in_specs, qkv_spec = _build_specs(b, h, g, np_, d, bias is not None)
    in_specs = in_specs + [qkv_spec]  # grad input
    with_dbias = bias is not None and bias_grad
    if bias is None:
        def kernel(qr, kr, vr, gr, dqr, dkr, dvr):
            _bwd_kernel(qr, kr, vr, None, gr, dqr, dkr, dvr, None,
                        scale=scale, n=n, causal=causal)
    elif not with_dbias:
        # constant masks (the common case): skip the dbias accumulation —
        # the grid-revisited output block would serialize the pipeline
        def kernel(qr, kr, vr, br, gr, dqr, dkr, dvr):
            _bwd_kernel(qr, kr, vr, br, gr, dqr, dkr, dvr, None,
                        scale=scale, n=n, causal=causal)
    else:
        kernel = functools.partial(_bwd_kernel, scale=scale, n=n, causal=causal)
    if with_dbias:
        dbias_spec = pl.BlockSpec((1, 8, np_), lambda bi, gi: (bi, 0, 0),
                                  memory_space=pltpu.VMEM)
        out_specs = (qkv_spec,) * 3 + (dbias_spec,)
        out_shape = (jax.ShapeDtypeStruct((b, h, np_, d), q.dtype),) * 3 + (
            jax.ShapeDtypeStruct((b, 8, np_), jnp.float32),)
    else:
        out_specs = (qkv_spec,) * 3
        out_shape = (jax.ShapeDtypeStruct((b, h, np_, d), q.dtype),) * 3
    args = (q, k, v) + ((bias,) if bias is not None else ()) + (grad,)
    outs = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_should_interpret(),
        **_compiler_params(g, np_, bwd=True),
    )(*args)
    if with_dbias:
        dq, dk, dv, dbias = outs
        dbias = dbias.astype(bias.dtype)
    else:
        dq, dk, dv = outs[:3]
        dbias = jnp.zeros_like(bias) if bias is not None else None
    return dq, dk, dv, dbias


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def _should_interpret() -> bool:
    return jax.default_backend() == "cpu"


def flash_attention(q, k, v, *, bias=None, causal: bool = False,
                    layout: str = "bnhd", bias_grad: bool = True):
    """Attention with scores kept in VMEM.

    layout 'bnhd': q,k,v [B, N, H, D] (transposed internally).
    layout 'bhnd': q,k,v [B, H, N, D] — preferred; lets the caller produce the
      head-major layout directly from the projection einsum so no explicit
      transpose copies hit HBM. Output matches the input layout.
    bias: optional additive [B, N] (key padding). Differentiable when
      bias_grad=True (default): the backward kernel accumulates d(bias) =
      sum of pre-softmax-logit cotangents over heads and query rows, so
      learnable additive biases train correctly. Pass bias_grad=False for
      constant masks (padding) — it returns a zero dbias and skips the
      grid-revisited accumulation, which costs pipeline overlap.
    """
    if layout == "bnhd":
        b, nq, h, d = q.shape
    else:
        b, h, nq, d = q.shape
    np_ = _pad_len(nq, q.dtype)
    pad = np_ - nq

    def prep(x):
        if layout == "bnhd":
            x = jnp.moveaxis(x, 2, 1)  # [B, H, N, D]
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x

    bias_f = None
    if bias is not None:
        bias_f = jnp.pad(bias.astype(jnp.float32), ((0, 0), (0, pad)))
        bias_f = jnp.broadcast_to(bias_f[:, None, :], (b, 8, np_))
    out = _flash(prep(q), prep(k), prep(v), bias_f, causal, nq, bias_grad)
    out = out[:, :, :nq, :]
    if layout == "bnhd":
        out = jnp.moveaxis(out, 1, 2)
    return out

"""Pallas per-sample depthwise 7x7 conv for MONA's noise-aware variants.

The reference applies three depthwise convs (3/5/7) weighted by per-sample
softmax weights (mona.py:401-424). We fold them into ONE per-sample 7x7
kernel (exact under zero padding — adapters/mona.py), which XLA can only
express as a batch-in-channels grouped conv (feature_group_count = B*C).
That lowering is poor on TPU (profiled ~3.8 ms/step forward+backward at
B=64, C=64). Here the conv runs as a Pallas kernel instead: grid over the
batch, each cell holds the sample's [14,14,C] map in VMEM and accumulates 49
shifted multiply-adds (VPU work, one [C]-lane weight vector per tap) — no
grouped-conv lowering at all.

Backward (custom VJP): dx is the same stencil with the spatially-flipped
kernel; dk[tap] = sum over the valid window of g * x_shifted. Both run in one
Pallas call reading g and x once.

Numerics: accumulation in f32, outputs cast to the input dtype. Interpreter
mode on CPU keeps the path testable off-TPU
(tests/test_dwconv.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 7
HALO = K // 2


def _should_interpret() -> bool:
    return jax.default_backend() == "cpu"


# Mosaic (this toolchain) hard-aborts lowering the backward stencil when a
# spatial dim is 4 (lower_to_llo.cc "d >> 32 == 0 (-1 vs 0)"); tiny debug
# towers hit this (64px/16 -> 4x4 grid). Zero-padding H/W up to MIN_HW and
# slicing back is EXACT for every in/out tensor: the conv is 'SAME' with
# zero padding, so extending x (and g) with zeros reproduces the original
# boundary condition, and the extra output positions contribute g=0 to all
# gradient reductions.
MIN_HW = 8


def _pad_hw(a, h, w, ph, pw):
    """Zero-pad a [B, h, w, C] array's spatial dims to [B, ph, pw, C]."""
    if (ph, pw) == (h, w):
        return a
    return jnp.pad(a, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))


def _target_hw(h, w):
    return max(h, MIN_HW) if h < 5 else h, max(w, MIN_HW) if w < 5 else w


def _fwd_kernel(x_ref, k_ref, o_ref, *, h, w):
    x = x_ref[0].astype(jnp.float32)          # [h, w, C]
    kk = k_ref[0].astype(jnp.float32)         # [K, K, C]
    xp = jnp.pad(x, ((HALO, HALO), (HALO, HALO), (0, 0)))
    acc = jnp.zeros_like(x)
    for di in range(K):
        for dj in range(K):
            win = jax.lax.slice(xp, (di, dj, 0), (di + h, dj + w, x.shape[-1]))
            acc = acc + win * kk[di, dj][None, None, :]
    o_ref[0] = acc.astype(o_ref.dtype)


def _bwd_kernel(x_ref, k_ref, g_ref, dx_ref, dk_ref, *, h, w):
    x = x_ref[0].astype(jnp.float32)
    kk = k_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    gp = jnp.pad(g, ((HALO, HALO), (HALO, HALO), (0, 0)))
    xp = jnp.pad(x, ((HALO, HALO), (HALO, HALO), (0, 0)))
    c = x.shape[-1]

    dx = jnp.zeros_like(x)
    dks = []
    for di in range(K):
        row = []
        for dj in range(K):
            gwin = jax.lax.slice(gp, (K - 1 - di, K - 1 - dj, 0),
                                 (K - 1 - di + h, K - 1 - dj + w, c))
            dx = dx + gwin * kk[di, dj][None, None, :]
            xwin = jax.lax.slice(xp, (di, dj, 0), (di + h, dj + w, c))
            row.append(jnp.sum(g * xwin, axis=(0, 1)))  # [C]
        dks.append(jnp.stack(row))                       # [K, C]
    dx_ref[0] = dx.astype(dx_ref.dtype)
    dk_ref[0] = jnp.stack(dks).astype(dk_ref.dtype)      # [K, K, C]


@jax.custom_vjp
def dwconv7_per_sample(x, kernels):
    """Per-sample depthwise 7x7 'SAME' conv.

    x: [B, h, w, C]; kernels: [B, 7, 7, C] (one kernel per sample+channel).
    Returns [B, h, w, C]. Matches the batch-in-channels XLA formulation
    (adapters/mona.py::_dwconv7_per_sample) bit-for-bit in f32.
    """
    return _dwconv_fwd_impl(x, kernels)


def _dwconv_fwd_impl(x, kernels):
    b, h, w, c = x.shape
    ph, pw = _target_hw(h, w)
    xp = _pad_hw(x, h, w, ph, pw)
    spec_x = pl.BlockSpec((1, ph, pw, c), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, K, K, c), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, h=ph, w=pw),
        grid=(b,), in_specs=[spec_x, spec_k], out_specs=spec_x,
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        interpret=_should_interpret(),
    )(xp, kernels)
    return out[:, :h, :w, :]


def _dwconv_fwd_rule(x, kernels):
    return _dwconv_fwd_impl(x, kernels), (x, kernels)


def _dwconv_bwd_rule(res, g):
    x, kernels = res
    b, h, w, c = x.shape
    ph, pw = _target_hw(h, w)
    xp = _pad_hw(x, h, w, ph, pw)
    gp = _pad_hw(g, h, w, ph, pw)
    spec_x = pl.BlockSpec((1, ph, pw, c), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, K, K, c), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    dx, dk = pl.pallas_call(
        functools.partial(_bwd_kernel, h=ph, w=pw),
        grid=(b,), in_specs=[spec_x, spec_k, spec_x],
        out_specs=(spec_x, spec_k),
        out_shape=(jax.ShapeDtypeStruct(xp.shape, x.dtype),
                   jax.ShapeDtypeStruct(kernels.shape, jnp.float32)),
        interpret=_should_interpret(),
    )(xp, kernels, gp)
    return dx[:, :h, :w, :], dk.astype(kernels.dtype)


dwconv7_per_sample.defvjp(_dwconv_fwd_rule, _dwconv_bwd_rule)


# ---------------------------------------------------------------------------
# Fused MONA spatial op: y = dwconv7(s * freq) + bias + s
# ---------------------------------------------------------------------------


def _mona_fwd_kernel(s_ref, f_ref, k_ref, b_ref, o_ref, *, h, w):
    s = s_ref[0].astype(jnp.float32)               # [h, w, C]
    freq = f_ref[0].astype(jnp.float32)            # [C]
    kk = k_ref[0].astype(jnp.float32)              # [K, K, C]
    bias = b_ref[0, 0].astype(jnp.float32)         # [C]
    u = s * freq[None, None, :]
    up = jnp.pad(u, ((HALO, HALO), (HALO, HALO), (0, 0)))
    acc = s + bias[None, None, :]
    for di in range(K):
        for dj in range(K):
            win = jax.lax.slice(up, (di, dj, 0), (di + h, dj + w, s.shape[-1]))
            acc = acc + win * kk[di, dj][None, None, :]
    o_ref[0] = acc.astype(o_ref.dtype)


def _mona_bwd_kernel(s_ref, f_ref, k_ref, g_ref, ds_ref, dk_ref, df_ref, db_ref,
                     *, h, w):
    s = s_ref[0].astype(jnp.float32)
    freq = f_ref[0].astype(jnp.float32)
    kk = k_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    c = s.shape[-1]
    u = s * freq[None, None, :]
    up = jnp.pad(u, ((HALO, HALO), (HALO, HALO), (0, 0)))
    gp = jnp.pad(g, ((HALO, HALO), (HALO, HALO), (0, 0)))

    du = jnp.zeros_like(s)  # d(loss)/d(u), u = s*freq (conv input)
    dks = []
    for di in range(K):
        row = []
        for dj in range(K):
            gwin = jax.lax.slice(gp, (K - 1 - di, K - 1 - dj, 0),
                                 (K - 1 - di + h, K - 1 - dj + w, c))
            du = du + gwin * kk[di, dj][None, None, :]
            uwin = jax.lax.slice(up, (di, dj, 0), (di + h, dj + w, c))
            row.append(jnp.sum(g * uwin, axis=(0, 1)))
        dks.append(jnp.stack(row))
    # y = conv(u) + bias + s  ->  ds = freq*du + g; per-sample partials for
    # the shared freq go out as [C] rows and are summed outside the kernel
    ds_ref[0] = (freq[None, None, :] * du + g).astype(ds_ref.dtype)
    dk_ref[0] = jnp.stack(dks).astype(dk_ref.dtype)
    df_ref[0, 0] = jnp.sum(s * du, axis=(0, 1)).astype(df_ref.dtype)
    db_ref[0, 0] = jnp.sum(g, axis=(0, 1)).astype(db_ref.dtype)


@jax.custom_vjp
def mona_spatial(s, freq, kernels, bias):
    """Fused MONA spatial chain: ``dwconv7(s * freq) + bias + s`` in one
    Pallas pass (the freq-filter identity, folded depthwise conv, folded
    branch bias, and residual identity of adapters/mona._mona_op).

    s: [B, h, w, C]; freq: [C]; kernels: [B, 7, 7, C]; bias: [B, C].
    Shared-kernel variants broadcast kernels/bias over B outside — autodiff
    of the broadcast sums their grads, so no in-kernel accumulation (and no
    grid-serializing revisited output blocks) is ever needed.
    """
    return _mona_fwd_impl(s, freq, kernels, bias)


def _row2d(v):
    return v.reshape(1, -1)


def _mona_specs(b, h, w, c):
    sp = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                      memory_space=pltpu.VMEM)
    kp = pl.BlockSpec((1, K, K, c), lambda i: (i, 0, 0, 0),
                      memory_space=pltpu.VMEM)
    fp = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bp = pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return sp, kp, fp, bp


def _mona_fwd_impl(s, freq, kernels, bias):
    b, h, w, c = s.shape
    ph, pw = _target_hw(h, w)
    spd = _pad_hw(s, h, w, ph, pw)
    sp, kp, fp, bp = _mona_specs(b, ph, pw, c)
    out = pl.pallas_call(
        functools.partial(_mona_fwd_kernel, h=ph, w=pw),
        grid=(b,), in_specs=[sp, fp, kp, bp],
        out_specs=sp,
        out_shape=jax.ShapeDtypeStruct(spd.shape, s.dtype),
        interpret=_should_interpret(),
    )(spd, _row2d(freq), kernels, bias[:, None, :])
    return out[:, :h, :w, :]


def _mona_fwd_rule(s, freq, kernels, bias):
    return _mona_fwd_impl(s, freq, kernels, bias), (s, freq, kernels)


def _mona_bwd_rule(res, g):
    s, freq, kernels = res
    b, h, w, c = s.shape
    ph, pw = _target_hw(h, w)
    spd = _pad_hw(s, h, w, ph, pw)
    gpd = _pad_hw(g, h, w, ph, pw)
    sp, kp, fp, bp = _mona_specs(b, ph, pw, c)
    dfp = pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ds, dk, df_part, db_part = pl.pallas_call(
        functools.partial(_mona_bwd_kernel, h=ph, w=pw),
        grid=(b,), in_specs=[sp, fp, kp, sp],
        out_specs=(sp, kp, dfp, dfp),
        out_shape=(jax.ShapeDtypeStruct(spd.shape, s.dtype),
                   jax.ShapeDtypeStruct(kernels.shape, jnp.float32),
                   jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, 1, c), jnp.float32)),
        interpret=_should_interpret(),
    )(spd, _row2d(freq), kernels, gpd)
    ds = ds[:, :h, :w, :]
    dfreq = jnp.sum(df_part[:, 0, :], axis=0).astype(freq.dtype)
    dbias = db_part[:, 0, :]
    return ds, dfreq, dk.astype(kernels.dtype), dbias


mona_spatial.defvjp(_mona_fwd_rule, _mona_bwd_rule)

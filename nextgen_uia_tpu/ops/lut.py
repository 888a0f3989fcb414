"""256-entry LUT application + histogram via a 16x16 factorization.

Why this exists: per-pixel table lookups and histograms are the dominant
compute of the on-device augmentation pipeline (equalize — the vmapped
switch evaluates its branch every slot). Plain ``lut[u8]`` gathers and
scatter-add histograms serialize on this TPU (151 ms/batch apply at
32x224^2, 32 ms/img hist — PERF.md round 4), and the XLA-friendly 256-wide
broadcast-compare-reduce forms still burn ~512 vector compares per pixel
(11.3 ms/application at 24x518^2). The reference does both inside PIL's C
loop on host workers (ImageOps.equalize,
/root/reference/src/datasets/classification.py:108-120).

The trick is a 16x16 factorization of the table. Split each byte
``u8 = 16*hi + lo`` and view the LUT as a matrix ``M[hi, lo]``. Then

    lut[u8(p)] = onehot16(hi(p))^T @ M @ onehot16(lo(p))
    hist[16*h+l] = sum_p onehot16(hi(p))[h] * onehot16(lo(p))[l]

and the expensive 256-class one-hot never exists: two 16-class one-hots per
pixel, an [N,16]@[16,16] contraction (apply) or a [16,N]x[N,16] contraction
(histogram) that ride the otherwise-idle MXU, and a 16-term masked sum.
The arithmetic is EXACT: one-hot entries are 0/1, LUT entries are integers
<= 255 and counts <= 2^24 (exactly representable in f32), and each sum has
exactly one non-zero term — bit-identical to the compare-reduce forms.

Round-5 adjudication (PERF.md, bench/smoke_aug518.py): the PLAIN-XLA
factorized forms (`lut_apply_fact`, `hist256_fact`) are the default on all
backends — 11.34 -> 1.94 ms/application at 24x518^2, full augment_batch
19.1 -> 6.0 ms @224^2 / 43.6 -> 30.5 ms @518^2. The hand-Pallas kernel
below implements the same apply factorization explicitly (pixels in lanes,
classes in sublanes, one MXU dot per 8192-pixel row); it measured EQUAL to
the XLA form (2.01 vs 1.94 micro; identical full-pipeline), so it stays
opt-in (NEXTGEN_UIA_LUT_KERNEL=1) as an A/B lever rather than default-on.
Interpret mode runs the same kernel on CPU for tests; `lut_apply_xla` is
the 256-wide compare-reduce kept as the exactness oracle.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# lanes per grid row: 64 native (8,128) tiles — one MXU dot per row covers
# 8192 pixels, and the pad waste at 224^2 (N=50176 -> 7 rows) stays <15%
_ROW = 8192


def _kernel(img_ref, lut_t_ref, out_ref, *, g: int):
    lut_t = lut_t_ref[...]
    # Mosaic's tpu.iota is integer-only; byte math stays int32 throughout
    cls = jax.lax.broadcasted_iota(jnp.int32, (16, _ROW), 0)
    # static row loop: Mosaic requires block sublane dims divisible by 8 (or
    # the full array dim), so the whole [G, ROW] image is one block (~1 MB
    # VMEM at 518^2) and each 8192-pixel row gets its own one-hot build +
    # MXU dot
    for s in range(g):
        row = img_ref[s:s + 1, :]  # [1, ROW] f32 in [0, 1]
        u8 = jnp.round(jnp.clip(row, 0.0, 1.0) * 255.0).astype(jnp.int32)
        hi = u8 >> 4
        lo = u8 & 15
        oh_hi = (jnp.broadcast_to(hi, (16, _ROW)) == cls).astype(jnp.float32)
        # R[l, p] = sum_h M[h, l] * oh_hi[h, p] = lut[16*hi(p) + l]
        r = jax.lax.dot_general(lut_t, oh_hi, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        oh_lo = jnp.broadcast_to(lo, (16, _ROW)) == cls
        out_ref[s:s + 1, :] = jnp.sum(jnp.where(oh_lo, r, 0.0), axis=0,
                                      keepdims=True)


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.jit
def _lut_apply_flat(flat, lut):
    n = flat.shape[0]
    g = -(-n // _ROW)
    x = jnp.pad(flat, (0, g * _ROW - n)).reshape(g, _ROW)
    lut_t = lut.astype(jnp.float32).reshape(16, 16).T  # [lo, hi]
    out = pl.pallas_call(
        functools.partial(_kernel, g=g),
        in_specs=[pl.BlockSpec((g, _ROW), lambda: (0, 0)),
                  pl.BlockSpec((16, 16), lambda: (0, 0))],
        out_specs=pl.BlockSpec((g, _ROW), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, _ROW), jnp.float32),
        interpret=_should_interpret(),
    )(x, lut_t)
    return out.reshape(-1)[:n]


def lut_apply(img01, lut):
    """Map ``round(img01 * 255)`` through a 256-entry table.

    img01: f32 array, any shape, values in [0, 1] (clipped).
    lut:   [256] integer-valued table (entries 0..255).
    Returns f32 of img01's shape holding ``lut[u8]`` (0..255 range — callers
    divide by 255 to return to the unit grid). Exact vs the compare-reduce
    form; see module docstring.
    """
    shape = img01.shape
    return _lut_apply_flat(img01.reshape(-1).astype(jnp.float32),
                           lut).reshape(shape)


def lut_apply_xla(img01, lut):
    """The fused compare-select-sum form (XLA fallback; PERF.md round 4)."""
    u8 = jnp.clip(jnp.round(img01 * 255.0), 0, 255).astype(jnp.int32)
    return jnp.sum(jnp.where(u8[..., None] == jnp.arange(256), lut, 0),
                   axis=-1).astype(jnp.float32)


def _split16(img01):
    """u8 = 16*hi + lo and the two [..., 16] one-hots (shared helper)."""
    u8 = jnp.clip(jnp.round(img01 * 255.0), 0, 255).astype(jnp.int32)
    cls = jnp.arange(16, dtype=jnp.int32)
    oh_hi = ((u8 >> 4)[..., None] == cls).astype(jnp.float32)
    oh_lo = ((u8 & 15)[..., None] == cls).astype(jnp.float32)
    return oh_hi, oh_lo


def lut_apply_fact(img01, lut):
    """16x16-factorized LUT apply in PLAIN XLA — same math as the Pallas
    kernel (module docstring) without the custom call:

        R = oh_hi @ M            # [..., 16] x [16, 16] -> [..., 16]
        out = sum(R * oh_lo, -1)

    Each sum has exactly one non-zero term (one-hot rows), M holds integers
    <= 255, so the result is BIT-identical to the compare-select-sum form
    while doing ~8x fewer vector compares (2x16 vs 256 per pixel) and riding
    the MXU for the table reconstruction. Works on every backend."""
    oh_hi, oh_lo = _split16(img01)
    m = lut.astype(jnp.float32).reshape(16, 16)
    r = jnp.einsum("...h,hl->...l", oh_hi, m)
    return jnp.sum(r * oh_lo, axis=-1)


def hist256_fact(img01):
    """[256] histogram of ``round(img01 * 255)`` via the same 16x16
    factorization: ``H[h, l] = sum_p oh_hi[p, h] * oh_lo[p, l]`` is ONE
    [16, N] x [N, 16] MXU contraction instead of a 256-wide compare-reduce.
    Counts are exact in f32 up to 2^24 pixels (518^2 = 268k). Returns i32,
    bit-identical to ``sum(u8 == arange(256))``."""
    oh_hi, oh_lo = _split16(img01)
    n = oh_hi.size // 16
    h = jnp.einsum("ph,pl->hl", oh_hi.reshape(n, 16), oh_lo.reshape(n, 16))
    return h.reshape(256).astype(jnp.int32)


@functools.lru_cache(maxsize=1)
def use_kernel() -> bool:
    """Opt-in (NEXTGEN_UIA_LUT_KERNEL=1, TPU backend only): the Pallas apply
    measured EQUAL to `lut_apply_fact` inside the full augmentation pipeline
    (PERF.md round 5 — the factorized XLA form already fuses and rides the
    MXU), so the simpler XLA form is the default and the kernel is kept for
    A/B and as a fallback lever."""
    if os.environ.get("NEXTGEN_UIA_LUT_KERNEL", "0") != "1":
        return False
    return jax.default_backend() == "tpu"

"""MONA adapters (4 variants), TPU-native.

Re-implements the behaviour of the reference's MONA family
(/root/reference/src/adapters/mona.py:75-487) as pure functions over explicit
parameter subtrees. Instead of monkey-patching ViT blocks at runtime
(mona.py:495-680), a MONA adapter is a declarative slot: constructing a ViT
with ``params['blocks'][i]['mona']`` present makes block *i* apply the adapter
after its residual MLP — injection is a pure function of the parameter tree
(see :func:`inject_mona`).

Math (all variants share the bottleneck): with input x [B, N, D],

    z  = LN(x) * gamma + x * gammax          (scaled-skip pre-norm)
    z  = z @ W_down                          (D -> c, c = 64)
    cls, s = split(z); s -> [B, h, w, c]
    s  = MonaOp(s)                           (variant-specific, below)
    z  = GELU(concat(cls, s)); dropout(0.1); z @ W_up
    out = x + z

MonaOp:
    baseline:      s' = (dw3(s) + dw5(s) + dw7(s)) / 3 + s;  s' + pw(s')
    noise_aware:   w = softmax(MLP(GAP(s))) in R^3;
                   s' = w1*dw3(s) + w2*dw5(s) + w3*dw7(s) + s;  s' + pw(s')
    freq_enhanced: f = irfft2(rfft2(s) * filter_c);
                   s' = (dw3(f)+dw5(f)+dw7(f))/3 + s;  s' + pw(s')
    hybrid:        f = irfft2(rfft2(s) * filter_c); w = softmax(MLP(GAP(f)));
                   s' = w1*dw3(f)+w2*dw5(f)+w3*dw7(f) + s;  s' + pw(s')

TPU-first optimisation: the three depthwise kernels are zero-embedded into a
single 7x7 depthwise kernel and applied as ONE conv — exact under zero
('SAME') padding. For the noise-aware variants the per-sample branch weights
fold into per-sample 7x7 kernels, applied with a batch-in-channels grouped
conv so the whole batch still runs as one XLA conv op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.layers import conv_init, dropout, gelu, layernorm, layernorm_init, linear, linear_init

import os

VARIANTS = ("baseline", "noise_aware", "freq_enhanced", "hybrid")
_HAS_FREQ = {"freq_enhanced", "hybrid"}
_HAS_NOISE = {"noise_aware", "hybrid"}
# noise-aware conv strategy: 'per_sample' (folded per-sample kernels, one
# mega-grouped conv) or 'weighted' (shared 3-tap conv + per-sample reduce)
_NOISE_CONV_MODE = os.environ.get("NEXTGEN_UIA_MONA_CONV", "per_sample")


def mona_init(rng, dim: int, bottleneck: int = 64, variant: str = "hybrid"):
    if variant not in VARIANTS:
        raise ValueError(f"Unknown MONA variant: {variant!r}; choose from {VARIANTS}")
    ks = jax.random.split(rng, 8)
    c = bottleneck
    p = {
        "norm": layernorm_init(dim),
        "gamma": jnp.full((dim,), 1e-6, jnp.float32),
        "gammax": jnp.ones((dim,), jnp.float32),
        "down": linear_init(ks[0], dim, c),
        "up": linear_init(ks[1], c, dim),
        "conv3": conv_init(ks[2], 3, 3, c, c, groups=c),
        "conv5": conv_init(ks[3], 5, 5, c, c, groups=c),
        "conv7": conv_init(ks[4], 7, 7, c, c, groups=c),
        "pw": conv_init(ks[5], 1, 1, c, c),
    }
    if variant in _HAS_FREQ:
        p["freq_filter"] = jnp.ones((c,), jnp.float32)
    if variant in _HAS_NOISE:
        p["noise_est"] = {
            "fc1": linear_init(ks[6], c, c // 4),
            "fc2": linear_init(ks[7], c // 4, 3),
        }
    return p


def _embed_k(w, size: int = 7):
    """Zero-embed a [k,k,1,C] depthwise kernel into [size,size,1,C]."""
    k = w.shape[0]
    pad = (size - k) // 2
    return jnp.pad(w, ((pad, pad), (pad, pad), (0, 0), (0, 0)))


def _dwconv7(x, kernel):
    """Shared-kernel depthwise 7x7 conv; x [B,h,w,C], kernel [7,7,1,C]."""
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME", feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _dwconv7_per_sample(x, kernels):
    """Per-sample depthwise conv.

    x [B,h,w,C], kernels [B,7,7,1,C]. On TPU this runs as a Pallas stencil
    kernel (ops/dwconv.py) — XLA's only formulation is a batch-in-channels
    grouped conv (B*C groups), which lowers poorly (~3.8 ms/step profiled).
    Elsewhere: fold batch into channels so one grouped conv covers the batch:
    [1,h,w,B*C] with B*C groups.
    """
    b, h, w, c = x.shape
    if jax.default_backend() == "tpu":
        from ..ops.dwconv import dwconv7_per_sample

        return dwconv7_per_sample(x, kernels[:, :, :, 0, :])
    xf = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, h, w, b * c)
    kf = jnp.transpose(kernels[:, :, :, 0, :], (1, 2, 0, 3)).reshape(7, 7, 1, b * c)
    y = jax.lax.conv_general_dilated(
        xf, kf, (1, 1), "SAME", feature_group_count=b * c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jnp.transpose(y.reshape(h, w, b, c), (2, 0, 1, 3))


def _mona_op(p, s, variant: str):
    """Variant-specific spatial op on s [B,h,w,c] (reference mona.py:85-93,
    178-195, 279-295, 401-424)."""
    identity = s
    f = s
    if variant in _HAS_FREQ:
        # The reference computes irfft2(rfft2(s) * filter_c) with a PER-CHANNEL
        # scalar filter (mona.py:277,284-286): every frequency of channel c is
        # scaled by the same f_c, so by linearity the whole round trip equals
        # s * f_c exactly. We apply the algebraic identity — same math, same
        # gradients, no FFTs on the hot path (validated against the reference's
        # FFT formulation in tests/test_mona_parity.py).
        f = s * p["freq_filter"].astype(s.dtype)[None, None, None, :]

    k3, k5, k7 = _embed_k(p["conv3"]["w"]), _embed_k(p["conv5"]["w"]), _embed_k(p["conv7"]["w"])
    b3, b5, b7 = p["conv3"]["b"], p["conv5"]["b"], p["conv7"]["b"]

    if jax.default_backend() == "tpu":
        # fused Pallas spatial op: dwconv7(s * freq) + bias + s in one pass
        # (ops/dwconv.mona_spatial). freq folds in-kernel; the noise-MLP GAP
        # commutes with the freq scale (mean(s*f) = mean(s)*f), so the tiny
        # weight MLP runs on mean(s) directly.
        from ..ops.dwconv import mona_spatial

        b = s.shape[0]
        c = s.shape[-1]
        freq = (p["freq_filter"] if variant in _HAS_FREQ
                else jnp.ones((c,), jnp.float32))
        stacked_k = jnp.stack([k3[:, :, 0, :], k5[:, :, 0, :], k7[:, :, 0, :]])
        stacked_b = jnp.stack([b3, b5, b7])  # [3, c]
        if variant in _HAS_NOISE:
            pooled = jnp.mean(s.astype(jnp.float32), axis=(1, 2)) \
                * freq.astype(jnp.float32)[None, :]
            ne = p["noise_est"]
            wts = jax.nn.softmax(
                linear(ne["fc2"], jax.nn.relu(linear(ne["fc1"], pooled))), axis=-1)
            kernels = jnp.einsum("bs,shwc->bhwc", wts, stacked_k)
            bias = wts @ stacked_b
        else:
            kernels = jnp.broadcast_to(jnp.mean(stacked_k, axis=0)[None],
                                       (b, 7, 7, c))
            bias = jnp.broadcast_to(jnp.mean(stacked_b, axis=0)[None], (b, c))
        y = mona_spatial(s, freq.astype(s.dtype), kernels.astype(s.dtype),
                         bias.astype(s.dtype))
        pw = p["pw"]
        proj = jax.lax.conv_general_dilated(
            y, pw["w"].astype(y.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + pw["b"].astype(y.dtype)
        return y + proj

    if variant in _HAS_NOISE:
        pooled = jnp.mean(f.astype(jnp.float32), axis=(1, 2))  # [B, c]
        ne = p["noise_est"]
        wts = jax.nn.softmax(linear(ne["fc2"], jax.nn.relu(linear(ne["fc1"], pooled))), axis=-1)  # [B,3]
        if _NOISE_CONV_MODE == "per_sample":
            # fold per-sample branch weights into per-sample 7x7 kernels,
            # applied as ONE batch-in-channels grouped conv
            stacked_k = jnp.stack([k3, k5, k7], axis=0)  # [3,7,7,1,c]
            per_sample_k = jnp.einsum("bs,shwic->bhwic", wts, stacked_k).astype(f.dtype)
            stacked_b = jnp.stack([b3, b5, b7], axis=0)  # [3,c]
            per_sample_b = (wts @ stacked_b).astype(f.dtype)  # [B,c]
            y = _dwconv7_per_sample(f, per_sample_k) + per_sample_b[:, None, None, :]
        else:
            # shared-kernel convs + per-sample weighted sum (one conv with 3x
            # output channels via stacked kernels, then weighted reduce)
            c = f.shape[-1]
            # group-major ordering: out channel = ch*3 + tap
            kstack = jnp.stack([k3, k5, k7], axis=-1).reshape(7, 7, 1, 3 * c).astype(f.dtype)
            y3 = jax.lax.conv_general_dilated(
                f, kstack, (1, 1), "SAME", feature_group_count=c,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            # conv with groups=c and 3 outputs per group: output channel
            # layout is [c groups x 3 taps]
            y3 = y3.reshape(*y3.shape[:-1], c, 3)
            bstack = jnp.stack([b3, b5, b7], axis=-1).astype(f.dtype)  # [c, 3]
            y3 = y3 + bstack[None, None, None]
            y = jnp.einsum("bhwcs,bs->bhwc", y3, wts.astype(f.dtype))
    else:
        kernel = ((k3 + k5 + k7) / 3.0).astype(f.dtype)
        bias = ((b3 + b5 + b7) / 3.0).astype(f.dtype)
        y = _dwconv7(f, kernel) + bias

    y = y + identity
    pw = p["pw"]
    proj = jax.lax.conv_general_dilated(
        y, pw["w"].astype(y.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + pw["b"].astype(y.dtype)
    return y + proj


def mona_apply(p, x, hw, *, variant: str, rng=None, dropout_rate: float = 0.1):
    """Apply a MONA adapter to token sequence x [B, N, D].

    N = h*w + 1 (CLS first), or h*w (no CLS — mona.py:141-144), or
    h*w + 1 + pad (once-padded sequences: the trailing pad rows take the
    CLS path — channel mixing only, no spatial conv. Their values are
    attention-masked and sliced off downstream, so this only avoids the
    per-block slice+concat copies of re-packing to the real length)."""
    b, n, d = x.shape
    h, w = hw

    if (jax.default_backend() == "tpu"
            and os.environ.get("NEXTGEN_UIA_FUSED_MONA", "0") == "1"):
        # whole-adapter Pallas kernel (ops/fused_mona.py): identical math,
        # identical dropout stream (the mask is drawn here with the exact
        # jax.random call nn/layers.dropout would make). OPT-IN: measured
        # SLOWER than this composed path on v5e (PERF.md — the serial
        # per-cell stencil + projection chain loses to mona_spatial +
        # XLA-fused glue); kept for future iteration and as the reference
        # for the full-gradient kernel pattern.
        from ..ops.fused_mona import mona_block_fused

        mask = None
        if rng is not None and dropout_rate > 0.0:
            from ..nn.layers import dropout_mask

            c_bn = p["down"]["w"].shape[1]
            mask = dropout_mask(rng, dropout_rate, (b, n, c_bn))
        out = mona_block_fused(p, x, hw, variant=variant, mask=mask)
        if out is not None:
            return out
    z = layernorm(p["norm"], x) * p["gamma"].astype(x.dtype) + x * p["gammax"].astype(x.dtype)
    z = linear(p["down"], z, dtype=x.dtype)  # [B, N, c]
    c = z.shape[-1]

    if n >= h * w + 1:
        cls_tok, sp = z[:, :1, :], z[:, 1:1 + h * w, :]
        tail = z[:, 1 + h * w:, :]
        sp = sp.reshape(b, h, w, c)
        sp = _mona_op(p, sp, variant)
        z = jnp.concatenate([cls_tok, sp.reshape(b, h * w, c), tail], axis=1)
    else:  # no CLS token: whole sequence is spatial (mona.py:141-144)
        sp = z.reshape(b, h, w, c)
        sp = _mona_op(p, sp, variant)
        z = sp.reshape(b, n, c)

    z = gelu(z)
    z = dropout(rng, z, dropout_rate)
    z = linear(p["up"], z, dtype=x.dtype)
    return x + z


def inject_mona(rng, vit_params, *, dim: int, bottleneck: int = 64, variant: str = "hybrid",
                num_layers: int | None = None):
    """Return (new_vit_params, count): add a 'mona' slot to the first
    ``num_layers`` blocks (all when None), mirroring the reference's injection
    semantics (mona.py:578-680) without mutation."""
    blocks = vit_params["blocks"]
    n = len(blocks) if num_layers is None else min(num_layers, len(blocks))
    new_blocks = []
    for i, blk in enumerate(blocks):
        blk = dict(blk)
        if i < n:
            rng, sub = jax.random.split(rng)
            blk["mona"] = mona_init(sub, dim, bottleneck, variant)
        new_blocks.append(blk)
    out = dict(vit_params)
    out["blocks"] = new_blocks
    return out, n

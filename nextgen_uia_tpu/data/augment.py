"""On-device (XLA) batch augmentation.

TPU-native replacement for the reference's per-sample PIL pipeline
(/root/reference/src/datasets/classification.py:15-151): the whole batch is
augmented in one jitted function on device, overlapping with the previous
step's compute instead of burning host CPU in DataLoader workers.

Op inventory AND composition law match the reference's strong
(intensity-only) and weak (geometric, mask-paired) lists: k ~ U{0..n} ops
are sampled uniformly WITH replacement from the n-op list (identity
included) and applied sequentially, magnitudes resampled per application
(classification.py:128-151) — an op can hit the same image twice and
op-order interactions are reproduced. On device this is a ``lax.scan`` over
n op slots (inactive slots forced to the identity op) with a ``lax.switch``
per slot — static shapes, one traced slot body. Parity with PIL is
*statistical*, not bitwise (SURVEY.md §7 "hard parts" #4): each op is a
float re-derivation of its PIL counterpart (per-op parity bounds in
tests/test_retrieval_and_augment.py) and images round-trip through the
uint8 grid between ops exactly as PIL does.

All images are float32 in [0, 1], shape [B, H, W, 1] (grayscale); masks are
float32 {0,1} [B, H, W, 1].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Intensity ops (strong augs) — operate on [H, W, 1] floats in [0,1]
# ---------------------------------------------------------------------------


def _autocontrast(img):
    lo = jnp.min(img)
    hi = jnp.max(img)
    scale = jnp.where(hi > lo, 1.0 / (hi - lo), 1.0)
    return jnp.clip((img - lo) * scale, 0.0, 1.0)


def _equalize(img):
    """Histogram equalisation over 256 bins (PIL ImageOps.equalize semantics:
    LUT from the cumulative histogram with PIL's step offset).

    The histogram and the LUT application are the dominant compute of the
    whole augmentation pipeline (the vmapped switch evaluates this branch
    every slot; PERF.md round 5 knockout: ~23 ms of the 44 ms 518^2 batch-24
    bill). Per-pixel gathers/scatters serialize on TPU (151 ms/batch apply,
    32 ms/img scatter-add hist at 224^2 — PERF.md round 4), and the fused
    256-wide compare-reduce forms burn ~512 vector compares per pixel. Both
    stages therefore run as 16x16 factorizations (ops/lut.py): hi/lo nibble
    one-hots turn the histogram into ONE [16,N]x[N,16] MXU contraction and
    the apply into [N,16]@[16,16] + a 16-term masked sum — bit-identical
    (one non-zero term per sum, integer values exact in f32), ~8x fewer
    vector ops, and the contraction rides the otherwise-idle MXU.
    NEXTGEN_UIA_LUT_KERNEL=1 swaps the apply for the hand-Pallas kernel
    (measured equal to the factorized XLA form; kept for A/B)."""
    from ..ops import lut as lut_ops

    hist = lut_ops.hist256_fact(img)
    # PIL: step = (total - last_nonzero_bin_count) // 255; lut = (cumsum + step//2) // step
    nonzero = hist > 0
    last_idx = 255 - jnp.argmax(nonzero[::-1])
    step = (jnp.sum(hist) - hist[last_idx]) // 255
    cum = jnp.cumsum(hist)
    shifted = jnp.concatenate([jnp.zeros((1,), cum.dtype), cum[:-1]])
    lut = jnp.where(step > 0, (shifted + step // 2) // jnp.maximum(step, 1), jnp.arange(256))
    lut = jnp.clip(lut, 0, 255)
    if lut_ops.use_kernel():
        out = lut_ops.lut_apply(img, lut)
    else:
        out = lut_ops.lut_apply_fact(img, lut)
    return out.astype(img.dtype) / 255.0


def _gaussian_blur(img, sigma):
    """Separable gaussian with PIL-like radius; static taps, traced sigma."""
    radius = 4  # covers sigma up to ~1.3 well (reference scale [0.75, 1.25])
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    img2 = img[None]  # [1, H, W, 1]
    kh = k.reshape(1, -1, 1, 1)
    kv = k.reshape(-1, 1, 1, 1)
    out = jax.lax.conv_general_dilated(img2, kh, (1, 1), "SAME",
                                       dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(out, kv, (1, 1), "SAME",
                                       dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out[0]


def _contrast(img, v):
    # PIL enhance: blend with mean grayscale
    mean = jnp.round(jnp.mean(jnp.round(img * 255.0))) / 255.0
    return jnp.clip(mean + (img - mean) * v, 0.0, 1.0)


def _brightness(img, v):
    return jnp.clip(img * v, 0.0, 1.0)


def _sharpness(img, v):
    # PIL SMOOTH kernel [[1,1,1],[1,5,1],[1,1,1]]/13, border pixels kept
    k = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    smooth = jax.lax.conv_general_dilated(img[None], k.reshape(3, 3, 1, 1), (1, 1), "SAME",
                                          dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    h, w = img.shape[0], img.shape[1]
    interior = jnp.zeros((h, w, 1), bool).at[1:-1, 1:-1, :].set(True)
    smooth = jnp.where(interior, smooth, img)
    return jnp.clip(smooth + (img - smooth) * v, 0.0, 1.0)


def _posterize(img, bits):
    u8 = jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.int32)
    mask = (0xFF << (8 - bits)) & 0xFF
    return (u8 & mask).astype(img.dtype) / 255.0


def _solarize(img, threshold):
    u8 = jnp.clip(jnp.round(img * 255.0), 0, 255)
    return jnp.where(u8 >= threshold, 255.0 - u8, u8) / 255.0


N_STRONG = 9  # list order = reference get_strong_aug_list (classification.py:108-120)


def _strong_slot(img, oid, key):
    """One strong-op slot: apply op ``oid`` (reference list index) with a
    freshly sampled magnitude. Magnitude laws follow classification.py:27-68:
    blur sigma ~ U[0.75, 1.25]; enhance factors v = max - (max-min)*U[0,1)
    (contrast/brightness/sharpness, [0.75, 1.25]); posterize bits
    8 - max(1, ceil(4*U)) in {4..7}; solarize threshold
    256 - max(1, ceil(255*U)) in {1..255}."""

    def blur(x):
        return _gaussian_blur(x, jax.random.uniform(key, minval=0.75, maxval=1.25))

    def contrast(x):
        return _contrast(x, 1.25 - 0.5 * jax.random.uniform(key))

    def brightness(x):
        return _brightness(x, 1.25 - 0.5 * jax.random.uniform(key))

    def sharpness(x):
        return _sharpness(x, 1.25 - 0.5 * jax.random.uniform(key))

    def posterize(x):
        bits = 8 - jnp.maximum(
            1, jnp.ceil(4.0 * jax.random.uniform(key)).astype(jnp.int32))
        return _posterize(x, bits)

    def solarize(x):
        thr = 256 - jnp.maximum(
            1, jnp.ceil(255.0 * jax.random.uniform(key)).astype(jnp.int32))
        return _solarize(x, thr)

    return jax.lax.switch(oid, [lambda x: x, _autocontrast, _equalize, blur,
                                contrast, brightness, sharpness, posterize,
                                solarize], img)


def _quantize_u8(img):
    # PIL images are uint8 between ops; round-trip through the 1/255 grid
    return jnp.round(jnp.clip(img, 0.0, 1.0) * 255.0) / 255.0


def _op_sequence(rng, n, identity_id):
    """k ~ U{0..n}, then n op ids uniform over {0..n-1} with replacement;
    slots >= k are forced to the identity op (random.choices semantics,
    classification.py:131-135)."""
    k_n, k_ids = jax.random.split(rng)
    k = jax.random.randint(k_n, (), 0, n + 1)
    ids = jax.random.randint(k_ids, (n,), 0, n)
    return jnp.where(jnp.arange(n) < k, ids, identity_id)


def _strong_single(rng, img):
    """Reference StrongAugmentation on one [H, W, 1] image: k ~ U{0..9} ops
    chosen with replacement from the 9-op list, applied sequentially with
    per-application magnitudes (classification.py:125-135)."""
    k_seq, k_slots = jax.random.split(rng)
    ids = _op_sequence(k_seq, N_STRONG, identity_id=0)
    keys = jax.random.split(k_slots, N_STRONG)

    def body(im, xs):
        oid, kk = xs
        return _quantize_u8(_strong_slot(im, oid, kk)), None

    img, _ = jax.lax.scan(body, img, (ids, keys))
    return img


# ---------------------------------------------------------------------------
# Geometric ops (weak augs) — paired image/mask
# ---------------------------------------------------------------------------


def _crop_params(rng, h):
    """torchvision ``RandomResizedCrop.get_params(scale=(0.8, 1.2),
    ratio=(1, 1))`` on a square h x h image: up to 10 attempts sample
    side = round(h * sqrt(s)), s ~ U(0.8, 1.2), accepting side <= h (s > ~1
    rejects and resamples — the effective accepted law is s ~ U(0.8, 1]);
    after 10 failures fall back to the full image. Offsets are uniform
    integers in [0, h - side]."""
    k_s, k_i, k_j = jax.random.split(rng, 3)
    s = jax.random.uniform(k_s, (10,), minval=0.8, maxval=1.2)
    sides = jnp.round(jnp.sqrt(s) * h)
    ok = sides <= h
    side = jnp.where(jnp.any(ok), sides[jnp.argmax(ok)], h)
    i = jnp.floor(jax.random.uniform(k_i) * (h - side + 1))
    j = jnp.floor(jax.random.uniform(k_j) * (h - side + 1))
    return side, i, j


def _resized_crop(img, rng, out_size):
    """torchvision RandomResizedCrop(scale=(0.8,1.2), ratio=(1,1)) semantics:
    area-scaled square crop, random position, bilinear-resized back."""
    side, i, j = _crop_params(rng, img.shape[0])
    scale = out_size / side
    return jax.image.scale_and_translate(
        img, (out_size, out_size, img.shape[-1]),
        (0, 1), jnp.array([scale, scale]),
        jnp.array([-i * scale, -j * scale]),
        method="bilinear")


N_WEAK = 4  # [crop, hflip, vflip, identity] — reference WeakAugmentation order


def _weak_single(rng, img, mask, out_size):
    """Reference WeakAugmentation on one (image, mask) pair: k ~ U{0..4} ops
    with replacement from [RandomResizedCrop, hflip, vflip, identity],
    applied sequentially (classification.py:138-152; flips are unconditional
    when chosen — segmentation.py pairs the mask through every op). Requires
    img already at out_size (the reference resizes before augmenting)."""
    assert img.shape[0] == out_size and img.shape[1] == out_size, (
        "weak augs expect pre-resized images (reference __getitem__ order)")
    k_seq, k_slots = jax.random.split(rng)
    ids = _op_sequence(k_seq, N_WEAK, identity_id=3)
    keys = jax.random.split(k_slots, N_WEAK)

    def crop_pair(im, mk, kk):
        return (_resized_crop(im, kk, out_size), _resized_crop(mk, kk, out_size))

    def body(carry, xs):
        im, mk = carry
        oid, kk = xs
        im, mk = jax.lax.switch(
            oid,
            [crop_pair,
             lambda a, b, _: (a[:, ::-1], b[:, ::-1]),
             lambda a, b, _: (a[::-1], b[::-1]),
             lambda a, b, _: (a, b)],
            im, mk, kk)
        return (im, mk), None

    (img, mask), _ = jax.lax.scan(body, (img, mask), (ids, keys))
    mask = jnp.round(jnp.clip(mask, 0.0, 1.0))
    return img, mask


# ---------------------------------------------------------------------------
# Batch entry point
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("strong", "weak", "out_size"))
def augment_batch(rng, images, masks=None, *, strong: bool = True, weak: bool = True,
                  out_size: int | None = None):
    """Augment a batch [B, H, W, 1] (+ optional masks). Mirrors the
    reference's gating (classification.py:184-192): when both strong and weak
    are enabled, each sample is augmented with probability 0.5.
    Returns (images, masks) with masks None when not provided.
    """
    b, h = images.shape[0], images.shape[1]
    if out_size is None:
        out_size = h
    if masks is None:
        masks = jnp.zeros_like(images)
    k_gate, k_strong, k_weak = jax.random.split(rng, 3)
    strong_keys = jax.random.split(k_strong, b)
    weak_keys = jax.random.split(k_weak, b)

    out_img, out_mask = images, masks
    if strong:
        out_img = jax.vmap(_strong_single)(strong_keys, out_img)
    if weak:
        out_img, out_mask = jax.vmap(lambda r, i, m: _weak_single(r, i, m, out_size))(
            weak_keys, out_img, out_mask)

    if strong and weak:
        gate = jax.random.bernoulli(k_gate, 0.5, (b, 1, 1, 1))
        out_img = jnp.where(gate, out_img, images)
        out_mask = jnp.where(gate, out_mask, masks)
    return out_img, out_mask

"""On-device (XLA) batch augmentation.

TPU-native replacement for the reference's per-sample PIL pipeline
(/root/reference/src/datasets/classification.py:15-151): the whole batch is
augmented in one jitted function on device, overlapping with the previous
step's compute instead of burning host CPU in DataLoader workers.

Op inventory matches the reference's strong (intensity-only) and weak
(geometric, mask-paired) lists. Parity is *statistical*, not bitwise
(SURVEY.md §7 "hard parts" #4): the reference samples k ~ U{0..n} ops with
replacement and applies them sequentially; we apply each op independently
with probability 0.5, which preserves the per-op expected application count
(E[k]/n = 0.5 in both lists). PIL's uint8 quantisation is emulated where it
matters (posterize, solarize, equalize).

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
    LUT from the cumulative histogram with PIL's step offset)."""
    u8 = jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.int32)
    hist = jnp.zeros((256,), jnp.int32).at[u8.reshape(-1)].add(1)
    # PIL: step = (total - last_nonzero_bin_count) // 255; lut = (cumsum + step//2) // step
    nonzero = hist > 0
    last_idx = 255 - jnp.argmax(nonzero[::-1])
    step = (jnp.sum(hist) - hist[last_idx]) // 255
    cum = jnp.cumsum(hist)
    shifted = jnp.concatenate([jnp.zeros((1,), cum.dtype), cum[:-1]])
    lut = jnp.where(step > 0, (shifted + step // 2) // jnp.maximum(step, 1), jnp.arange(256))
    lut = jnp.clip(lut, 0, 255)
    return lut[u8].astype(img.dtype) / 255.0


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


def _strong_single(rng, img):
    """Apply the strong-op battery to one [H, W, 1] image; each op gated with
    p=0.5 and op-specific magnitudes sampled per reference scales
    (classification.py:108-120 — blur/contrast/brightness/sharpness all
    [0.75, 1.25], posterize [4, 8], solarize [1, 256])."""
    ks = jax.random.split(rng, 16)

    def gated(i, fn, x):
        return jnp.where(jax.random.bernoulli(ks[i]), fn(x), x)

    img = gated(0, _autocontrast, img)
    img = gated(1, _equalize, img)
    sigma = jax.random.uniform(ks[8], minval=0.75, maxval=1.25)
    img = gated(2, lambda x: _gaussian_blur(x, sigma), img)
    v_con = 1.25 - 0.5 * jax.random.uniform(ks[9])
    img = gated(3, lambda x: _contrast(x, v_con), img)
    v_bri = 1.25 - 0.5 * jax.random.uniform(ks[10])
    img = gated(4, lambda x: _brightness(x, v_bri), img)
    v_sha = 1.25 - 0.5 * jax.random.uniform(ks[11])
    img = gated(5, lambda x: _sharpness(x, v_sha), img)
    bits = 8 - jnp.ceil(4.0 * jax.random.uniform(ks[12])).astype(jnp.int32)
    bits = jnp.clip(bits, 1, 8)
    img = gated(6, lambda x: _posterize(x, bits), img)
    thr = 256 - jnp.maximum(1, jnp.ceil(255.0 * jax.random.uniform(ks[13]))).astype(jnp.int32)
    img = gated(7, lambda x: _solarize(x, thr), img)
    return img


# ---------------------------------------------------------------------------
# Geometric ops (weak augs) — paired image/mask
# ---------------------------------------------------------------------------


def _resized_crop(img, rng, out_size):
    """torchvision RandomResizedCrop(scale=(0.8,1.2), ratio=(1,1)) semantics:
    area-scaled square crop, random position, resized back; scale > 1 falls
    back to the full (center) image."""
    h = img.shape[0]
    k1, k2, k3 = jax.random.split(rng, 3)
    s = jax.random.uniform(k1, minval=0.8, maxval=1.2)
    side = jnp.round(jnp.sqrt(s) * h)
    side = jnp.clip(side, 1, h)
    i = jnp.floor(jax.random.uniform(k2) * (h - side + 1))
    j = jnp.floor(jax.random.uniform(k3) * (h - side + 1))
    scale = out_size / side
    return jax.image.scale_and_translate(
        img, (out_size, out_size, img.shape[-1]),
        (0, 1), jnp.array([scale, scale]),
        jnp.array([-i * scale, -j * scale]),
        method="bilinear")


def _weak_single(rng, img, mask, out_size):
    ks = jax.random.split(rng, 4)

    def crop_pair(im, mk):
        return (_resized_crop(im, ks[3], out_size), _resized_crop(mk, ks[3], out_size))

    do_crop = jax.random.bernoulli(ks[0])
    img2, mask2 = crop_pair(img, mask)
    img = jnp.where(do_crop, img2, img)
    mask = jnp.where(do_crop, mask2, mask)
    do_h = jax.random.bernoulli(ks[1])
    img = jnp.where(do_h, img[:, ::-1], img)
    mask = jnp.where(do_h, mask[:, ::-1], mask)
    do_v = jax.random.bernoulli(ks[2])
    img = jnp.where(do_v, img[::-1], img)
    mask = jnp.where(do_v, mask[::-1], mask)
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

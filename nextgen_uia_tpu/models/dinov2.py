"""DINOv2 backbone + heads, TPU-native.

Re-implements the behaviour of the vendored DINOv2 used by the reference
(/root/reference/src/third_party/dino/vision_transformer.py and dinov2.py):

  - ViT-B/14 trained at 518 (grid 37), evaluated at arbitrary sizes via
    bicubic positional-embedding interpolation (vision_transformer.py:165-189)
  - blocks with LayerScale (handled by the shared vit.block_apply via
    'ls1'/'ls2' slots), gelu MLP, final LayerNorm over all tokens
  - ``forward_features`` -> dict of normalized cls/patch tokens
    (vision_transformer.py:221-236)
  - ``get_intermediate_layers(n, return_class_token=True)`` -> last-n block
    outputs with the final norm applied (:264-289)

Heads (dinov2.py):
  - ClassificationHead: concat cls token(s) + averaged patch tokens -> linear
    (1 layer: 2*D inputs; 4 layers: 5*D inputs)
  - LinearDecoder: 1x1 conv + bilinear upsample
  - UNetDecoder over 5 intermediate layers with skip convs + BN
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.layers import (batchnorm, batchnorm_init, conv2d, conv2d_cat,
                         conv_init, conv_transpose2d, layernorm,
                         layernorm_init, linear, linear_init, resize_bilinear,
                         resize_bilinear_align_corners)
from .vit import ViTConfig, _block_init, block_apply

DINOV2_B14 = ViTConfig(image_size=518, patch_size=14, width=768, depth=12,
                       heads=12, act="gelu", use_ln_pre=False, patch_bias=True,
                       final_norm="all", proj_dim=None, ln_eps=1e-6)

# Size variants (vision_transformer.py:304-357). giant2 uses the fused
# SwiGLU FFN (ffn_layer='swiglufused', :112-114); the MemEffAttention /
# NestedTensorBlock wrappers are torch memory artefacts with no TPU analogue.
import dataclasses as _dc

DINOV2_S14 = _dc.replace(DINOV2_B14, width=384, depth=12, heads=6)
DINOV2_L14 = _dc.replace(DINOV2_B14, width=1024, depth=24, heads=16)
DINOV2_G14 = _dc.replace(DINOV2_B14, width=1536, depth=40, heads=24,
                         ffn="swiglufused")

DINOV2_ARCHS = {"vit_small": DINOV2_S14, "vit_base": DINOV2_B14,
                "vit_large": DINOV2_L14, "vit_giant2": DINOV2_G14}


def dinov2_config(arch: str = "vit_base") -> ViTConfig:
    if arch not in DINOV2_ARCHS:
        raise ValueError(f"Unknown DINOv2 arch {arch!r}; choose from "
                         f"{sorted(DINOV2_ARCHS)}")
    return DINOV2_ARCHS[arch]


def dinov2_init(rng, cfg: ViTConfig = DINOV2_B14):
    ks = jax.random.split(rng, cfg.depth + 4)
    scale = cfg.width ** -0.5
    blocks = []
    for i in range(cfg.depth):
        b = _block_init(ks[3 + i], cfg)
        b["ls1"] = jnp.full((cfg.width,), 1e-5, jnp.float32)
        b["ls2"] = jnp.full((cfg.width,), 1e-5, jnp.float32)
        blocks.append(b)
    return {
        "patch": conv_init(ks[0], cfg.patch_size, cfg.patch_size, 3, cfg.width, bias=True),
        "cls": jax.random.normal(ks[1], (cfg.width,), jnp.float32) * scale,
        "pos": jax.random.normal(ks[2], (cfg.seq_len, cfg.width), jnp.float32) * scale,
        "blocks": blocks,
        "norm": layernorm_init(cfg.width),
    }


def _torch_bicubic_taps(n_in: int, n_out: int, scale: float):
    """Static gather indices + weights replicating torch
    ``F.interpolate(mode='bicubic')`` (align_corners=False, antialias=False,
    cubic-convolution kernel a=-0.75, border-replicate taps). ``scale`` is
    the EXPLICIT scale_factor torch maps coordinates with when one is given
    (recompute_scale_factor=None): src = (dst + 0.5)/scale - 0.5."""
    import numpy as np

    a = -0.75
    dst = np.arange(n_out, dtype=np.float64)
    src = (dst + 0.5) / scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    t = src - i0  # in [0, 1)
    offs = np.arange(-1, 3)
    idx = np.clip(i0[:, None] + offs[None, :], 0, n_in - 1)
    d = np.abs(t[:, None] - offs[None, :])  # tap distances in (0, 2)
    w = np.where(d <= 1.0,
                 (a + 2.0) * d ** 3 - (a + 3.0) * d ** 2 + 1.0,
                 a * d ** 3 - 5.0 * a * d ** 2 + 8.0 * a * d - 4.0 * a)
    return jnp.asarray(idx), jnp.asarray(w, jnp.float32)


def _interp_pos(pos, grid_out: int, width: int):
    """Pos-embed interpolation matching DinoVisionTransformer.
    interpolate_pos_encoding (vision_transformer.py:165-189): torch bicubic
    with DINO's +0.1 scale-factor offset, applied separably with static
    weights (shapes are compile-time constants — no gather-heavy resize)."""
    cls_pos, patch_pos = pos[:1], pos[1:]
    g0 = int(round(patch_pos.shape[0] ** 0.5))
    if g0 == grid_out:
        return pos
    scale = (grid_out + 0.1) / g0  # interpolate_pos_encoding's w0 + 0.1
    idx, w = _torch_bicubic_taps(g0, grid_out, scale)
    grid = patch_pos.reshape(g0, g0, width).astype(jnp.float32)
    # rows then cols: [g0, g0, D] -> [grid_out, g0, D] -> [grid_out, grid_out, D]
    grid = jnp.einsum("rt,rtcd->rcd", w, grid[idx])
    grid = jnp.einsum("ct,rctd->rcd", w, grid[:, idx])
    return jnp.concatenate(
        [cls_pos, grid.reshape(grid_out * grid_out, width).astype(pos.dtype)], axis=0)


def _embed(p, cfg: ViTConfig, images, *, dtype=None):
    grid = images.shape[1] // cfg.patch_size
    w = p["patch"]["w"]
    if dtype is not None:
        images = images.astype(dtype)
        w = w.astype(dtype)
    x = jax.lax.conv_general_dilated(
        images, w, (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["patch"]["b"].astype(w.dtype)
    b = x.shape[0]
    x = x.reshape(b, grid * grid, cfg.width)
    cls_tok = jnp.broadcast_to(p["cls"].astype(x.dtype), (b, 1, cfg.width))
    x = jnp.concatenate([cls_tok, x], axis=1)
    pos = _interp_pos(p["pos"], grid, cfg.width)
    return x + pos.astype(x.dtype)


def forward_features(p, images, cfg: ViTConfig = DINOV2_B14, *, dtype=None):
    """-> {'x_norm_clstoken': [B, D], 'x_norm_patchtokens': [B, N, D]}."""
    x = _embed(p, cfg, images, dtype=dtype)
    for blk in p["blocks"]:
        x = block_apply(blk, x, cfg, dtype=dtype)
    x = layernorm(p["norm"], x, eps=cfg.ln_eps)
    return {"x_norm_clstoken": x[:, 0], "x_norm_patchtokens": x[:, 1:]}


def get_intermediate_layers(p, images, n: int, cfg: ViTConfig = DINOV2_B14, *, dtype=None):
    """Last-n block outputs, final-norm applied, as (patch_tokens, cls_token)
    tuples in shallow-to-deep order (vision_transformer.py:264-289)."""
    x = _embed(p, cfg, images, dtype=dtype)
    take = set(range(len(p["blocks"]) - n, len(p["blocks"])))
    outs = []
    for i, blk in enumerate(p["blocks"]):
        x = block_apply(blk, x, cfg, dtype=dtype)
        if i in take:
            outs.append(x)
    outs = [layernorm(p["norm"], o, eps=cfg.ln_eps) for o in outs]
    return [(o[:, 1:], o[:, 0]) for o in outs]


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------


def cls_head_init(rng, embed_dim: int, num_classes: int = 2, layers: int = 4):
    in_dim = 2 * embed_dim if layers == 1 else 5 * embed_dim
    if layers not in (1, 4):
        raise ValueError("ClassificationHead supports layers in {1, 4}")
    return {"linear": linear_init(rng, in_dim, num_classes, std=0.01)}


def cls_head_apply(p, features, *, layers: int = 4):
    if layers == 1:
        cls_tok = features["x_norm_clstoken"]
        avg_patch = jnp.mean(features["x_norm_patchtokens"], axis=1)
        feat = jnp.concatenate([cls_tok, avg_patch], axis=1)
    else:
        feat = jnp.concatenate(
            [features[i][1] for i in range(4)] + [jnp.mean(features[3][0], axis=1)], axis=1)
    return linear(p["linear"], feat)


def linear_decoder_init(rng, in_ch: int, num_classes: int = 2):
    return {"conv": conv_init(rng, 1, 1, in_ch, num_classes)}


def linear_decoder_apply(p, patch_tokens, *, image_size: int, patch_size: int = 14):
    g = image_size // patch_size
    b, n, c = patch_tokens.shape
    fmap = patch_tokens.reshape(b, g, g, c)
    y = conv2d(p["conv"], fmap)
    y = resize_bilinear(y, (image_size, image_size))
    return jnp.moveaxis(y, -1, 1)  # NCHW logits


def unet_decoder_init(rng, embed_dim: int, num_classes: int = 2):
    chans = [embed_dim, embed_dim // 2, embed_dim // 4, embed_dim // 8, num_classes]
    ks = jax.random.split(rng, 12)
    params, state = {}, {}
    for i in range(4):
        pbn1, sbn1 = batchnorm_init(chans[i + 1])
        pbn2, sbn2 = batchnorm_init(chans[i + 1])
        params[f"up{i}"] = {
            "upconv": conv_init(ks[3 * i % 12], 2, 2, chans[i], chans[i + 1]),
            "conv": conv_init(ks[(3 * i + 1) % 12], 3, 3, chans[i + 1] * 2, chans[i + 1]),
            "conv_bn": pbn1,
            "skip_conv": conv_init(ks[(3 * i + 2) % 12], 3, 3, embed_dim, chans[i + 1]),
            "skip_bn": pbn2,
        }
        state[f"up{i}"] = {"conv_bn": sbn1, "skip_bn": sbn2}
    return params, state


def unet_decoder_apply(params, state, layer_feats, *, image_size: int,
                       patch_size: int = 14, train: bool = False, dtype=None):
    """layer_feats: 5 (patch_tokens, cls) tuples from get_intermediate_layers.

    Deepest layer is the trunk; layers 3..0 feed skips (dinov2.py:185-194).
    Returns (NCHW f32 logits bicubic-resized to image_size, new_state).

    The concat-conv of each up level (dinov2.py:196-200) runs concat-free
    via conv2d_cat — numerics within f32 accumulation order, covered by the
    torch golden (tests/test_head_goldens.py::test_dinov2_unet_decoder_golden).
    `dtype=bfloat16` (opt-in, --head_dtype) runs the decoder *activations* in
    bf16 against f32 master params and f32 BN statistics, halving the
    decoder's HBM traffic — the dominant cost of the 518-px dino-seg step on
    a ~89 GB/s part (PERF.md round 4). Output logits are always f32.
    """
    g = image_size // patch_size
    def to_map(i):
        t = layer_feats[i][0]
        if dtype is not None:
            t = t.astype(dtype)
        return t.reshape(t.shape[0], g, g, t.shape[-1])

    x = to_map(4)
    skips = [to_map(3), to_map(2), to_map(1), to_map(0)]
    new_state = {}
    for i in range(4):
        up = params[f"up{i}"]
        st = state[f"up{i}"]
        x = conv_transpose2d(up["upconv"], x, stride=2, dtype=dtype)
        sk = conv2d(up["skip_conv"], skips[i], dtype=dtype)
        sk, s_skip = batchnorm(up["skip_bn"], st["skip_bn"], sk, train=train)
        sk = jax.nn.relu(sk)
        # torch align_corners=True semantics (dinov2.py:149)
        sk = resize_bilinear_align_corners(sk, (x.shape[1], x.shape[2]))
        x = conv2d_cat(up["conv"], x, sk, dtype=dtype)
        x, s_conv = batchnorm(up["conv_bn"], st["conv_bn"], x, train=train)
        x = jax.nn.relu(x)
        new_state[f"up{i}"] = {"conv_bn": s_conv, "skip_bn": s_skip}

    b, h, w, c = x.shape
    x = x.astype(jnp.float32)
    x = jax.image.resize(x, (b, image_size, image_size, c), method="bicubic")
    return jnp.moveaxis(x, -1, 1), new_state

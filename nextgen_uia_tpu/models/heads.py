"""Task heads: feature-pyramid adapter head and CLIPSeg FiLM decoder.

PyramidHead re-implements the reference's TimmCLIPAdapter / CLIPAdapter
(/root/reference/src/third_party/timm/clip_adapter.py:6-160 and
openai_clip/clip_adapter.py): tap ViT activations at layers {3, 6, 9}, reduce
768 -> 512, process with LN-MLP blocks in reverse (deep-to-shallow) order,
sum into a 14x14 map, then a seg head (bilinear upsample + 1x1 conv) or cls
head (GAP -> dropout -> linear). The backbone forward lives in models/vit.py
(``extract_layers``) — here we only consume the activation list.

ClipSegDecoder re-implements the HF ``CIDAS/clipseg-rd64-refined`` decoder
consumed at /root/reference/src/third_party/openai_clip/clipseg_adapter.py:30-37:
3 reduces (768->64), FiLM conditioning (mul/add from the 512-d text embedding,
applied after the first reduce), 3 post-norm relu transformer layers (4 heads,
intermediate 2048), then conv3x3 + two stride-4 transposed convs to full
resolution, single-channel logits.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp

from ..nn.attention import attention_init, mha
from ..nn.layers import (conv_init, conv_transpose2d, dropout, gelu, layernorm,
                         layernorm_init, linear, linear_init, resize_bilinear)


# ---------------------------------------------------------------------------
# Pyramid adapter head (TimmCLIPAdapter / CLIPAdapter equivalent)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PyramidHeadConfig:
    feature_dim: int = 768
    reduce_dim: int = 512
    num_layers: int = 3            # len(extract_layers)
    num_classes: int = 2
    img_size: int = 224
    task: str = "seg"              # 'seg' | 'cls'
    # cls-head flavour: the timm adapter uses GAP->Dropout(0.5)->Linear
    # (timm/clip_adapter.py:51-56); the OpenAI adapter inserts a hidden
    # Linear+ReLU+Dropout(0.1) (openai_clip/clip_adapter.py:51-58)
    cls_hidden: bool = False


def pyramid_head_init(rng, cfg: PyramidHeadConfig):
    ks = jax.random.split(rng, 3 * cfg.num_layers + 2)
    reduces, blocks = [], []
    for i in range(cfg.num_layers):
        reduces.append(linear_init(ks[3 * i], cfg.feature_dim, cfg.reduce_dim))
        blocks.append({
            "ln": layernorm_init(cfg.reduce_dim),
            "fc1": linear_init(ks[3 * i + 1], cfg.reduce_dim, cfg.reduce_dim),
            "fc2": linear_init(ks[3 * i + 2], cfg.reduce_dim, cfg.reduce_dim),
        })
    p = {"reduces": reduces, "blocks": blocks}
    if cfg.task == "seg":
        p["seg_head"] = conv_init(ks[-1], 1, 1, cfg.reduce_dim, cfg.num_classes)
    elif cfg.cls_hidden:
        p["cls_head"] = {
            "fc1": linear_init(ks[-2], cfg.reduce_dim, cfg.reduce_dim),
            "fc2": linear_init(ks[-1], cfg.reduce_dim, cfg.num_classes),
        }
    else:
        p["cls_head"] = linear_init(ks[-1], cfg.reduce_dim, cfg.num_classes)
    return p


def pyramid_head_apply(p, cfg: PyramidHeadConfig, activations, *, rng=None, dtype=None):
    """activations: list of [B, N, D] token states (shallow-to-deep order).

    Returns [B, num_classes, H, W] for seg (NCHW to match reference loss/metric
    conventions) or [B, num_classes] for cls.
    """
    fused = None
    # reverse order: deep to shallow (clip_adapter.py:121-142)
    for act, reduce_p, block_p in zip(activations[::-1], p["reduces"][::-1], p["blocks"][::-1]):
        a = act[:, 1:, :]  # drop CLS
        a = linear(reduce_p, a, dtype=dtype)
        h = layernorm(block_p["ln"], a)
        h = linear(block_p["fc2"], gelu(linear(block_p["fc1"], h, dtype=dtype)), dtype=dtype)
        fused = h if fused is None else h + fused

    b, n, c = fused.shape
    size = int(round(n ** 0.5))
    fmap = fused.reshape(b, size, size, c)  # NHWC

    if cfg.task == "seg":
        # reference order is upsample-then-1x1-conv (clip_adapter.py:46-49),
        # but the two operations are linear and commute EXACTLY (bilinear
        # row weights sum to 1, so even the bias passes through unchanged) —
        # conv first keeps the 16x-upsampled tensor at num_classes channels
        # instead of reduce_dim (512): [B,224,224,512] f32 is 3.3 GB of HBM
        # traffic per step at batch 32 on an ~89 GB/s part (PERF.md round 5).
        # NEXTGEN_UIA_SEG_CONV_FIRST=0 restores the reference order for A/B
        # (bench/smoke_headorder.py), same toggle style as FLASH_NMAX.
        conv = lambda x: jax.lax.conv_general_dilated(
            x, p["seg_head"]["w"].astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["seg_head"]["b"].astype(x.dtype)
        up = lambda x: resize_bilinear(x, (cfg.img_size, cfg.img_size))
        if os.environ.get("NEXTGEN_UIA_SEG_CONV_FIRST", "1") == "1":
            logits = up(conv(fmap))
        else:
            logits = conv(up(fmap))
        return jnp.moveaxis(logits, -1, 1)  # -> NCHW
    pooled = jnp.mean(fmap, axis=(1, 2))
    if cfg.cls_hidden:
        # OpenAI adapter: GAP -> linear -> relu -> dropout(0.1) -> linear
        # (openai_clip/clip_adapter.py:51-58)
        h = jax.nn.relu(linear(p["cls_head"]["fc1"], pooled, dtype=dtype))
        h = dropout(rng, h, 0.1)
        return linear(p["cls_head"]["fc2"], h, dtype=dtype)
    # timm adapter: GAP -> dropout(0.5) -> linear (timm/clip_adapter.py:51-56)
    pooled = dropout(rng, pooled, 0.5)
    return linear(p["cls_head"], pooled, dtype=dtype)


# ---------------------------------------------------------------------------
# CLIPSeg FiLM decoder
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ClipSegDecoderConfig:
    hidden_size: int = 768         # vision tower width
    reduce_dim: int = 64
    cond_dim: int = 512            # text/projection dim
    heads: int = 4
    intermediate: int = 2048
    extract_layers: tuple = (3, 6, 9)
    conditional_layer: int = 0
    patch_size: int = 16
    ln_eps: float = 1e-5


def clipseg_decoder_init(rng, cfg: ClipSegDecoderConfig):
    depth = len(cfg.extract_layers)
    ks = jax.random.split(rng, depth * 4 + 6)
    rd = cfg.reduce_dim
    layers = []
    for i in range(depth):
        layers.append({
            "attn": attention_init(ks[4 * i], rd),
            "ln1": layernorm_init(rd),
            "mlp": {"fc1": linear_init(ks[4 * i + 1], rd, cfg.intermediate),
                    "fc2": linear_init(ks[4 * i + 2], cfg.intermediate, rd)},
            "ln2": layernorm_init(rd),
        })
    k = cfg.patch_size // 4
    return {
        "film_mul": linear_init(ks[-1], cfg.cond_dim, rd),
        "film_add": linear_init(ks[-2], cfg.cond_dim, rd),
        "reduces": [linear_init(ks[4 * i + 3], cfg.hidden_size, rd) for i in range(depth)],
        "layers": layers,
        "trans_conv1": conv_init(ks[-3], 3, 3, rd, rd),
        "trans_up1": conv_init(ks[-4], k, k, rd, rd // 2),   # transposed, stride k
        "trans_up2": conv_init(ks[-5], k, k, rd // 2, 1),    # transposed, stride k
    }




def clipseg_decoder_apply(p, cfg: ClipSegDecoderConfig, activations, cond, *, dtype=None):
    """activations: list of [B, N, D] (shallow-to-deep); cond: [B, cond_dim].

    Returns [B, H, W] single-channel logits (H = W = grid * patch_size).
    """
    out = None
    for i, (act, reduce_p, layer) in enumerate(zip(activations[::-1], p["reduces"], p["layers"])):
        r = linear(reduce_p, act, dtype=dtype)
        out = r if out is None else r + out
        if i == cfg.conditional_layer:
            mul = linear(p["film_mul"], cond, dtype=dtype)
            add = linear(p["film_add"], cond, dtype=dtype)
            out = mul[:, None, :] * out + add[:, None, :]
        # post-norm relu transformer layer (HF CLIPSegDecoderLayer)
        a = mha(layer["attn"], out, num_heads=cfg.heads, dtype=dtype)
        out = layernorm(layer["ln1"], out + a, eps=cfg.ln_eps)
        h = linear(layer["mlp"]["fc1"], out, dtype=dtype)
        h = linear(layer["mlp"]["fc2"], jax.nn.relu(h), dtype=dtype)
        out = layernorm(layer["ln2"], out + h, eps=cfg.ln_eps)

    out = out[:, 1:, :]  # drop CLS
    b, n, c = out.shape
    size = int(round(n ** 0.5))
    fmap = out.reshape(b, size, size, c)

    y = jax.lax.conv_general_dilated(
        fmap, p["trans_conv1"]["w"].astype(fmap.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["trans_conv1"]["b"].astype(fmap.dtype)
    y = jax.nn.relu(y)
    k = cfg.patch_size // 4
    y = conv_transpose2d(p["trans_up1"], y, stride=k, dtype=y.dtype)
    y = jax.nn.relu(y)
    y = conv_transpose2d(p["trans_up2"], y, stride=k, dtype=y.dtype)
    return y[:, :, :, 0]

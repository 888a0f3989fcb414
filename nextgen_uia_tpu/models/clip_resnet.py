"""OpenAI CLIP ModifiedResNet vision tower, TPU-native NHWC.

Mirrors the reference's vendored tower
(/root/reference/src/third_party/openai_clip/model.py: Bottleneck :10-59,
AttentionPool2d :62-99, ModifiedResNet :102-160):

- 3-conv stem (stride-2 first conv) + 2x2 average pool instead of the
  torchvision 7x7 stem + maxpool.
- Anti-aliased strided residuals: every conv has stride 1; an average pool of
  size ``stride`` runs after the second conv (and before the 1x1 downsample).
- Final pooling is single-query multi-head attention over [mean, HW] tokens
  with a learned positional embedding (AttentionPool2d), projecting to the
  shared CLIP embedding dim.

No reference task trains this tower (all use ViT-B/16), so it ships as an
encode-only backbone: ``modified_resnet_apply`` runs eval-mode BatchNorm from
the converted running stats. Weights convert via
convert/torch_to_jax.py::convert_modified_resnet.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn.layers import batchnorm, batchnorm_init, conv_init, linear, linear_init

EXPANSION = 4  # Bottleneck.expansion (model.py:11)


@dataclasses.dataclass(frozen=True)
class ModifiedResNetConfig:
    layers: tuple = (3, 4, 6, 3)          # RN50
    output_dim: int = 1024
    heads: int = 32
    input_resolution: int = 224
    width: int = 64

    @property
    def embed_dim(self):
        return self.width * 32

    @property
    def grid(self):
        return self.input_resolution // 32


RN50 = ModifiedResNetConfig()
RN101 = ModifiedResNetConfig(layers=(3, 4, 23, 3), output_dim=512)


def _avg_pool(x, k: int):
    """AvgPool2d(k) over NHWC (kernel == stride == k, VALID)."""
    if k <= 1:
        return x
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID")
    return summed / (k * k)


def _conv_bn_init(rng, kh, kw, cin, cout):
    p, s = batchnorm_init(cout)
    return {"conv": conv_init(rng, kh, kw, cin, cout, bias=False), "bn": p}, {"bn": s}


def _conv_bn(p, s, x, *, stride=1, pad=None):
    k = p["conv"]["w"].shape[0]
    pad = k // 2 if pad is None else pad
    y = jax.lax.conv_general_dilated(
        x, p["conv"]["w"], (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y, _ = batchnorm(p["bn"], s["bn"], y, train=False)
    return y


def _bottleneck_init(rng, cin, planes, stride):
    ks = jax.random.split(rng, 4)
    params, state = {}, {}
    params["c1"], state["c1"] = _conv_bn_init(ks[0], 1, 1, cin, planes)
    params["c2"], state["c2"] = _conv_bn_init(ks[1], 3, 3, planes, planes)
    params["c3"], state["c3"] = _conv_bn_init(ks[2], 1, 1, planes, planes * EXPANSION)
    if stride > 1 or cin != planes * EXPANSION:
        params["down"], state["down"] = _conv_bn_init(
            ks[3], 1, 1, cin, planes * EXPANSION)
    return params, state


def _bottleneck(p, s, x, stride):
    # model.py:46-58 — stride lives in the avgpool, every conv is stride 1
    y = jax.nn.relu(_conv_bn(p["c1"], s["c1"], x))
    y = jax.nn.relu(_conv_bn(p["c2"], s["c2"], y))
    y = _avg_pool(y, stride)
    y = _conv_bn(p["c3"], s["c3"], y)
    identity = x
    if "down" in p:
        identity = _conv_bn(p["down"], s["down"], _avg_pool(x, stride))
    return jax.nn.relu(y + identity)


def _attnpool_init(rng, cfg: ModifiedResNetConfig):
    d = cfg.embed_dim
    ks = jax.random.split(rng, 5)
    return {
        "pos": jax.random.normal(ks[0], (cfg.grid * cfg.grid + 1, d)) / d ** 0.5,
        "q": linear_init(ks[1], d, d),
        "k": linear_init(ks[2], d, d),
        "v": linear_init(ks[3], d, d),
        "c": linear_init(ks[4], d, cfg.output_dim),
    }


def _attnpool(p, x, heads: int):
    """Single-query MHA pool (model.py:73-99): query = mean token."""
    b, n, d = x.shape
    x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)  # [B,1+N,D]
    x = x + p["pos"][None].astype(x.dtype)
    hd = d // heads
    q = linear(p["q"], x[:, :1]).reshape(b, 1, heads, hd)
    k = linear(p["k"], x).reshape(b, n + 1, heads, hd)
    v = linear(p["v"], x).reshape(b, n + 1, heads, hd)
    att = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                     preferred_element_type=jnp.float32) * (hd ** -0.5)
    att = jax.nn.softmax(att, axis=-1).astype(x.dtype)
    pooled = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, 1, d)
    return linear(p["c"], pooled)[:, 0]  # [B, output_dim]


def modified_resnet_init(rng, cfg: ModifiedResNetConfig = RN50):
    """Returns (params, state); state holds BN running stats (eval-mode)."""
    w = cfg.width
    ks = jax.random.split(rng, 4 + sum(cfg.layers))
    params, state = {}, {}
    params["stem1"], state["stem1"] = _conv_bn_init(ks[0], 3, 3, 3, w // 2)
    params["stem2"], state["stem2"] = _conv_bn_init(ks[1], 3, 3, w // 2, w // 2)
    params["stem3"], state["stem3"] = _conv_bn_init(ks[2], 3, 3, w // 2, w)
    cin, ki = w, 3
    for stage, nblocks in enumerate(cfg.layers):
        planes = w * (2 ** stage)
        bp, bs = [], []
        for b in range(nblocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            p_, s_ = _bottleneck_init(ks[ki], cin, planes, stride)
            bp.append(p_)
            bs.append(s_)
            cin = planes * EXPANSION
            ki += 1
        params[f"layer{stage + 1}"] = bp
        state[f"layer{stage + 1}"] = bs
    params["attnpool"] = _attnpool_init(ks[-1], cfg)
    return params, state


def modified_resnet_apply(params, state, x, cfg: ModifiedResNetConfig = RN50):
    """x: [B, H, W, 3] -> [B, output_dim] CLIP image features (eval BN)."""
    y = jax.nn.relu(_conv_bn(params["stem1"], state["stem1"], x, stride=2))
    y = jax.nn.relu(_conv_bn(params["stem2"], state["stem2"], y))
    y = jax.nn.relu(_conv_bn(params["stem3"], state["stem3"], y))
    y = _avg_pool(y, 2)
    for stage, nblocks in enumerate(cfg.layers):
        for b in range(nblocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            y = _bottleneck(params[f"layer{stage + 1}"][b],
                            state[f"layer{stage + 1}"][b], y, stride)
    tokens = y.reshape(y.shape[0], -1, y.shape[-1])  # NHWC -> [B, HW, C]
    return _attnpool(params["attnpool"], tokens, cfg.heads)

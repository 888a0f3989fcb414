"""ResNet classification baselines (18/34/50/101/152), TPU-native NHWC.

Mirrors torchvision's resnet family as consumed by the reference baselines
(/root/reference/src/models/baselines/classification.py: torchvision resnet
with replaced ``fc``). Weight layout matches the converter in
convert/torch_to_jax.py; batch stats are threaded explicitly like unet.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.layers import batchnorm, batchnorm_init, conv_init, linear, linear_init

SPECS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}


def _conv_bn_init(rng, kh, kw, cin, cout):
    p, s = batchnorm_init(cout)
    return {"conv": conv_init(rng, kh, kw, cin, cout, bias=False), "bn": p}, {"bn": s}


def _conv_bn(p, s, x, *, stride=1, train=False):
    y = jax.lax.conv_general_dilated(
        x, p["conv"]["w"], (stride, stride),
        _same_pad(p["conv"]["w"].shape[0], stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y, ns = batchnorm(p["bn"], s["bn"], y, train=train)
    return y, {"bn": ns}


def _same_pad(k, stride):
    # torch uses padding=k//2; express explicitly so stride-2 matches torch
    pad = k // 2
    return ((pad, pad), (pad, pad))


def _block_init(rng, kind, cin, cout, stride):
    ks = jax.random.split(rng, 4)
    params, state = {}, {}
    if kind == "basic":
        params["c1"], state["c1"] = _conv_bn_init(ks[0], 3, 3, cin, cout)
        params["c2"], state["c2"] = _conv_bn_init(ks[1], 3, 3, cout, cout)
        out_ch = cout
    else:
        params["c1"], state["c1"] = _conv_bn_init(ks[0], 1, 1, cin, cout)
        params["c2"], state["c2"] = _conv_bn_init(ks[1], 3, 3, cout, cout)
        params["c3"], state["c3"] = _conv_bn_init(ks[2], 1, 1, cout, cout * 4)
        out_ch = cout * 4
    if stride != 1 or cin != out_ch:
        params["down"], state["down"] = _conv_bn_init(ks[3], 1, 1, cin, out_ch)
    return params, state, out_ch


def _block_apply(p, s, x, kind, stride, *, train):
    ns = {}
    identity = x
    if kind == "basic":
        y, ns["c1"] = _conv_bn(p["c1"], s["c1"], x, stride=stride, train=train)
        y = jax.nn.relu(y)
        y, ns["c2"] = _conv_bn(p["c2"], s["c2"], y, train=train)
    else:
        y, ns["c1"] = _conv_bn(p["c1"], s["c1"], x, train=train)
        y = jax.nn.relu(y)
        y, ns["c2"] = _conv_bn(p["c2"], s["c2"], y, stride=stride, train=train)
        y = jax.nn.relu(y)
        y, ns["c3"] = _conv_bn(p["c3"], s["c3"], y, train=train)
    if "down" in p:
        identity, ns["down"] = _conv_bn(p["down"], s["down"], x, stride=stride, train=train)
    return jax.nn.relu(y + identity), ns


def resnet_init(rng, arch: str, *, in_channels: int = 3, num_classes: int = 2):
    kind, layout = SPECS[arch]
    ks = jax.random.split(rng, 2 + sum(layout))
    params, state = {}, {}
    params["stem"], state["stem"] = _conv_bn_init(ks[0], 7, 7, in_channels, 64)
    cin = 64
    ki = 1
    for stage, nblocks in enumerate(layout):
        cout = 64 * (2 ** stage)
        blocks_p, blocks_s = [], []
        for b in range(nblocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            bp, bs, cin_next = _block_init(ks[ki], kind, cin, cout, stride)
            blocks_p.append(bp)
            blocks_s.append(bs)
            cin = cin_next
            ki += 1
        params[f"layer{stage+1}"] = blocks_p
        state[f"layer{stage+1}"] = blocks_s
    params["fc"] = linear_init(ks[-1], cin, num_classes)
    return params, state


def resnet_apply(params, state, x, arch: str, *, train: bool = False):
    """x: [B, H, W, C] -> ([B, num_classes], new_state)."""
    kind, layout = SPECS[arch]
    ns = {}
    y, ns["stem"] = _conv_bn(params["stem"], state["stem"], x, stride=2, train=train)
    y = jax.nn.relu(y)
    y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
    y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
    for stage, nblocks in enumerate(layout):
        stage_state = []
        for b in range(nblocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            y, bs = _block_apply(params[f"layer{stage+1}"][b], state[f"layer{stage+1}"][b],
                                 y, kind, stride, train=train)
            stage_state.append(bs)
        ns[f"layer{stage+1}"] = stage_state
    pooled = jnp.mean(y, axis=(1, 2))
    return linear(params["fc"], pooled), ns

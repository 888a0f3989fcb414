"""UNet segmentation baseline, TPU-native (NHWC, explicit batch-stat state).

Re-implements /root/reference/src/third_party/unet.py: 5-level encoder
(double conv3x3 + BN + LeakyReLU + per-level dropout [.05,.1,.2,.3,.5],
maxpool downsampling), decoder up blocks of conv1x1 + bilinear
align_corners=True x2 upsample + skip concat (UpBlock defaults to
bilinear=True — the Decoder never passes the params' dead "bilinear": False,
unet.py:91-97), final conv3x3 to class logits. init_channels=16.
Output-parity golden: tests/test_head_goldens.py::test_unet_baseline_golden.

State threading: batchnorm running stats live in a separate pytree mirroring
the param tree; every apply returns (logits, new_state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn.layers import (batchnorm, batchnorm_init, conv2d, conv2d_cat,
                         conv_init, dropout, resize_bilinear_align_corners)

DROPOUTS = (0.05, 0.1, 0.2, 0.3, 0.5)


def _convblock_init(rng, cin, cout):
    k1, k2 = jax.random.split(rng)
    p1, s1 = batchnorm_init(cout)
    p2, s2 = batchnorm_init(cout)
    params = {"conv1": conv_init(k1, 3, 3, cin, cout), "bn1": p1,
              "conv2": conv_init(k2, 3, 3, cout, cout), "bn2": p2}
    state = {"bn1": s1, "bn2": s2}
    return params, state


def _convblock_apply(p, s, x, *, train, rng, drop_p, cat=None):
    # cat: decoder skip input — conv1 consumes concatenate([x, cat], -1)
    # concat-free (kernel split over input channels, nn/layers.py:conv2d_cat)
    x = conv2d(p["conv1"], x) if cat is None else conv2d_cat(p["conv1"], x, cat)
    x, s1 = batchnorm(p["bn1"], s["bn1"], x, train=train)
    x = jax.nn.leaky_relu(x, 0.01)
    if train and rng is not None:
        rng, sub = jax.random.split(rng)
        x = dropout(sub, x, drop_p)
    x = conv2d(p["conv2"], x)
    x, s2 = batchnorm(p["bn2"], s["bn2"], x, train=train)
    x = jax.nn.leaky_relu(x, 0.01)
    return x, {"bn1": s1, "bn2": s2}


def unet_init(rng, in_channels: int, num_classes: int, init_channels: int = 16):
    ch = [init_channels * m for m in (1, 2, 4, 8, 16)]
    ks = jax.random.split(rng, 14)
    params, state = {}, {}
    params["enc0"], state["enc0"] = _convblock_init(ks[0], in_channels, ch[0])
    for i in range(4):
        params[f"enc{i+1}"], state[f"enc{i+1}"] = _convblock_init(ks[1 + i], ch[i], ch[i + 1])
    for i in range(4):
        # up i: conv1x1 ch[4-i] -> ch[3-i] + bilinear x2 (UpBlock bilinear=True
        # default, unet.py:38-49), then convblock on concat 2*ch[3-i]
        params[f"upconv{i}"] = conv_init(ks[5 + 2 * i], 1, 1, ch[4 - i], ch[3 - i])
        params[f"dec{i}"], state[f"dec{i}"] = _convblock_init(ks[6 + 2 * i], ch[3 - i] * 2, ch[3 - i])
    params["out"] = conv_init(ks[13], 3, 3, ch[0], num_classes)
    return params, state


def _maxpool2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def unet_apply(params, state, x, *, train: bool = False, rng=None):
    """x: [B, H, W, C] -> ([B, num_classes, H, W] logits (NCHW), new_state)."""
    feats = []
    new_state = {}
    h = x
    for i in range(5):
        if i > 0:
            h = _maxpool2(h)
        sub = None
        if rng is not None:
            rng, sub = jax.random.split(rng)
        h, new_state[f"enc{i}"] = _convblock_apply(
            params[f"enc{i}"], state[f"enc{i}"], h, train=train, rng=sub, drop_p=DROPOUTS[i])
        feats.append(h)

    h = feats[4]
    for i in range(4):
        h = conv2d(params[f"upconv{i}"], h)
        h = resize_bilinear_align_corners(h, (h.shape[1] * 2, h.shape[2] * 2))
        sub = None
        if rng is not None:
            rng, sub = jax.random.split(rng)
        # dec conv1 reads concatenate([skip, up], -1) (unet.py:52-55) concat-free
        h, new_state[f"dec{i}"] = _convblock_apply(
            params[f"dec{i}"], state[f"dec{i}"], feats[3 - i], cat=h,
            train=train, rng=sub, drop_p=0.0)

    logits = conv2d(params["out"], h)
    return jnp.moveaxis(logits, -1, 1), new_state

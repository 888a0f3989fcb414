"""Shape contracts for task heads, baselines, and DINOv2."""

import jax
import jax.numpy as jnp
import numpy as np
import dataclasses

from nextgen_uia_tpu.models import dinov2 as dino
from nextgen_uia_tpu.models.heads import (ClipSegDecoderConfig, PyramidHeadConfig,
                                          clipseg_decoder_apply, clipseg_decoder_init,
                                          pyramid_head_apply, pyramid_head_init)
from nextgen_uia_tpu.models.resnet import resnet_apply, resnet_init
from nextgen_uia_tpu.models.unet import unet_apply, unet_init


def test_pyramid_head_seg_and_cls():
    cfg = PyramidHeadConfig(feature_dim=32, reduce_dim=16, img_size=64, task="seg")
    p = pyramid_head_init(jax.random.key(0), cfg)
    acts = [jnp.ones((2, 17, 32)) for _ in range(3)]  # 4x4 grid + CLS
    out = pyramid_head_apply(p, cfg, acts)
    assert out.shape == (2, 2, 64, 64)

    cfg_c = dataclasses.replace(cfg, task="cls")
    pc = pyramid_head_init(jax.random.key(0), cfg_c)
    out = pyramid_head_apply(pc, cfg_c, acts)
    assert out.shape == (2, 2)


def test_clipseg_decoder_shapes():
    cfg = ClipSegDecoderConfig(hidden_size=32, reduce_dim=16, cond_dim=24,
                               intermediate=64, patch_size=16)
    p = clipseg_decoder_init(jax.random.key(0), cfg)
    acts = [jnp.ones((2, 17, 32)) for _ in range(3)]  # 4x4 grid
    cond = jnp.ones((2, 24))
    out = clipseg_decoder_apply(p, cfg, acts, cond)
    assert out.shape == (2, 64, 64)  # 4 * patch_size
    assert np.isfinite(np.asarray(out)).all()


def test_unet_forward_and_state():
    params, state = unet_init(jax.random.key(0), in_channels=1, num_classes=2, init_channels=4)
    x = jnp.ones((2, 32, 32, 1))
    logits, new_state = unet_apply(params, state, x, train=True, rng=jax.random.key(1))
    assert logits.shape == (2, 2, 32, 32)
    # running stats updated in train mode
    a = state["enc0"]["bn1"]["mean"]
    b = new_state["enc0"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # eval mode: state unchanged
    _, same_state = unet_apply(params, new_state, x, train=False)
    assert np.allclose(np.asarray(same_state["enc0"]["bn1"]["mean"]), np.asarray(b))


def test_resnet18_and_50():
    for arch, classes in (("resnet18", 2), ("resnet50", 2)):
        params, state = resnet_init(jax.random.key(0), arch, in_channels=3, num_classes=classes)
        x = jnp.ones((2, 64, 64, 3))
        logits, _ = resnet_apply(params, state, x, arch, train=False)
        assert logits.shape == (2, classes)
        assert np.isfinite(np.asarray(logits)).all()


def test_dinov2_features_and_heads():
    cfg = dataclasses.replace(dino.DINOV2_B14, image_size=56, patch_size=14,
                              width=32, depth=5, heads=4)
    p = dino.dinov2_init(jax.random.key(0), cfg)
    x = jnp.ones((2, 28, 28, 3))  # smaller than training size -> pos interp path
    feats = dino.forward_features(p, x, cfg)
    assert feats["x_norm_clstoken"].shape == (2, 32)
    assert feats["x_norm_patchtokens"].shape == (2, 4, 32)

    inter = dino.get_intermediate_layers(p, x, 4, cfg)
    assert len(inter) == 4 and inter[0][0].shape == (2, 4, 32)

    hp = dino.cls_head_init(jax.random.key(1), 32, layers=4)
    logits = dino.cls_head_apply(hp, inter, layers=4)
    assert logits.shape == (2, 2)

    ld = dino.linear_decoder_init(jax.random.key(2), 32)
    seg = dino.linear_decoder_apply(ld, inter[-1][0], image_size=28, patch_size=14)
    assert seg.shape == (2, 2, 28, 28)

    inter5 = dino.get_intermediate_layers(p, x, 5, cfg)
    up, us = dino.unet_decoder_init(jax.random.key(3), 32)
    seg5, _ = dino.unet_decoder_apply(up, us, inter5, image_size=28, patch_size=14)
    assert seg5.shape == (2, 2, 28, 28)


def test_conv2d_cat_matches_concat_conv():
    """conv2d_cat (kernel split over input channels) == conv over the
    materialized concat, fwd and grad, within f32 accumulation order."""
    from nextgen_uia_tpu.nn.layers import conv2d, conv2d_cat, conv_init

    rng = jax.random.key(0)
    p = conv_init(rng, 3, 3, 24, 16)
    x = jax.random.normal(jax.random.key(1), (2, 9, 9, 10))
    sk = jax.random.normal(jax.random.key(2), (2, 9, 9, 14))

    ref = conv2d(p, jnp.concatenate([x, sk], axis=-1))
    out = conv2d_cat(p, x, sk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def loss_cat(p, x, sk):
        return jnp.sum(conv2d_cat(p, x, sk) ** 2)

    def loss_ref(p, x, sk):
        return jnp.sum(conv2d(p, jnp.concatenate([x, sk], axis=-1)) ** 2)

    g_cat = jax.grad(loss_cat, argnums=(0, 1, 2))(p, x, sk)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(p, x, sk)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4), g_cat, g_ref)


def test_dino_unet_decoder_bf16_activations():
    """--head_dtype bfloat16: decoder activations bf16, f32 master params and
    BN stats, f32 output logits, bounded drift vs the f32 path."""
    cfg = dataclasses.replace(dino.DINOV2_B14, image_size=56, patch_size=14,
                              width=32, depth=5, heads=4)
    p = dino.dinov2_init(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(9), (2, 28, 28, 3))
    inter5 = dino.get_intermediate_layers(p, x, 5, cfg)
    up, us = dino.unet_decoder_init(jax.random.key(3), 32)

    f32, st32 = dino.unet_decoder_apply(up, us, inter5, image_size=28,
                                        patch_size=14, train=True)
    b16, st16 = dino.unet_decoder_apply(up, us, inter5, image_size=28,
                                        patch_size=14, train=True,
                                        dtype=jnp.bfloat16)
    assert b16.dtype == jnp.float32
    # BN running stats stay f32 on the bf16 path
    jax.tree.map(lambda a: (_ for _ in ()).throw(AssertionError(a.dtype))
                 if a.dtype != jnp.float32 else None, st16)
    scale = float(jnp.max(jnp.abs(f32))) + 1e-6
    assert float(jnp.max(jnp.abs(b16 - f32))) / scale < 0.05
    # stats track the same batch within bf16 resolution
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=5e-2, rtol=5e-2), st16, st32)


def test_pyramid_seg_conv_resize_orders_commute(monkeypatch):
    """Round-5 exact rewrite: the seg tail's 1x1 conv and bilinear upsample
    commute (both linear; bilinear rows sum to 1 so the bias passes through).
    NEXTGEN_UIA_SEG_CONV_FIRST=0 must reproduce the reference order's output
    to f32 rounding."""
    import os

    from nextgen_uia_tpu.models.heads import pyramid_head_apply, pyramid_head_init

    cfg = PyramidHeadConfig(feature_dim=48, reduce_dim=32, num_layers=2,
                            num_classes=3, img_size=32, task="seg")
    p = pyramid_head_init(jax.random.key(0), cfg)
    acts = [jax.random.normal(jax.random.key(i + 1), (2, 17, 48))
            for i in range(2)]

    monkeypatch.setenv("NEXTGEN_UIA_SEG_CONV_FIRST", "1")
    fast = pyramid_head_apply(p, cfg, acts)
    monkeypatch.setenv("NEXTGEN_UIA_SEG_CONV_FIRST", "0")
    ref = pyramid_head_apply(p, cfg, acts)
    assert fast.shape == ref.shape == (2, 3, 32, 32)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

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

"""Shape/dtype contracts and adapter-slot invariants for the model stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextgen_uia_tpu.adapters.lora import inject_lora
from nextgen_uia_tpu.adapters.mona import inject_mona
from nextgen_uia_tpu.core.partition import (by_keywords, count_params, merge,
                                            partition)
from nextgen_uia_tpu.models import clip as clip_mod
from nextgen_uia_tpu.models.vit import ViTConfig, vit_apply, vit_init

TINY = ViTConfig(image_size=32, patch_size=16, width=64, depth=3, heads=4, proj_dim=32)


def test_vit_shapes_and_extraction():
    p = vit_init(jax.random.key(0), TINY)
    x = jnp.ones((2, 32, 32, 3))
    pooled, acts = vit_apply(p, TINY, x, extract_layers=(0, 2))
    assert pooled.shape == (2, 32)
    assert len(acts) == 2 and acts[0].shape == (2, 5, 64)


def test_mona_injection_invariants():
    p = vit_init(jax.random.key(0), TINY)
    p2, n = inject_mona(jax.random.key(1), p, dim=64, bottleneck=16, variant="hybrid")
    assert n == 3
    trainable, frozen = partition({"visual": p2}, by_keywords("mona"))
    n_train = count_params(trainable)
    assert n_train > 0
    # merge() inverts partition()
    merged = merge(trainable, frozen)
    flat_a = jax.tree_util.tree_leaves(merged)
    flat_b = jax.tree_util.tree_leaves({"visual": p2})
    assert all(np.array_equal(a, b) for a, b in zip(flat_a, flat_b))
    # forward still works, and differs from no-adapter forward at init only by ~0
    pooled, _ = vit_apply(p2, TINY, jnp.ones((1, 32, 32, 3)))
    assert pooled.shape == (1, 32)

    # layer-subset injection
    _, n2 = inject_mona(jax.random.key(1), p, dim=64, bottleneck=16, num_layers=2)
    assert n2 == 2


def test_lora_injection_changes_nothing_at_init():
    """LoRA B starts at zero → forward identical to base model (lora.py:44)."""
    p = vit_init(jax.random.key(0), TINY)
    x = jax.random.normal(jax.random.key(2), (2, 32, 32, 3))
    base, _ = vit_apply(p, TINY, x)
    p2, n = inject_lora(jax.random.key(1), p, dim=64, r=4)
    assert n == 3
    out, _ = vit_apply(p2, TINY, x)
    np.testing.assert_allclose(np.asarray(base), np.asarray(out), atol=1e-6)


@pytest.mark.parametrize("family", clip_mod.FAMILIES)
def test_clip_families_encode(family):
    cfg = clip_mod.clip_config(family)
    # shrink for test speed
    import dataclasses
    vis = dataclasses.replace(cfg.vision, image_size=32, width=64, depth=2, heads=4, proj_dim=32)
    if cfg.text_kind == "bert":
        txt = dataclasses.replace(cfg.text, vocab_size=100, width=64, depth=2, heads=4,
                                  intermediate=128, embed_dim=32, context_length=16)
    else:
        txt = dataclasses.replace(cfg.text, vocab_size=100, width=64, depth=2, heads=4,
                                  embed_dim=32, context_length=16)
    cfg = dataclasses.replace(cfg, vision=vis, text=txt)
    params = clip_mod.clip_init(jax.random.key(0), cfg)
    img_emb, _ = clip_mod.encode_image(params, cfg, jnp.ones((2, 32, 32, 3)))
    tokens = jnp.array([[1, 5, 7, 99] + [0] * 12, [1, 9, 99, 0] + [0] * 12])
    txt_emb = clip_mod.encode_text(params, cfg, tokens)
    assert img_emb.shape == (2, 32)
    assert txt_emb.shape == (2, 32)
    assert np.isfinite(np.asarray(img_emb)).all()
    assert np.isfinite(np.asarray(txt_emb)).all()


def test_bfloat16_compute_path():
    cfg = clip_mod.clip_config("biomedclip", compute_dtype="bfloat16")
    import dataclasses
    vis = dataclasses.replace(cfg.vision, image_size=32, width=64, depth=2, heads=4, proj_dim=32)
    cfg = dataclasses.replace(cfg, vision=vis)
    from nextgen_uia_tpu.models.vit import vit_init as vi
    p = vi(jax.random.key(0), cfg.vision)
    pooled, _ = vit_apply(p, cfg.vision, jnp.ones((1, 32, 32, 3)), dtype=jnp.bfloat16)
    assert pooled.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(pooled, dtype=np.float32)).all()

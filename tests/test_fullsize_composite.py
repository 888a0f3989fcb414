"""Production-shape composite pipeline goldens (VERDICT r3 Next #1).

The toy composites (test_golden_pipeline.py) verify module seams at tiny
dims; shape-dependent bugs (token-grid reshapes, pad/fusion paths, pos-embed
handling) only bite at production shape. These run the reference's WHOLE
task flow in torch at the REAL ViT-B/16 configuration — vendored OpenAI CLIP
towers + reference hybrid-MONA injection (src/adapters/mona.py:495-575) +
prompt ensembles / CLIPAdapter pyramid head — against our converter + the
exact shipped driver functions, comparing final logits and loss values.

The BiomedCLIP composite cannot run in torch offline (open_clip not
installed); its towers are covered per-module at full size by
tests/test_fullsize_golden.py and the cross-tower seams are identical (one
unified ViT/driver path). MONAI is likewise absent, so loss values are
compared through our golden-tested losses evaluated on BOTH sides' logits.

Marked slow: several ViT-B/16 forwards on CPU (~2-4 min).
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import reference_loader as RL
from test_convert import _unflatten_into
from test_mona_parity import _torch_mona_to_pytree

import nextgen_uia_tpu.convert.torch_to_jax as C
from nextgen_uia_tpu.models import clip as clip_mod

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not RL.available(), reason="reference absent")]


@pytest.fixture(scope="module")
def fullsize_mona_setup():
    """Vendored CLIP at the real ViT-B/16 config with hybrid MONA injected by
    the reference's own injector, plus our converted equivalent."""
    ref_model = RL.load("src/third_party/openai_clip/model.py", "ref_openai_fsc")
    ref_mona = RL.load("src/adapters/mona.py", "ref_mona_fsc")
    torch.manual_seed(0)
    m = ref_model.CLIP(embed_dim=512, image_resolution=224, vision_layers=12,
                       vision_width=768, vision_patch_size=16,
                       context_length=77, vocab_size=49408,
                       transformer_width=512, transformer_heads=8,
                       transformer_layers=12).float().eval()
    # convert the CLEAN towers first (MONA weights ride separately, like the
    # driver's --mona_weights load)
    flat = C.convert_openai_clip(m.state_dict())

    m, n_injected = ref_mona.inject_mona_variant_to_clip(
        m, variant="hybrid", bottleneck_dim=64)
    assert n_injected == 12
    m = m.eval()

    cfg = clip_mod.clip_config("openai", mona_variant="hybrid")
    params = clip_mod.clip_init(jax.random.key(0), cfg)
    params, n = _unflatten_into(params, flat)
    assert n == len(flat)
    blocks = m.visual.transformer.resblocks
    for i, blk in enumerate(params["visual"]["blocks"]):
        blk["mona"] = _torch_mona_to_pytree(blocks[i].mona)
    return m, cfg, params


def test_fullsize_zero_shot_composite(fullsize_mona_setup):
    """Zero-shot at production shape: 224-px tower + 12 hybrid MONA adapters
    + BUSI 10-prompt ensembles -> per-class mean of 100*cos -> [B, 2] logits
    (reference flow: biomedclip/zero_shot.py:176-230, same code in
    clip/zero_shot.py). Our side runs the shipped driver functions."""
    from nextgen_uia_tpu.data.tokenizer import ClipTokenizer
    from nextgen_uia_tpu.tasks import prompts as PR
    from nextgen_uia_tpu.tasks.clip_tasks import (build_text_features,
                                                  make_zero_shot_logits_fn)

    m, cfg, params = fullsize_mona_setup
    tokenizer = ClipTokenizer()
    ensemble = PR.prompt_ensemble_for("BUSI")
    rng = np.random.default_rng(0)
    images_u8 = rng.integers(0, 255, (4, 224, 224), dtype=np.uint8)

    with torch.no_grad():
        text_feats_ref = {}
        for cls_name in PR.LESION_TYPES:
            tokens = torch.as_tensor(np.asarray(tokenizer(ensemble[cls_name], 77)))
            tf = m.encode_text(tokens)
            text_feats_ref[cls_name] = tf / tf.norm(dim=-1, keepdim=True)
        x = torch.as_tensor(images_u8).float() / 255.0
        x = x.unsqueeze(1).repeat(1, 3, 1, 1)
        img_f = m.encode_image(x)
        img_f = img_f / img_f.norm(dim=-1, keepdim=True)
        cols = [(100.0 * img_f @ text_feats_ref[c].T).mean(dim=1)
                for c in PR.LESION_TYPES]
        ref_logits = torch.stack(cols, dim=1).numpy()

    text_feats = build_text_features(params, cfg,
                                     lambda t, ctx=77: tokenizer(t, ctx),
                                     ensemble)
    image_logits = make_zero_shot_logits_fn(cfg, text_feats)
    our_logits, _ = image_logits(params, jnp.asarray(images_u8))
    our_logits = np.asarray(our_logits)

    # logits are 100*cosine: 1e-4-level feature error scales to ~1e-2
    np.testing.assert_allclose(our_logits, ref_logits, atol=2e-2, rtol=1e-4)
    # the decision-relevant quantity (benign-malignant margin) must agree
    np.testing.assert_allclose(our_logits[:, 1] - our_logits[:, 0],
                               ref_logits[:, 1] - ref_logits[:, 0],
                               atol=2e-2)


@pytest.mark.parametrize("task", ["seg", "cls"])
def test_fullsize_supervised_composite(task):
    """Supervised at production shape: tower taps {3,6,9} + hybrid MONA +
    CLIPAdapter pyramid head (reduce 512) -> 224-px seg logits / cls logits,
    then the task loss (reference flow: clip/segmentation.py prepare_model +
    train step; head stack clip_adapter.py:93-136). MONAI is not installed,
    so the DiceCE/Focal values are computed by our golden-tested losses on
    both sides' logits and compared."""
    adapter_mod = RL.load("src/third_party/openai_clip/clip_adapter.py",
                          "ref_clip_adapter_fsc")
    ref_model = RL.load("src/third_party/openai_clip/model.py", "ref_openai_fsc2")
    ref_mona = RL.load("src/adapters/mona.py", "ref_mona_fsc2")
    from nextgen_uia_tpu.models.heads import (PyramidHeadConfig,
                                              pyramid_head_apply,
                                              pyramid_head_init)

    torch.manual_seed(0)
    m = ref_model.CLIP(embed_dim=512, image_resolution=224, vision_layers=12,
                       vision_width=768, vision_patch_size=16,
                       context_length=77, vocab_size=49408,
                       transformer_width=512, transformer_heads=8,
                       transformer_layers=12).float().eval()
    flat = C.convert_openai_clip(m.state_dict())
    m, _ = ref_mona.inject_mona_variant_to_clip(m, variant="hybrid",
                                                bottleneck_dim=64)
    torch.manual_seed(1)
    head = adapter_mod.CLIPAdapter(m, extract_layers=[3, 6, 9], reduce_dim=512,
                                   num_classes=2, img_size=224, patch_size=16,
                                   task=task).float().eval()
    x = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        ref_out = head(x).numpy()

    cfg = clip_mod.clip_config("openai", mona_variant="hybrid")
    params = clip_mod.clip_init(jax.random.key(0), cfg)
    params, n = _unflatten_into(params, flat)
    assert n == len(flat)
    blocks = m.visual.transformer.resblocks
    for i, blk in enumerate(params["visual"]["blocks"]):
        blk["mona"] = _torch_mona_to_pytree(blocks[i].mona)

    hcfg = PyramidHeadConfig(feature_dim=768, reduce_dim=512, num_layers=3,
                             num_classes=2, img_size=224, task=task,
                             cls_hidden=(task == "cls"))
    hp = pyramid_head_init(jax.random.key(1), hcfg)
    hflat = C.convert_pyramid_head(head.state_dict(), num_layers=3, task=task,
                                   cls_hidden=(task == "cls"))
    hp, n = _unflatten_into(hp, hflat)
    assert n == len(hflat)

    _, acts = clip_mod.encode_image(params, cfg,
                                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                                    extract_layers=(3, 6, 9))
    our = np.asarray(pyramid_head_apply(hp, hcfg, acts))
    np.testing.assert_allclose(our, ref_out, atol=2e-3, rtol=1e-3)

    # loss seam: identical loss values from both sides' logits
    if task == "seg":
        from nextgen_uia_tpu.losses import dice_ce_loss

        masks = (np.random.default_rng(1).random((2, 1, 224, 224)) > 0.5)
        masks = jnp.asarray(masks.astype(np.int32))
        l_our = float(dice_ce_loss(jnp.asarray(our), masks))
        l_ref = float(dice_ce_loss(jnp.asarray(ref_out), masks))
    else:
        from nextgen_uia_tpu.losses import focal_loss

        labels = jnp.asarray(np.array([0, 1], np.int32))
        l_our = float(focal_loss(jnp.asarray(our), labels))
        l_ref = float(focal_loss(jnp.asarray(ref_out), labels))
    assert np.isfinite(l_our)
    np.testing.assert_allclose(l_our, l_ref, atol=1e-5, rtol=1e-5)

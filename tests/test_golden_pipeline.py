"""Composite golden PIPELINE tests (VERDICT r1 item 4).

Per-module golden tests can miss bugs between module seams (conversion,
normalization, prompt-ensemble averaging, pyramid fusion). These tests run
the reference's WHOLE flow in torch — the vendored OpenAI CLIP model driven
exactly as zero_shot.py:155-277 / clip_adapter.py:93-135 drive it — and our
pipeline (converter -> shared driver functions) on identical weights and
images, comparing FINAL logits.

The reference's BiomedCLIP tower comes from open_clip (not installed, not
vendored); the OpenAI tower is fully vendored, so the composite runs on the
'openai' family. Module-level golden tests cover the BiomedCLIP tower
(tests/test_convert.py::test_bert_conversion_golden + timm trunk).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import reference_loader as RL
from test_convert import _unflatten_into

import nextgen_uia_tpu.convert.torch_to_jax as C
from nextgen_uia_tpu.models import clip as clip_mod

pytestmark = pytest.mark.skipif(not RL.available(), reason="reference absent")


def _small_torch_clip():
    ref_model = RL.load("src/third_party/openai_clip/model.py", "ref_openai_model_pl")
    torch.manual_seed(0)
    m = ref_model.CLIP(embed_dim=32, image_resolution=64, vision_layers=2,
                       vision_width=64, vision_patch_size=16, context_length=77,
                       vocab_size=49408, transformer_width=48,
                       transformer_heads=4, transformer_layers=2).float().eval()
    return m


def _our_cfg():
    cfg = clip_mod.clip_config("openai")
    return dataclasses.replace(
        cfg,
        vision=dataclasses.replace(cfg.vision, image_size=64, width=64, depth=2,
                                   heads=1, proj_dim=32),  # ref heads = width//64
        text=dataclasses.replace(cfg.text, context_length=77, vocab_size=49408,
                                 width=48, heads=4, depth=2, embed_dim=32))


def _converted_params(m, cfg):
    flat = C.convert_openai_clip(m.state_dict(), depth=2, text_depth=2)
    params = clip_mod.clip_init(jax.random.key(0), cfg)
    params, n = _unflatten_into(params, flat)
    assert n == len(flat)
    return params


def test_zero_shot_pipeline_composite():
    """Full zero-shot flow: prompt ensembles -> tokenize -> encode_text ->
    normalize -> encode_image -> normalize -> per-class mean of 100*cos ->
    [B, 2] logits. Torch side transcribes zero_shot.py:176-230 verbatim over
    the vendored CLIP; our side runs the converter + the exact driver
    functions (tasks/clip_tasks.build_text_features /
    make_zero_shot_logits_fn)."""
    from nextgen_uia_tpu.data.tokenizer import ClipTokenizer
    from nextgen_uia_tpu.tasks import prompts as PR
    from nextgen_uia_tpu.tasks.clip_tasks import (build_text_features,
                                                  make_zero_shot_logits_fn)

    m = _small_torch_clip()
    cfg = _our_cfg()
    params = _converted_params(m, cfg)

    tokenizer = ClipTokenizer()
    ensemble = PR.prompt_ensemble_for("BUSI")
    rng = np.random.default_rng(0)
    images_u8 = rng.integers(0, 255, (12, 64, 64), dtype=np.uint8)
    labels = (np.arange(12) % 2).astype(np.int64)

    # ---- reference flow (zero_shot.py:176-230) ----
    with torch.no_grad():
        text_feats_ref = {}
        for cls_name in PR.LESION_TYPES:
            tokens = torch.as_tensor(np.asarray(tokenizer(ensemble[cls_name], 77)))
            tf = m.encode_text(tokens)
            text_feats_ref[cls_name] = tf / tf.norm(dim=-1, keepdim=True)

        x = torch.as_tensor(images_u8).float() / 255.0
        x = x.unsqueeze(1).repeat(1, 3, 1, 1)  # grayscale -> 3ch NCHW
        img_f = m.encode_image(x)
        img_f = img_f / img_f.norm(dim=-1, keepdim=True)
        cols = []
        for cls_name in PR.LESION_TYPES:
            sims = 100.0 * img_f @ text_feats_ref[cls_name].T
            cols.append(sims.mean(dim=1))
        ref_logits = torch.stack(cols, dim=1).numpy()  # [B, 2]

    # ---- our flow (the driver's own functions) ----
    text_feats = build_text_features(params, cfg, lambda t, ctx=77: tokenizer(t, ctx),
                                     ensemble)
    image_logits = make_zero_shot_logits_fn(cfg, text_feats)
    our_logits, _ = image_logits(params, jnp.asarray(images_u8))
    our_logits = np.asarray(our_logits)

    np.testing.assert_allclose(our_logits, ref_logits, atol=5e-3, rtol=1e-4)

    # downstream metrics on the (matching) logits must be finite/sane
    from nextgen_uia_tpu.metrics.segmentation import ClsAccumulator

    acc = ClsAccumulator()
    acc.update(our_logits, labels)
    stats = acc.compute()
    assert np.isfinite(stats["auc"]) and 0.0 <= stats["auc"] <= 1.0


@pytest.mark.parametrize("task", ["seg", "cls"])
def test_supervised_adapter_head_composite(task):
    """Full CLIPAdapter forward (backbone taps -> pyramid reduce/block fusion
    -> seg/cls head) vs our encode_image(extract_layers) + PyramidHead on
    converted weights (clip_adapter.py:93-135; segmentation.py:181-277
    forward path). Covers the OpenAI cls head (hidden Linear+ReLU+Dropout)."""
    from nextgen_uia_tpu.models.heads import (PyramidHeadConfig,
                                              pyramid_head_apply,
                                              pyramid_head_init)

    adapter_mod = RL.load("src/third_party/openai_clip/clip_adapter.py",
                          "ref_clip_adapter_pl")
    m = _small_torch_clip()
    cfg = _our_cfg()
    params = _converted_params(m, cfg)

    torch.manual_seed(1)
    head = adapter_mod.CLIPAdapter(m, extract_layers=[0, 1], reduce_dim=32,
                                   num_classes=2, img_size=64, patch_size=16,
                                   task=task).float().eval()
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref_out = head(x).numpy()

    hcfg = PyramidHeadConfig(feature_dim=64, reduce_dim=32, num_layers=2,
                             num_classes=2, img_size=64, task=task,
                             cls_hidden=(task == "cls"))
    hp = pyramid_head_init(jax.random.key(1), hcfg)
    flat = C.convert_pyramid_head(head.state_dict(), num_layers=2, task=task,
                                  cls_hidden=(task == "cls"))
    hp, n = _unflatten_into(hp, flat)
    assert n == len(flat)

    _, acts = clip_mod.encode_image(params, cfg,
                                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                                    extract_layers=(0, 1))
    our = np.asarray(pyramid_head_apply(hp, hcfg, acts))

    np.testing.assert_allclose(our, ref_out, atol=2e-4, rtol=1e-4)

"""Golden conversion tests: torch reference modules -> converter -> our model,
same input, same output.

These catch the silent-transposition class of bugs SURVEY.md §7 ranks as the
#1 hard part. Torch references used: the vendored OpenAI CLIP from
/root/reference (full model), HF transformers CLIPSeg decoder and BertModel
(installed locally), and the vendored DINOv2. torchvision is not installed
here, so the ResNet converter is covered by a layout round-trip test only.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reference_loader import available, load, load_with_ref_src

torch = pytest.importorskip("torch")

from nextgen_uia_tpu.convert import torch_to_jax as C


def _unflatten_into(params, flat):
    """Load a flat path->array dict into a params tree (strict, all-match)."""
    from nextgen_uia_tpu.core.partition import path_str

    used = {"n": 0}

    def leaf(p, v):
        key = path_str(p)
        if key in flat:
            used["n"] += 1
            assert tuple(flat[key].shape) == tuple(np.shape(v)), \
                f"{key}: {flat[key].shape} vs {np.shape(v)}"
            return jnp.asarray(flat[key])
        return v

    out = jax.tree_util.tree_map_with_path(leaf, params)
    return out, used["n"]


@pytest.mark.skipif(not available(), reason="reference repo not mounted")
def test_openai_clip_conversion_golden():
    ref_model = load("src/third_party/openai_clip/model.py", "ref_openai_model")
    torch.manual_seed(0)
    m = ref_model.CLIP(embed_dim=32, image_resolution=32, vision_layers=2,
                       vision_width=64, vision_patch_size=16, context_length=12,
                       vocab_size=50, transformer_width=48, transformer_heads=4,
                       transformer_layers=2).float().eval()
    img = torch.randn(2, 3, 32, 32)
    txt = torch.randint(1, 49, (2, 12))
    txt[:, -1] = 49  # EOT = max id
    with torch.no_grad():
        ref_img = m.encode_image(img).numpy()
        ref_txt = m.encode_text(txt).numpy()

    flat = C.convert_openai_clip(m.state_dict(), depth=2, text_depth=2)

    import dataclasses
    from nextgen_uia_tpu.models import clip as clip_mod

    cfg = clip_mod.clip_config("openai")
    cfg = dataclasses.replace(
        cfg,
        vision=dataclasses.replace(cfg.vision, image_size=32, width=64, depth=2,
                                   heads=1, proj_dim=32),  # ref: heads = width//64
        text=dataclasses.replace(cfg.text, context_length=12, vocab_size=50,
                                 width=48, heads=4, depth=2, embed_dim=32))
    params = clip_mod.clip_init(jax.random.key(0), cfg)
    params, n = _unflatten_into(params, flat)
    assert n == len(flat), "every converted tensor must land in the tree"

    our_img, _ = clip_mod.encode_image(params, cfg, jnp.asarray(img.numpy().transpose(0, 2, 3, 1)))
    our_txt = clip_mod.encode_text(params, cfg, jnp.asarray(txt.numpy()))
    np.testing.assert_allclose(np.asarray(our_img), ref_img, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(our_txt), ref_txt, atol=2e-4, rtol=2e-4)


def test_clipseg_decoder_conversion_golden():
    from transformers.models.clipseg.configuration_clipseg import CLIPSegConfig
    from transformers.models.clipseg.modeling_clipseg import CLIPSegForImageSegmentation

    torch.manual_seed(1)
    cfg_hf = CLIPSegConfig(
        text_config=dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, projection_dim=24),
        vision_config=dict(hidden_size=40, intermediate_size=64, num_hidden_layers=4,
                           num_attention_heads=4, image_size=32, patch_size=16,
                           projection_dim=24),
        extract_layers=[0, 1, 2], reduce_dim=16, decoder_num_attention_heads=4,
        decoder_intermediate_size=64, conditional_layer=0,
        use_complex_transposed_convolution=True, projection_dim=24)
    full = CLIPSegForImageSegmentation(cfg_hf).eval()
    dec = full.decoder

    B, N = 2, 5  # 2x2 grid + CLS
    acts = [torch.randn(B, N, 40) for _ in range(3)]
    cond = torch.randn(B, 24)
    with torch.no_grad():
        ref = dec(hidden_states=tuple(acts), conditional_embeddings=cond)[0].numpy()

    flat = C.convert_clipseg_decoder(full.state_dict(), depth=3)

    from nextgen_uia_tpu.models.heads import (ClipSegDecoderConfig,
                                              clipseg_decoder_apply,
                                              clipseg_decoder_init)

    dcfg = ClipSegDecoderConfig(hidden_size=40, reduce_dim=16, cond_dim=24,
                                heads=4, intermediate=64, extract_layers=(0, 1, 2),
                                patch_size=16)
    params = clipseg_decoder_init(jax.random.key(0), dcfg)
    params, n = _unflatten_into(params, flat)
    assert n == len(flat)
    ours = clipseg_decoder_apply(params, dcfg,
                                 [jnp.asarray(a.numpy()) for a in acts],
                                 jnp.asarray(cond.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref.reshape(ours.shape), atol=2e-4, rtol=2e-4)


def test_bert_conversion_golden():
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    torch.manual_seed(2)
    hf = BertModel(HFBertConfig(vocab_size=60, hidden_size=32, num_hidden_layers=2,
                                num_attention_heads=4, intermediate_size=64,
                                max_position_embeddings=20),
                   add_pooling_layer=False).eval()
    ids = torch.randint(1, 59, (2, 10))
    mask = torch.ones_like(ids)
    mask[1, 6:] = 0
    with torch.no_grad():
        ref_cls = hf(input_ids=ids, attention_mask=mask).last_hidden_state[:, 0].numpy()

    # adapt HF names to the open_clip-wrapped layout the converter expects
    sd = {f"text.transformer.{k}": v for k, v in hf.state_dict().items()}
    sd["text.proj.0.weight"] = torch.eye(32)  # identity mlp proj for the test
    sd["text.proj.2.weight"] = torch.eye(32)
    # visual side not under test: fabricate a minimal trunk? -> use text-only path
    flat = {k: v for k, v in C.convert_biomedclip(
        {**sd, **_dummy_trunk_sd()}, depth=1, text_depth=2).items()
        if k.startswith("text/")}

    import dataclasses
    from nextgen_uia_tpu.models.bert import BertConfig, bert_apply, bert_init

    bcfg = BertConfig(vocab_size=60, width=32, depth=2, heads=4, intermediate=64,
                      max_positions=20, embed_dim=32, context_length=10)
    params = {"text": bert_init(jax.random.key(0), bcfg)}
    params, n = _unflatten_into(params, flat)
    assert n == len(flat)
    # gelu(identity-proj) on CLS: invert the proj to compare raw CLS
    out = bert_apply(params["text"], bcfg, jnp.asarray(ids.numpy()),
                     attention_mask=jnp.asarray(mask.numpy().astype(np.float32)))
    # our output = fc2(gelu(fc1(cls))) with identity fc1/fc2 -> gelu(cls)
    from nextgen_uia_tpu.nn.layers import gelu
    expected = np.asarray(gelu(jnp.asarray(ref_cls)))
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-4, rtol=2e-4)


def _dummy_trunk_sd():
    """Minimal timm-trunk tensors so convert_biomedclip(depth=1) runs."""
    d = {}
    t = torch.randn
    d["visual.trunk.patch_embed.proj.weight"] = t(8, 3, 4, 4)
    d["visual.trunk.patch_embed.proj.bias"] = t(8)
    d["visual.trunk.cls_token"] = t(1, 1, 8)
    d["visual.trunk.pos_embed"] = t(1, 5, 8)
    b = "visual.trunk.blocks.0."
    d[b + "attn.qkv.weight"] = t(24, 8)
    d[b + "attn.qkv.bias"] = t(24)
    d[b + "attn.proj.weight"] = t(8, 8)
    d[b + "attn.proj.bias"] = t(8)
    for n in ("norm1", "norm2"):
        d[b + n + ".weight"] = t(8)
        d[b + n + ".bias"] = t(8)
    d[b + "mlp.fc1.weight"] = t(16, 8)
    d[b + "mlp.fc1.bias"] = t(16)
    d[b + "mlp.fc2.weight"] = t(8, 16)
    d[b + "mlp.fc2.bias"] = t(8)
    d["visual.trunk.norm.weight"] = t(8)
    d["visual.trunk.norm.bias"] = t(8)
    d["visual.head.proj.weight"] = t(4, 8)
    return d


@pytest.mark.skipif(not available(), reason="reference repo not mounted")
def test_dinov2_conversion_golden():
    ref_vt = load_with_ref_src("src.third_party.dino.vision_transformer")
    torch.manual_seed(3)
    m = ref_vt.DinoVisionTransformer(img_size=28, patch_size=14, embed_dim=32,
                                     depth=2, num_heads=4, mlp_ratio=2,
                                     init_values=1e-5).float().eval()
    x = torch.randn(2, 3, 28, 28)
    with torch.no_grad():
        ref = m.forward_features(x)
        ref_cls = ref["x_norm_clstoken"].numpy()
        ref_patch = ref["x_norm_patchtokens"].numpy()
        inter = m.get_intermediate_layers(x, 2, return_class_token=True)
        ref_inter0 = inter[0][0].numpy()

    flat = C.convert_dinov2(m.state_dict(), depth=2)

    import dataclasses
    from nextgen_uia_tpu.models import dinov2 as DV

    cfg = dataclasses.replace(DV.DINOV2_B14, image_size=28, patch_size=14,
                              width=32, depth=2, heads=4, mlp_ratio=2.0)
    params = DV.dinov2_init(jax.random.key(0), cfg)
    params, n = _unflatten_into(params, flat)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    ours = DV.forward_features(params, xj, cfg)
    np.testing.assert_allclose(np.asarray(ours["x_norm_clstoken"]), ref_cls,
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(ours["x_norm_patchtokens"]), ref_patch,
                               atol=2e-4, rtol=2e-4)
    our_inter = DV.get_intermediate_layers(params, xj, 2, cfg)
    np.testing.assert_allclose(np.asarray(our_inter[0][0]), ref_inter0,
                               atol=2e-4, rtol=2e-4)


def test_conv_transpose_matches_torch():
    """conv_transpose2d helper == torch ConvTranspose2d (weights via _convT)."""
    torch.manual_seed(4)
    tc = torch.nn.ConvTranspose2d(3, 5, kernel_size=4, stride=4)
    x = torch.randn(2, 3, 8, 8)
    with torch.no_grad():
        ref = tc(x).numpy()
    sd = {k: v.detach().numpy() for k, v in tc.state_dict().items()}
    p = {"w": jnp.asarray(sd["weight"].transpose(2, 3, 0, 1)),
         "b": jnp.asarray(sd["bias"])}
    from nextgen_uia_tpu.nn.layers import conv_transpose2d

    out = conv_transpose2d(p, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), stride=4)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=1e-5, rtol=1e-5)


@pytest.mark.skipif(not available(), reason="reference repo not mounted")
def test_modified_resnet_conversion_golden():
    """CLIP ModifiedResNet tower (model.py:102-160) vs our NHWC rebuild."""
    ref_model = load("src/third_party/openai_clip/model.py", "ref_openai_model")
    torch.manual_seed(5)
    m = ref_model.ModifiedResNet(layers=(1, 1, 1, 1), output_dim=32, heads=2,
                                 input_resolution=64, width=16).float().eval()
    # randomize BN affine + running stats so swaps/transpositions can't hide
    for mod in m.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            with torch.no_grad():
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.uniform_(-0.5, 0.5)
                mod.running_mean.uniform_(-0.3, 0.3)
                mod.running_var.uniform_(0.5, 1.5)
    img = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref = m(img).numpy()

    from nextgen_uia_tpu.models import clip_resnet as CR

    cfg = CR.ModifiedResNetConfig(layers=(1, 1, 1, 1), output_dim=32, heads=2,
                                  input_resolution=64, width=16)
    flat_p, flat_s = C.convert_modified_resnet(m.state_dict(), layers=cfg.layers,
                                               prefix="")
    params, state = CR.modified_resnet_init(jax.random.key(0), cfg)
    params, np_ = _unflatten_into(params, flat_p)
    state, ns_ = _unflatten_into(state, flat_s)
    assert np_ == len(flat_p) and ns_ == len(flat_s)

    out = CR.modified_resnet_apply(params, state,
                                   jnp.asarray(img.numpy().transpose(0, 2, 3, 1)), cfg)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


@pytest.mark.skipif(not available(), reason="reference repo not mounted")
def test_convert_cli_roundtrip(tmp_path):
    """The converter CLI surface: torch .pt state dict -> .npz archive."""
    ref_vt = load_with_ref_src("src.third_party.dino.vision_transformer")
    torch.manual_seed(7)
    m = ref_vt.DinoVisionTransformer(img_size=28, patch_size=14, embed_dim=32,
                                     depth=2, num_heads=4, mlp_ratio=2,
                                     init_values=1e-5).float().eval()
    src = tmp_path / "dino.pth"
    torch.save(m.state_dict(), src)
    dst = tmp_path / "dino.npz"
    from nextgen_uia_tpu.convert.torch_to_jax import main as convert_main

    convert_main(["dinov2", str(src), str(dst)])
    flat = np.load(dst)
    assert len(flat.files) > 10
    assert any("patch" in k for k in flat.files)

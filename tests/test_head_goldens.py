"""Output-parity goldens for the task heads (VERDICT r3 Weak #2): the vendored
reference modules are instantiated offline, weights run through the
converters, and outputs compared on identical inputs.

Covers: TimmCLIPAdapter + CLIPAdapter pyramid heads (seg + both cls
flavours, timm/clip_adapter.py:29-160 / openai_clip/clip_adapter.py:11-136),
DINOv2 ClassificationHead/LinearDecoder/UNetDecoder (dino/dinov2.py:33-200),
and the baseline UNet (third_party/unet.py:119-143). The backbone forward is
not under test here (covered by tests/test_fullsize_golden.py) — reference
``extract_vit_features`` is stubbed with fixed activations so the heads see
identical inputs.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reference_loader import (available, ensure_torchvision_stub, load,
                              load_with_ref_src)
from test_convert import _unflatten_into

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not available(), reason="reference repo not mounted")
ensure_torchvision_stub()

from nextgen_uia_tpu.convert import torch_to_jax as C


def _randomize_bn(m):
    """BN affine + running stats off their defaults so layout bugs can't hide."""
    for mod in m.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            with torch.no_grad():
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.uniform_(-0.5, 0.5)
                mod.running_mean.uniform_(-0.3, 0.3)
                mod.running_var.uniform_(0.5, 1.5)


# ---------------------------------------------------------------------------
# Pyramid heads (TimmCLIPAdapter / CLIPAdapter)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("task", ["seg", "cls"])
def test_timm_pyramid_head_golden(task):
    """timm/clip_adapter.py:121-160 head stack vs our PyramidHead, batch-first
    activations. feature_dim is hardcoded 768 in the reference (:28)."""
    mod = load("src/third_party/timm/clip_adapter.py", "ref_timm_adapter")
    torch.manual_seed(10)
    m = mod.TimmCLIPAdapter(clip_model=torch.nn.Module(), extract_layers=[0, 1, 2],
                            reduce_dim=16, num_classes=2, img_size=32,
                            task=task).float().eval()
    B, N = 2, 5  # 2x2 grid + CLS
    acts = [torch.randn(B, N, 768) for _ in range(3)]
    m.extract_vit_features = lambda x: (None, [a.clone() for a in acts])
    with torch.no_grad():
        ref = m(torch.zeros(B, 3, 32, 32)).numpy()

    flat = C.convert_pyramid_head(m.state_dict(), task=task)

    from nextgen_uia_tpu.models.heads import (PyramidHeadConfig,
                                              pyramid_head_apply,
                                              pyramid_head_init)

    cfg = PyramidHeadConfig(feature_dim=768, reduce_dim=16, num_layers=3,
                            num_classes=2, img_size=32, task=task)
    params = pyramid_head_init(jax.random.key(0), cfg)
    params, n = _unflatten_into(params, flat)
    assert n == len(flat)
    ours = pyramid_head_apply(params, cfg, [jnp.asarray(a.numpy()) for a in acts])
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("task", ["seg", "cls"])
def test_openai_pyramid_head_golden(task):
    """openai_clip/clip_adapter.py:94-136 head stack (seq-first activations;
    cls flavour has the hidden Linear+ReLU+Dropout, :51-58)."""
    mod = load("src/third_party/openai_clip/clip_adapter.py", "ref_openai_adapter")

    class _Stub:
        pass

    stub = _Stub()
    stub.visual = _Stub()
    stub.visual.transformer = _Stub()
    stub.visual.transformer.width = 24
    torch.manual_seed(11)
    m = mod.CLIPAdapter(clip_model=stub, extract_layers=[0, 1, 2],
                        reduce_dim=16, num_classes=2, img_size=32,
                        task=task).float().eval()
    B, N = 2, 5
    acts = [torch.randn(N, B, 24) for _ in range(3)]  # LND seq-first
    m.extract_vit_features = lambda x: (None, [a.clone() for a in acts])
    with torch.no_grad():
        ref = m(torch.zeros(B, 3, 32, 32)).numpy()

    flat = C.convert_pyramid_head(m.state_dict(), task=task,
                                  cls_hidden=(task == "cls"))

    from nextgen_uia_tpu.models.heads import (PyramidHeadConfig,
                                              pyramid_head_apply,
                                              pyramid_head_init)

    cfg = PyramidHeadConfig(feature_dim=24, reduce_dim=16, num_layers=3,
                            num_classes=2, img_size=32, task=task,
                            cls_hidden=(task == "cls"))
    params = pyramid_head_init(jax.random.key(0), cfg)
    params, n = _unflatten_into(params, flat)
    assert n == len(flat)
    # our apply takes batch-first activations
    acts_bf = [jnp.asarray(a.numpy().transpose(1, 0, 2)) for a in acts]
    ours = pyramid_head_apply(params, cfg, acts_bf)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)


# ---------------------------------------------------------------------------
# DINOv2 heads
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("layers", [1, 4])
def test_dinov2_cls_head_golden(layers):
    dino = load_with_ref_src("src.third_party.dino.dinov2")
    torch.manual_seed(12)
    m = dino.ClassificationHead(embed_dim=16, num_classes=2, layers=layers).float().eval()
    B, NP = 2, 9
    if layers == 1:
        feats_t = {"x_norm_clstoken": torch.randn(B, 16),
                   "x_norm_patchtokens": torch.randn(B, NP, 16)}
        feats_j = {k: jnp.asarray(v.numpy()) for k, v in feats_t.items()}
    else:
        feats_t = [(torch.randn(B, NP, 16), torch.randn(B, 16)) for _ in range(4)]
        feats_j = [(jnp.asarray(p.numpy()), jnp.asarray(c.numpy())) for p, c in feats_t]
    with torch.no_grad():
        ref = m(feats_t).numpy()

    flat = C.convert_dinov2_cls_head(m.state_dict())

    from nextgen_uia_tpu.models.dinov2 import cls_head_apply, cls_head_init

    params = cls_head_init(jax.random.key(0), 16, num_classes=2, layers=layers)
    params, n = _unflatten_into(params, flat)
    assert n == len(flat)
    ours = cls_head_apply(params, feats_j, layers=layers)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-5)


def test_dinov2_linear_decoder_golden():
    dino = load_with_ref_src("src.third_party.dino.dinov2")
    torch.manual_seed(13)
    m = dino.LinearDecoder(in_channels=16, num_classes=3, image_size=28,
                           patch_size=14).float().eval()
    B, g = 2, 2
    tokens = torch.randn(B, g * g, 16)
    with torch.no_grad():
        ref = m(tokens).numpy()

    flat = C.convert_dinov2_linear_decoder(m.state_dict())

    from nextgen_uia_tpu.models.dinov2 import (linear_decoder_apply,
                                               linear_decoder_init)

    params = linear_decoder_init(jax.random.key(0), 16, num_classes=3)
    params, n = _unflatten_into(params, flat)
    assert n == len(flat)
    ours = linear_decoder_apply(params, jnp.asarray(tokens.numpy()),
                                image_size=28, patch_size=14)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-5)


def test_dinov2_unet_decoder_golden():
    """UNetDecoder over 5 intermediate layers incl. the align_corners=True
    skip upsample (dinov2.py:149) and the torchvision bicubic final resize
    (resize_image=True, :197-199)."""
    dino = load_with_ref_src("src.third_party.dino.dinov2")
    torch.manual_seed(14)
    m = dino.UNetDecoder(in_channels=32, out_channels=2, image_size=28,
                         resize_image=True, patch_size=14).float().eval()
    _randomize_bn(m)
    B, g = 2, 2
    feats_t = [(torch.randn(B, g * g, 32), torch.randn(B, 32)) for _ in range(5)]
    with torch.no_grad():
        ref = m(feats_t).numpy()

    flat_p, flat_s = C.convert_dinov2_unet_decoder(m.state_dict())

    from nextgen_uia_tpu.models.dinov2 import (unet_decoder_apply,
                                               unet_decoder_init)

    params, state = unet_decoder_init(jax.random.key(0), 32, num_classes=2)
    params, np_ = _unflatten_into(params, flat_p)
    state, ns_ = _unflatten_into(state, flat_s)
    assert np_ == len(flat_p) and ns_ == len(flat_s)
    feats_j = [(jnp.asarray(p.numpy()), jnp.asarray(c.numpy())) for p, c in feats_t]
    ours, _ = unet_decoder_apply(params, state, feats_j, image_size=28,
                                 patch_size=14, train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)


# ---------------------------------------------------------------------------
# Baseline UNet
# ---------------------------------------------------------------------------


def test_unet_baseline_golden():
    ref_unet = load("src/third_party/unet.py", "ref_unet")
    torch.manual_seed(15)
    m = ref_unet.UNet(in_channels=3, num_classes=2, init_channels=8).float().eval()
    _randomize_bn(m)
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref = m(x).numpy()

    flat_p, flat_s = C.convert_unet(m.state_dict())

    from nextgen_uia_tpu.models.unet import unet_apply, unet_init

    params, state = unet_init(jax.random.key(0), 3, 2, init_channels=8)
    params, np_ = _unflatten_into(params, flat_p)
    state, ns_ = _unflatten_into(state, flat_s)
    assert np_ == len(flat_p) and ns_ == len(flat_s)
    ours, _ = unet_apply(params, state, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                         train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)

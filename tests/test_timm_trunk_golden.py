"""Torch-forward golden for the open_clip/timm visual-trunk layout
(VERDICT r4 missing #1).

The flagship BiomedCLIP tower is a timm VisionTransformer
(`visual.trunk.blocks` with PACKED qkv — the layout MONA injection keys off
at /root/reference/src/adapters/mona.py:619-630 and the converter unpacks in
convert_timm_vit). open_clip/timm are not installed offline, so this mirrors
a minimal timm ViT-B/16 in torch — same module naming, same qkv packing,
same forward math as timm's VisionTransformer (and as the reference's own
vendored driver, src/third_party/timm/clip_adapter.py:77-116: patch_embed ->
cls_token cat -> +pos_embed -> blocks -> norm) — and goldens our
convert_timm_vit + vit_apply end-to-end at the REAL ViT-B/16 configuration:

  1. clean trunk forward (pooled CLS embedding through the open_clip
     head.proj) — the encode_image path;
  2. pyramid taps {3,6,9} — the supervised extract_vit_features path;
  3. hybrid-MONA-injected forward, injected by the reference's OWN
     inject_mona_variant_to_open_clip on the mirror (exercising the
     trunk.embed_dim / patch_embed.num_patches / blocks discovery).

Marked slow: ViT-B/16 forwards on CPU.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn

import reference_loader as RL
from test_convert import _unflatten_into
from test_mona_parity import _torch_mona_to_pytree

import nextgen_uia_tpu.convert.torch_to_jax as C
from nextgen_uia_tpu.models import vit as V

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not RL.available(), reason="reference absent")]

DIM, DEPTH, HEADS, IMG, PATCH, EMBED = 768, 12, 12, 224, 16, 512


class _TimmAttention(nn.Module):
    """timm.models.vision_transformer.Attention: packed qkv Linear(D, 3D),
    per-head scaled dot product, proj Linear(D, D). q_norm/k_norm are
    Identity at vit_base_patch16_224 (qk_norm=False)."""

    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = (self.qkv(x).reshape(B, N, 3, self.num_heads, self.head_dim)
               .permute(2, 0, 3, 1, 4))
        q, k, v = qkv.unbind(0)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class _TimmMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()  # timm default: exact erf GELU
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class _TimmBlock(nn.Module):
    """timm Block: pre-norm, LayerScale/DropPath are Identity at B/16."""

    def __init__(self, dim, num_heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = _TimmAttention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _TimmMlp(dim, dim * 4)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class _TimmPatchEmbed(nn.Module):
    def __init__(self, img_size, patch_size, dim):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, patch_size, stride=patch_size)
        self.num_patches = (img_size // patch_size) ** 2

    def forward(self, x):
        x = self.proj(x)
        return x.flatten(2).transpose(1, 2)  # [B, N, C]


class _TimmViT(nn.Module):
    """Minimal timm VisionTransformer (class_token, no_embed_class=False,
    global_pool='token', num_classes=0): exactly the trunk open_clip's
    TimmModel builds for BiomedCLIP. State-dict names match timm's."""

    def __init__(self, img_size=IMG, patch_size=PATCH, dim=DIM, depth=DEPTH,
                 num_heads=HEADS):
        super().__init__()
        self.embed_dim = dim
        self.patch_embed = _TimmPatchEmbed(img_size, patch_size, dim)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(
            torch.randn(1, self.patch_embed.num_patches + 1, dim) * 0.02)
        self.pos_drop = nn.Dropout(0.0)
        self.blocks = nn.ModuleList(
            [_TimmBlock(dim, num_heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward_features(self, x):
        x = self.patch_embed(x)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat((cls, x), dim=1)
        x = self.pos_drop(x + self.pos_embed)
        for blk in self.blocks:
            x = blk(x)  # goes through the instance attr (MONA monkey-patch)
        return self.norm(x)

    def forward(self, x):
        return self.forward_features(x)[:, 0]  # global_pool='token'


class _TimmHead(nn.Module):
    """open_clip TimmModel head with proj='linear': Linear(768, 512, no
    bias) — state-dict key visual.head.proj.weight (convert_biomedclip
    candidate #1)."""

    def __init__(self, dim, embed):
        super().__init__()
        self.proj = nn.Linear(dim, embed, bias=False)

    def forward(self, x):
        return self.proj(x)


class _BiomedVisual(nn.Module):
    def __init__(self):
        super().__init__()
        self.trunk = _TimmViT()
        self.head = _TimmHead(DIM, EMBED)

    def forward(self, x):
        return self.head(self.trunk(x))


class _BiomedCLIPMirror(nn.Module):
    """Container so state_dict keys read visual.trunk.* / visual.head.* and
    the reference injector's hasattr(model, 'visual') discovery works."""

    def __init__(self):
        super().__init__()
        self.visual = _BiomedVisual()


@pytest.fixture(scope="module")
def mirror_and_params():
    torch.manual_seed(0)
    m = _BiomedCLIPMirror().float().eval()
    # break the zero-init cls_token so the golden is non-trivial there
    with torch.no_grad():
        m.visual.trunk.cls_token.normal_(0, 0.02)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    tree = C.convert_timm_vit(sd, "visual.trunk.", DEPTH)
    # the visual.head.proj attach, as convert_biomedclip does (torch_to_jax.py)
    tree["proj"] = {"w": sd["visual.head.proj.weight"].T}
    cfg = V.VIT_B16_TIMM
    params = V.vit_init(jax.random.key(0), cfg)
    flat = C._flat(tree)
    flat_params, n = _unflatten_into(params, flat)
    assert n == len(flat)
    return m, cfg, flat_params


def test_timm_trunk_forward_golden(mirror_and_params):
    """Clean-trunk encode_image path: patch -> cls/pos -> 12 packed-qkv
    blocks -> norm -> CLS -> head.proj, torch mirror vs convert_timm_vit +
    vit_apply at ViT-B/16 dims."""
    m, cfg, params = mirror_and_params
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        ref = m.visual(torch.as_tensor(x)).numpy()
    pooled, _ = V.vit_apply(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(pooled), ref, atol=1e-4, rtol=1e-4)


def test_timm_trunk_taps_golden(mirror_and_params):
    """Pyramid taps {3,6,9}: the supervised extract_vit_features path
    (src/third_party/timm/clip_adapter.py:58-116) — post-block token states
    must agree, not just the pooled output."""
    m, cfg, params = mirror_and_params
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, IMG, IMG)).astype(np.float32)
    trunk = m.visual.trunk
    with torch.no_grad():
        t = torch.as_tensor(x)
        h = trunk.patch_embed(t)
        h = torch.cat((trunk.cls_token.expand(h.shape[0], -1, -1), h), dim=1)
        h = h + trunk.pos_embed
        ref_taps = []
        for i, blk in enumerate(trunk.blocks):
            h = blk(h)
            if i in (3, 6, 9):
                ref_taps.append(h.numpy())
    _, taps = V.vit_apply(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)),
                          extract_layers=(3, 6, 9))
    assert len(taps) == 3
    for ours, ref in zip(taps, ref_taps):
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4, rtol=1e-4)


def test_timm_trunk_mona_injected_golden(mirror_and_params):
    """Hybrid MONA injected by the reference's OWN open_clip injector
    (mona.py:578-686: trunk discovery, grid from patch_embed.num_patches,
    BatchFirstMonaWrapper, post-block monkey-patch) vs our declarative mona
    slots on the converted trunk."""
    m, cfg, params = mirror_and_params
    ref_mona = RL.load("src/adapters/mona.py", "ref_mona_timm_golden")
    torch.manual_seed(7)
    m2, n_injected = ref_mona.inject_mona_variant_to_open_clip(
        m, variant="hybrid", bottleneck_dim=64)
    assert n_injected == DEPTH
    m2 = m2.eval()
    import copy

    params = copy.deepcopy(params)
    for i, blk in enumerate(params["blocks"]):
        blk["mona"] = _torch_mona_to_pytree(m2.visual.trunk.blocks[i].mona.clip_mona)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        ref = m2.visual(torch.as_tensor(x)).numpy()
    pooled, _ = V.vit_apply(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(pooled), ref, atol=2e-4, rtol=2e-4)

"""Golden-parity tests: our TPU-native MONA/LoRA/losses vs the reference torch code.

Strategy: build a torch reference module, copy its weights into our pytree
layout, run both on the same input, compare. This validates the re-design
(folded 7x7 depthwise kernels, declarative slots) against the reference
semantics without copying any reference code.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reference_loader import available, load

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(not available(), reason="reference repo not mounted")

B, N, D, C, HW = 2, 197, 768, 64, (14, 14)


@pytest.fixture(scope="module")
def ref_mona():
    return load("src/adapters/mona.py", "ref_mona")


@pytest.fixture(scope="module")
def ref_losses():
    return load("src/losses/losses.py", "ref_losses")


def _torch_mona_to_pytree(m):
    """Copy torch MONA module weights into our param layout."""
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}

    def dw(prefix, k):
        # torch depthwise conv weight [C,1,k,k] -> HWIO [k,k,1,C]
        w = sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)
        return {"w": jnp.asarray(w), "b": jnp.asarray(sd[f"{prefix}.bias"])}

    p = {
        "norm": {"scale": jnp.asarray(sd["norm.weight"]), "bias": jnp.asarray(sd["norm.bias"])},
        "gamma": jnp.asarray(sd["gamma"]),
        "gammax": jnp.asarray(sd["gammax"]),
        "down": {"w": jnp.asarray(sd["project1.weight"].T), "b": jnp.asarray(sd["project1.bias"])},
        "up": {"w": jnp.asarray(sd["project2.weight"].T), "b": jnp.asarray(sd["project2.bias"])},
        "conv3": dw("adapter_conv.conv1", 3),
        "conv5": dw("adapter_conv.conv2", 5),
        "conv7": dw("adapter_conv.conv3", 7),
        "pw": {"w": jnp.asarray(sd["adapter_conv.projector.weight"].transpose(2, 3, 1, 0)),
               "b": jnp.asarray(sd["adapter_conv.projector.bias"])},
    }
    if "adapter_conv.freq_filter" in sd:
        p["freq_filter"] = jnp.asarray(sd["adapter_conv.freq_filter"])
    if "adapter_conv.noise_estimator.1.weight" in sd:
        p["noise_est"] = {
            "fc1": {"w": jnp.asarray(sd["adapter_conv.noise_estimator.1.weight"][:, :, 0, 0].T),
                    "b": jnp.asarray(sd["adapter_conv.noise_estimator.1.bias"])},
            "fc2": {"w": jnp.asarray(sd["adapter_conv.noise_estimator.3.weight"][:, :, 0, 0].T),
                    "b": jnp.asarray(sd["adapter_conv.noise_estimator.3.bias"])},
        }
    return p


@pytest.mark.parametrize("variant,cls_name", [
    ("baseline", "BaselineMona"),
    ("noise_aware", "NoiseAwareMona"),
    ("freq_enhanced", "FreqEnhancedMona"),
    ("hybrid", "HybridNoiseFreqMona"),
])
def test_mona_variant_parity(ref_mona, variant, cls_name):
    from nextgen_uia_tpu.adapters.mona import mona_apply

    torch.manual_seed(0)
    m = getattr(ref_mona, cls_name)(D, C).eval()
    # randomize weights so the test is non-trivial (gamma starts at 1e-6)
    with torch.no_grad():
        for prm in m.parameters():
            prm.add_(torch.randn_like(prm) * 0.05)

    x = torch.randn(N, B, D)  # reference takes sequence-first
    with torch.no_grad():
        ref_out = m(x, HW).permute(1, 0, 2).numpy()  # -> [B, N, D]

    p = _torch_mona_to_pytree(m)
    ours = mona_apply(p, jnp.asarray(x.permute(1, 0, 2).numpy()), HW, variant=variant, rng=None)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-5, rtol=2e-5)


def test_info_nce_parity(ref_losses):
    from nextgen_uia_tpu.losses import info_nce

    torch.manual_seed(1)
    img = torch.randn(8, 512)
    txt = torch.randn(8, 512)
    ref = ref_losses.InfoNCELoss(temperature=0.07)(img, txt).item()
    ours = float(info_nce(jnp.asarray(img.numpy()), jnp.asarray(txt.numpy())))
    assert abs(ref - ours) < 1e-5


def test_lora_linear_parity():
    """LinearLoRA forward vs our inline LoRA delta (scaling alpha/sqrt(r))."""
    ref_lora = load("src/adapters/lora.py", "ref_lora")
    from nextgen_uia_tpu.nn.attention import mha
    from nextgen_uia_tpu.nn.layers import linear

    torch.manual_seed(2)
    base = torch.nn.Linear(D, D)
    ll = ref_lora.LinearLoRA(base, r=16, lora_alpha=32, dropout_rate=0.0).eval()
    with torch.no_grad():
        ll.w_lora_A.add_(torch.randn_like(ll.w_lora_A) * 0.1)
        ll.w_lora_B.add_(torch.randn_like(ll.w_lora_B) * 0.1)

    x = torch.randn(B, D)
    with torch.no_grad():
        ref_out = ll(x).numpy()

    p = {"w": jnp.asarray(ll.weight.detach().numpy().T), "b": jnp.asarray(ll.bias.detach().numpy())}
    a = jnp.asarray(ll.w_lora_A.detach().numpy().T)  # [in, r]
    b_mat = jnp.asarray(ll.w_lora_B.detach().numpy().T)  # [r, out]
    xj = jnp.asarray(x.numpy())
    scale = 32.0 / np.sqrt(16)
    ours = linear(p, xj) + (xj @ a) @ b_mat * scale
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-5, rtol=1e-5)

"""Retrieval metrics semantics + augmentation primitive parity with PIL."""

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image, ImageOps

from nextgen_uia_tpu.data import augment as A
from nextgen_uia_tpu.tasks.clip_finetune import retrieval_metrics


def test_retrieval_metrics_identity():
    n = 20
    sim = np.eye(n) * 10 + np.random.default_rng(0).normal(size=(n, n)) * 0.1
    m = retrieval_metrics(sim)
    assert m["i2t"]["r1"] == 100.0 and m["t2i"]["r1"] == 100.0
    # default K = [1,2,5,10] (retrieval.py:84-91): rSum = 8 × 100
    assert m["i2t"]["medr"] == 1.0 and m["rsum"] == 800.0


def test_retrieval_metrics_ranked():
    # item 0's true match ranked 3rd for i2t
    sim = np.eye(4) * 5.0
    sim[0] = [1.0, 6.0, 7.0, 0.0]
    m = retrieval_metrics(sim)
    assert m["i2t"]["r1"] == 75.0
    assert m["i2t"]["r2"] == 75.0   # rank 2 (0-based) not < 2
    assert m["i2t"]["r5"] == 100.0
    assert m["i2t"]["meanr"] > 1.0


def test_retrieval_metrics_custom_k_values():
    sim = np.eye(4) * 5.0
    sim[0] = [1.0, 6.0, 7.0, 0.0]  # item 0's match at rank 3 (1-based)
    m = retrieval_metrics(sim, k_values=[3])
    assert set(m["i2t"]) == {"r3", "medr", "meanr"}
    assert m["i2t"]["r3"] == 100.0
    assert m["rsum"] == m["i2t"]["r3"] + m["t2i"]["r3"]


def _pil_roundtrip(fn_jax, fn_pil, img_u8, **kw):
    ours = np.asarray(fn_jax(jnp.asarray(img_u8, jnp.float32)[..., None] / 255.0, **kw))
    ours_u8 = np.round(ours[..., 0] * 255.0).astype(np.int64)
    ref = np.asarray(fn_pil(Image.fromarray(img_u8, "L"))).astype(np.int64)
    return np.abs(ours_u8 - ref)


def test_augment_primitives_match_pil():
    rng = np.random.default_rng(0)
    img = rng.integers(10, 240, (32, 32), dtype=np.uint8)

    d = _pil_roundtrip(A._autocontrast, ImageOps.autocontrast, img)
    assert d.max() <= 1

    d = _pil_roundtrip(lambda x: A._solarize(x, 128),
                       lambda im: ImageOps.solarize(im, 128), img)
    assert d.max() <= 1

    d = _pil_roundtrip(lambda x: A._posterize(x, 4),
                       lambda im: ImageOps.posterize(im, 4), img)
    assert d.max() == 0

    d = _pil_roundtrip(A._equalize, ImageOps.equalize, img)
    assert d.mean() <= 2.0  # cumulative-histogram LUT; integer-rounding slack


def test_brightness_contrast_semantics():
    img = jnp.full((8, 8, 1), 0.5)
    np.testing.assert_allclose(np.asarray(A._brightness(img, 1.2)), 0.6, atol=1e-6)
    # contrast at factor 0 collapses to the mean
    out = A._contrast(img + 0.1, 0.0)
    assert np.allclose(np.asarray(out), np.asarray(out).mean(), atol=1e-3)


# ---------------------------------------------------------------------------
# Composition-law parity vs the reference StrongAugmentation/WeakAugmentation
# (VERDICT r3 #6): k ~ U{0..n} ops WITH replacement, applied sequentially.
# ---------------------------------------------------------------------------

import pytest

from reference_loader import available, ensure_torchvision_stub, load


@pytest.fixture(scope="module")
def ref_aug():
    if not available():
        pytest.skip("reference repo not mounted")
    ensure_torchvision_stub()
    return load("src/datasets/classification.py", "ref_cls_aug")


def _base_image():
    return np.random.default_rng(0).integers(10, 246, (32, 32), dtype=np.uint8)


def test_strong_composition_distribution(ref_aug):
    """Our scan-over-slots strong aug matches the reference's sequential
    k~U{0..9}-with-replacement law in distribution. Measured deltas (N=600,
    this fixture image): interior mean-image max 7.9 gray levels (pure
    sampling noise at ~2.9 se/pixel), per-draw global mean 119.8 vs 121.3,
    P(output unchanged) 0.118 vs 0.107 (analytic sum_k (1/10)(1/9)^k ~
    0.1125). The pre-r4 independent p=0.5 gating fails the P(unchanged)
    bound decisively (2^-8 ~ 0.004)."""
    import random

    base = _base_image()
    n = 400
    np.random.seed(1)
    random.seed(1)
    sa = ref_aug.StrongAugmentation()
    pil = Image.fromarray(base, "L")
    ref_outs = np.stack([np.asarray(sa(pil), np.float64) for _ in range(n)])

    keys = jax.random.split(jax.random.PRNGKey(1), n)
    basef = jnp.asarray(base, jnp.float32)[..., None] / 255.0
    ours = np.asarray(jax.vmap(lambda k: A._strong_single(k, basef))(keys))
    ours = ours[..., 0].astype(np.float64) * 255.0

    d_mean = np.abs(ref_outs.mean(0) - ours.mean(0))
    assert d_mean[3:-3, 3:-3].max() <= 14.0, d_mean.max()  # interior: no PIL edge-pad effects
    assert abs(ref_outs.mean() - ours.mean()) <= 5.0
    assert abs(ref_outs.std((1, 2)).mean() - ours.std((1, 2)).mean()) <= 6.0
    p_ref = np.mean([np.array_equal(r, base) for r in ref_outs])
    p_ours = np.mean([np.array_equal(np.round(o), base) for o in ours])
    assert abs(p_ref - p_ours) <= 0.08, (p_ref, p_ours)
    assert abs(p_ours - 0.1125) <= 0.06, p_ours  # analytic identity-sequence mass


def test_weak_composition_distribution(ref_aug):
    """Weak law: k ~ U{0..4} from [crop, hflip, vflip, identity] with
    replacement, flips unconditional when chosen. Discriminator:
    P(unchanged) — net-identity needs even flip counts and either no crop
    or a full-image crop (side=32 happens w.p. ~0.27 given acceptance) —
    measured 0.382 (ref) vs 0.350 (ours) at N=600; independent p=0.5
    gating gives 0.125 and fails."""
    base = _base_image()
    n = 400
    np.random.seed(2)
    import random

    random.seed(2)

    class _A:
        img_size = 32

    wa = ref_aug.WeakAugmentation(_A())
    pil = Image.fromarray(base, "L")
    ref_outs = np.stack([np.asarray(wa(pil), np.float64) for _ in range(n)])

    keys = jax.random.split(jax.random.PRNGKey(2), n)
    basef = jnp.asarray(base, jnp.float32)[..., None] / 255.0
    ours = np.asarray(jax.vmap(
        lambda k: A._weak_single(k, basef, basef, 32)[0])(keys))
    ours = ours[..., 0].astype(np.float64) * 255.0

    d_mean = np.abs(ref_outs.mean(0) - ours.mean(0))
    assert d_mean.max() <= 12.0, d_mean.max()
    p_ref = np.mean([np.array_equal(r, base) for r in ref_outs])
    p_ours = np.mean([np.allclose(o, base, atol=0.5) for o in ours])
    assert abs(p_ref - p_ours) <= 0.09, (p_ref, p_ours)
    assert p_ours >= 0.25, p_ours  # p=0.5 gating law sits at 0.125


def test_weak_pairs_mask_through_geometry(ref_aug):
    """Mask rides the exact same crop/flip sequence as the image
    (segmentation.py:73-101): augmenting an image twice as (img, img) yields
    identical outputs in both slots."""
    base = _base_image()
    basef = jnp.asarray(base, jnp.float32)[..., None] / 255.0
    mask = (basef > 0.5).astype(jnp.float32)
    for seed in range(8):
        img_o, mask_o = A._weak_single(jax.random.PRNGKey(seed), basef, mask, 32)
        img2, img_as_mask = A._weak_single(jax.random.PRNGKey(seed), basef, basef, 32)
        np.testing.assert_array_equal(np.asarray(img_o), np.asarray(img2))
        # mask output stays binary
        assert set(np.unique(np.asarray(mask_o))) <= {0.0, 1.0}

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

"""Pallas LUT kernel (ops/lut.py) — exactness vs the compare-reduce form.

The 16x16 factorization must be BIT-identical to the fused
compare-select-sum (both reconstruct integer table entries with one
non-zero term per sum), so every test here asserts equality, not
closeness. Runs in interpreter mode on CPU (same kernel code path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextgen_uia_tpu.ops.lut import (_ROW, hist256_fact, lut_apply,
                                     lut_apply_fact, lut_apply_xla)


@pytest.mark.parametrize("shape", [(7,), (13, 5), (31, 17, 1), (224, 224, 1),
                                   (1, _ROW), (2, _ROW + 3)])
def test_lut_apply_matches_xla(shape):
    rng = np.random.default_rng(hash(shape) % 2 ** 31)
    img = jnp.asarray(rng.random(shape), jnp.float32)
    lut = jnp.asarray(rng.integers(0, 256, 256), jnp.int32)
    np.testing.assert_array_equal(np.asarray(lut_apply(img, lut)),
                                  np.asarray(lut_apply_xla(img, lut)))


def test_lut_apply_extremes_and_identity():
    # out-of-range inputs clip; identity LUT returns the u8 grid exactly
    img = jnp.asarray([-0.5, 0.0, 0.2500001, 0.5, 1.0, 1.5], jnp.float32)
    ident = jnp.arange(256, dtype=jnp.int32)
    out = lut_apply(img, ident)
    expected = np.round(np.clip(np.asarray(img), 0, 1) * 255.0)
    np.testing.assert_array_equal(np.asarray(out), expected)


def test_lut_apply_every_byte_value():
    # all 256 byte codes through a scrambled table: catches any hi/lo split
    # or transpose error exhaustively
    rng = np.random.default_rng(0)
    lut = rng.permutation(256).astype(np.int32)
    img = jnp.asarray(np.arange(256) / 255.0, jnp.float32)
    out = np.asarray(lut_apply(img, jnp.asarray(lut)))
    np.testing.assert_array_equal(out, lut.astype(np.float32))


def test_lut_apply_vmap_per_image_tables():
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.random((3, 33, 29, 1)), jnp.float32)
    luts = jnp.asarray(rng.integers(0, 256, (3, 256)), jnp.int32)
    a = jax.vmap(lut_apply)(imgs, luts)
    b = jax.vmap(lut_apply_xla)(imgs, luts)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("shape", [(7,), (13, 5), (224, 224, 1),
                                   (2, _ROW + 3)])
def test_lut_apply_fact_matches_xla(shape):
    # the 16x16-factorized XLA form (the shipped default) must be
    # bit-identical to the compare-select-sum oracle
    rng = np.random.default_rng(hash(shape) % 2 ** 31)
    img = jnp.asarray(rng.random(shape), jnp.float32)
    lut = jnp.asarray(rng.integers(0, 256, 256), jnp.int32)
    np.testing.assert_array_equal(np.asarray(lut_apply_fact(img, lut)),
                                  np.asarray(lut_apply_xla(img, lut)))


def test_lut_apply_fact_every_byte_value():
    rng = np.random.default_rng(3)
    lut = rng.permutation(256).astype(np.int32)
    img = jnp.asarray(np.arange(256) / 255.0, jnp.float32)
    out = np.asarray(lut_apply_fact(img, jnp.asarray(lut)))
    np.testing.assert_array_equal(out, lut.astype(np.float32))


@pytest.mark.parametrize("shape", [(7,), (64, 64, 1), (518, 7, 1)])
def test_hist256_fact_matches_compare_reduce(shape):
    rng = np.random.default_rng(hash(shape) % 2 ** 31)
    img = jnp.asarray(rng.random(shape), jnp.float32)
    u8 = np.clip(np.round(np.asarray(img) * 255.0), 0, 255).astype(np.int64)
    expected = np.bincount(u8.reshape(-1), minlength=256)
    np.testing.assert_array_equal(np.asarray(hist256_fact(img)), expected)


def test_hist256_fact_saturated_bins():
    # every pixel in one bin: counts up to the full pixel budget stay exact
    img = jnp.full((300, 300, 1), 37 / 255.0, jnp.float32)
    h = np.asarray(hist256_fact(img))
    assert h[37] == 300 * 300 and h.sum() == 300 * 300


def test_equalize_identical_with_and_without_kernel(monkeypatch):
    from nextgen_uia_tpu.data import augment as A
    from nextgen_uia_tpu.ops import lut as lut_ops

    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((41, 37, 1)), jnp.float32)
    monkeypatch.setattr(lut_ops, "use_kernel", lambda: False)
    off = A._equalize(img)
    monkeypatch.setattr(lut_ops, "use_kernel", lambda: True)
    on = A._equalize(img)
    np.testing.assert_array_equal(np.asarray(off), np.asarray(on))

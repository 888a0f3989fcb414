"""Whole-block megakernel (ops/fused_block.py) parity tests.

CPU interpreter-mode Pallas vs the composed XLA paths the models otherwise
run. Real-Mosaic numeric parity is covered by the TPU kernel-parity harness
(tests/test_tpu_kernel_parity.py) like every other kernel.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextgen_uia_tpu.models.bert import BertConfig, bert_apply, bert_init
from nextgen_uia_tpu.models.text_clip import TextConfig, text_apply, text_init
from nextgen_uia_tpu.models.vit import ViTConfig, _block_init, block_apply
from nextgen_uia_tpu.ops.fused_block import fused_block_infer

TINY = ViTConfig(image_size=32, patch_size=8, width=128, heads=2, depth=2,
                 token_pad=1, proj_dim=64)


def _block_params(rng, cfg):
    p = _block_init(rng, cfg)
    # non-trivial LN params so fusion bugs can't hide behind identity scales
    k = jax.random.fold_in(rng, 99)
    for ln in ("ln1", "ln2"):
        p[ln]["scale"] = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(k, hash(ln) % 97), (cfg.width,))
        p[ln]["bias"] = 0.1 * jax.random.normal(jax.random.fold_in(k, 3), (cfg.width,))
    return p


@pytest.mark.parametrize("act", ["gelu", "quick_gelu"])
def test_prenorm_matches_block_apply(act):
    cfg = dataclasses.replace(TINY, act=act)
    rng = jax.random.PRNGKey(0)
    p = _block_params(rng, cfg)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 16, cfg.width))

    ref = block_apply(p, x, cfg)  # CPU: composed XLA path
    out = fused_block_infer(x, p, heads=cfg.heads, act=act, eps=cfg.ln_eps)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_prenorm_padded_tokens_match():
    """Once-padded sequence: -1e9 key bias on the pad tail + n_real."""
    cfg = TINY
    rng = jax.random.PRNGKey(2)
    p = _block_params(rng, cfg)
    n, n_real = 16, 13
    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, n, cfg.width))
    bias = jnp.zeros((2, n)).at[:, n_real:].set(-1e9)

    ref = block_apply(p, x, cfg, key_bias=bias, n_real=n_real)
    out = fused_block_infer(x, p, heads=cfg.heads, act=cfg.act,
                            eps=cfg.ln_eps, key_bias=bias, n_real=n_real)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out)[:, :n_real],
                               np.asarray(ref)[:, :n_real],
                               atol=2e-5, rtol=2e-5)


def test_vit_wiring_force_mode(monkeypatch):
    """block_impl='fused_infer' + force runs the kernel on CPU and matches
    the composed path, including the MONA tail and the once-padded token
    path. TINY's raw seq is 17 (4x4 grid + CLS, not sublane-aligned), so the
    drive goes through vit_apply with token_pad=8 — 17 -> 24 padded tokens
    with key_bias/n_real — exactly how eval forwards reach the kernel; a
    spy asserts the kernel genuinely ran (17-token direct calls decline)."""
    from nextgen_uia_tpu.adapters.mona import inject_mona
    from nextgen_uia_tpu.models.vit import vit_apply, vit_init
    import nextgen_uia_tpu.ops.fused_block as FB

    cfg = dataclasses.replace(TINY, token_pad=8, mona_variant="hybrid")
    rng = jax.random.PRNGKey(3)
    p = vit_init(rng, cfg)
    p, _ = inject_mona(jax.random.fold_in(rng, 5), p, dim=cfg.width,
                       variant="hybrid")
    imgs = jax.random.normal(jax.random.fold_in(rng, 1),
                             (2, cfg.image_size, cfg.image_size, 3))

    ref, _ = vit_apply(p, cfg, imgs)
    calls = []
    real = FB.fused_block_infer

    def spy(x, *a, **k):
        out = real(x, *a, **k)
        calls.append(out is not None)
        return out

    monkeypatch.setattr(FB, "fused_block_infer", spy)
    monkeypatch.setenv("NEXTGEN_UIA_FUSED_BLOCK", "force")
    fused_cfg = dataclasses.replace(cfg, block_impl="fused_infer")
    out, _ = vit_apply(p, fused_cfg, imgs)
    assert calls and all(calls), "megakernel never actually ran"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_bert_layer_wiring_force_mode(monkeypatch):
    """Post-norm layout through bert_apply: megakernel vs composed XLA."""
    cfg = BertConfig(vocab_size=64, width=128, depth=2, heads=2,
                     intermediate=256, context_length=16, embed_dim=64)
    rng = jax.random.PRNGKey(4)
    p = bert_init(rng, cfg)
    ids = jax.random.randint(jax.random.fold_in(rng, 1), (2, 16), 1, 64)
    ids = ids.at[:, 10:].set(0)  # real padding -> pad_bias path

    ref = bert_apply(p, cfg, ids)  # CPU: composed XLA path
    monkeypatch.setenv("NEXTGEN_UIA_FUSED_BLOCK", "force")
    fused_cfg = dataclasses.replace(cfg, block_impl="fused_infer")
    out = bert_apply(p, fused_cfg, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_text_clip_wiring_force_mode(monkeypatch):
    """CLIP text tower: pad-to-sublane under causal attention is exact."""
    cfg = TextConfig(context_length=13, vocab_size=64, width=128, heads=2,
                     depth=2, embed_dim=64)
    rng = jax.random.PRNGKey(5)
    p = text_init(rng, cfg)
    ids = jax.random.randint(jax.random.fold_in(rng, 1), (2, 13), 0, 64)

    ref = text_apply(p, cfg, ids)
    monkeypatch.setenv("NEXTGEN_UIA_FUSED_BLOCK", "force")
    fused_cfg = dataclasses.replace(cfg, block_impl="fused_infer")
    out = text_apply(p, fused_cfg, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_backward_matches_composed_path():
    """The VJP (XLA recomposition) must agree with the composed block's
    gradients — the forward-only contract still requires a CORRECT backward
    if a caller ever differentiates through it."""
    cfg = TINY
    rng = jax.random.PRNGKey(6)
    p = _block_params(rng, cfg)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 16, cfg.width))

    def f_ref(x_):
        return jnp.sum(jnp.sin(block_apply(p, x_, cfg)))

    def f_fused(x_):
        return jnp.sum(jnp.sin(fused_block_infer(
            x_, p, heads=cfg.heads, act=cfg.act, eps=cfg.ln_eps)))

    g_ref = jax.grad(f_ref)(x)
    g_fused = jax.grad(f_fused)(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               atol=5e-5, rtol=5e-5)


def test_ineligible_cases_return_none():
    cfg = TINY
    rng = jax.random.PRNGKey(7)
    p = _block_params(rng, cfg)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 16, cfg.width))

    lora_p = dict(p)
    lora_p["attn"] = dict(p["attn"],
                          lora={"q": {"a": jnp.zeros((cfg.width, 4)),
                                      "b": jnp.zeros((4, cfg.width))}})
    assert fused_block_infer(x, lora_p, heads=cfg.heads) is None

    x_bad = jax.random.normal(rng, (2, 15, cfg.width))  # 15 % 8 != 0
    assert fused_block_infer(x_bad, p, heads=cfg.heads) is None

"""Shape/dtype contracts and adapter-slot invariants for the model stack."""

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextgen_uia_tpu.adapters.lora import inject_lora
from nextgen_uia_tpu.adapters.mona import inject_mona
from nextgen_uia_tpu.core.partition import (by_keywords, count_params, merge,
                                            partition)
from nextgen_uia_tpu.models import clip as clip_mod
from nextgen_uia_tpu.models.vit import ViTConfig, vit_apply, vit_init

TINY = ViTConfig(image_size=32, patch_size=16, width=64, depth=3, heads=4, proj_dim=32)


def test_vit_shapes_and_extraction():
    p = vit_init(jax.random.key(0), TINY)
    x = jnp.ones((2, 32, 32, 3))
    pooled, acts = vit_apply(p, TINY, x, extract_layers=(0, 2))
    assert pooled.shape == (2, 32)
    assert len(acts) == 2 and acts[0].shape == (2, 5, 64)


def test_mona_injection_invariants():
    p = vit_init(jax.random.key(0), TINY)
    p2, n = inject_mona(jax.random.key(1), p, dim=64, bottleneck=16, variant="hybrid")
    assert n == 3
    trainable, frozen = partition({"visual": p2}, by_keywords("mona"))
    n_train = count_params(trainable)
    assert n_train > 0
    # merge() inverts partition()
    merged = merge(trainable, frozen)
    flat_a = jax.tree_util.tree_leaves(merged)
    flat_b = jax.tree_util.tree_leaves({"visual": p2})
    assert all(np.array_equal(a, b) for a, b in zip(flat_a, flat_b))
    # forward still works, and differs from no-adapter forward at init only by ~0
    pooled, _ = vit_apply(p2, TINY, jnp.ones((1, 32, 32, 3)))
    assert pooled.shape == (1, 32)

    # layer-subset injection
    _, n2 = inject_mona(jax.random.key(1), p, dim=64, bottleneck=16, num_layers=2)
    assert n2 == 2


def test_lora_injection_changes_nothing_at_init():
    """LoRA B starts at zero → forward identical to base model (lora.py:44)."""
    p = vit_init(jax.random.key(0), TINY)
    x = jax.random.normal(jax.random.key(2), (2, 32, 32, 3))
    base, _ = vit_apply(p, TINY, x)
    p2, n = inject_lora(jax.random.key(1), p, dim=64, r=4)
    assert n == 3
    out, _ = vit_apply(p2, TINY, x)
    np.testing.assert_allclose(np.asarray(base), np.asarray(out), atol=1e-6)


@pytest.mark.parametrize("family", clip_mod.FAMILIES)
def test_clip_families_encode(family):
    cfg = clip_mod.clip_config(family)
    # shrink for test speed
    import dataclasses
    vis = dataclasses.replace(cfg.vision, image_size=32, width=64, depth=2, heads=4, proj_dim=32)
    if cfg.text_kind == "bert":
        txt = dataclasses.replace(cfg.text, vocab_size=100, width=64, depth=2, heads=4,
                                  intermediate=128, embed_dim=32, context_length=16)
    else:
        txt = dataclasses.replace(cfg.text, vocab_size=100, width=64, depth=2, heads=4,
                                  embed_dim=32, context_length=16)
    cfg = dataclasses.replace(cfg, vision=vis, text=txt)
    params = clip_mod.clip_init(jax.random.key(0), cfg)
    img_emb, _ = clip_mod.encode_image(params, cfg, jnp.ones((2, 32, 32, 3)))
    tokens = jnp.array([[1, 5, 7, 99] + [0] * 12, [1, 9, 99, 0] + [0] * 12])
    txt_emb = clip_mod.encode_text(params, cfg, tokens)
    assert img_emb.shape == (2, 32)
    assert txt_emb.shape == (2, 32)
    assert np.isfinite(np.asarray(img_emb)).all()
    assert np.isfinite(np.asarray(txt_emb)).all()


def test_bfloat16_compute_path():
    cfg = clip_mod.clip_config("biomedclip", compute_dtype="bfloat16")
    import dataclasses
    vis = dataclasses.replace(cfg.vision, image_size=32, width=64, depth=2, heads=4, proj_dim=32)
    cfg = dataclasses.replace(cfg, vision=vis)
    from nextgen_uia_tpu.models.vit import vit_init as vi
    p = vi(jax.random.key(0), cfg.vision)
    pooled, _ = vit_apply(p, cfg.vision, jnp.ones((1, 32, 32, 3)), dtype=jnp.bfloat16)
    assert pooled.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(pooled, dtype=np.float32)).all()


def test_lora_bert_text_tower_injection():
    """Text-tower LoRA (tune_text_encoder, reference lora.py:317-367):
    zero-init B keeps encode_text unchanged; a nonzero B changes it; slots
    land on q/k/v/o of the first num_layers encoder layers only."""
    import dataclasses

    from nextgen_uia_tpu.adapters.lora import inject_lora_bert
    from nextgen_uia_tpu.models.bert import BertConfig, bert_apply, bert_init

    cfg = BertConfig(vocab_size=100, width=64, depth=3, heads=4,
                     intermediate=128, embed_dim=32, context_length=16)
    p = bert_init(jax.random.key(0), cfg)
    ids = jax.random.randint(jax.random.key(1), (2, 16), 1, 100)
    base = bert_apply(p, cfg, ids)

    p2, n = inject_lora_bert(jax.random.key(2), p, dim=64, r=4, num_layers=2)
    assert n == 2
    assert "lora" in p2["layers"][0]["attn"] and "lora" in p2["layers"][1]["attn"]
    assert "lora" not in p2["layers"][2]["attn"]
    assert set(p2["layers"][0]["attn"]["lora"]) == {"q", "k", "v", "o"}

    out = bert_apply(p2, cfg, ids)
    np.testing.assert_allclose(np.asarray(base), np.asarray(out), atol=1e-6)

    # nonzero B must change the encoding, and grads must flow to LoRA params
    p3 = jax.tree_util.tree_map(lambda x: x, p2)
    lora_q = dict(p3["layers"][0]["attn"]["lora"]["q"])
    lora_q["b"] = jnp.ones_like(lora_q["b"]) * 0.1
    p3["layers"][0]["attn"]["lora"] = dict(p3["layers"][0]["attn"]["lora"], q=lora_q)
    out3 = bert_apply(p3, cfg, ids)
    assert not np.allclose(np.asarray(base), np.asarray(out3))

    def loss(lora_tree):
        q = dict(p2["layers"][0]["attn"])
        q["lora"] = lora_tree
        pp = jax.tree_util.tree_map(lambda x: x, p2)
        pp["layers"][0] = dict(pp["layers"][0], attn=q)
        return jnp.sum(bert_apply(pp, cfg, ids) ** 2)

    g = jax.grad(loss)(p2["layers"][0]["attn"]["lora"])
    # dL/dB nonzero through the zero-init A path? B grads depend on x@A != 0
    assert float(jnp.abs(g["q"]["b"]).sum()) > 0


def test_build_clip_model_text_lora_flag():
    """--tune_text_encoder + method=lora injects text-tower slots via the
    driver scaffolding."""
    import argparse

    from nextgen_uia_tpu.tasks.common import base_parser, build_clip_model

    p = base_parser("t")
    p.add_argument("--tune_text_encoder", default=False, action="store_true")
    args = p.parse_args(["--debug_tiny", "--img_size", "32", "--lora_r", "4",
                         "--tune_text_encoder"])
    cfg, params = build_clip_model(args, "biomedclip", adapter="lora",
                                   rng=jax.random.key(0))
    assert "lora" in params["visual"]["blocks"][0]["attn"]
    assert "lora" in params["text"]["layers"][0]["attn"]

    args2 = p.parse_args(["--debug_tiny", "--img_size", "32", "--lora_r", "4"])
    _, params2 = build_clip_model(args2, "biomedclip", adapter="lora",
                                  rng=jax.random.key(0))
    assert "lora" not in params2["text"]["layers"][0]["attn"]


def test_dinov2_swiglu_golden_and_variants():
    """SwiGLU FFN parity with the reference SwiGLUFFNFused (converted
    weights), plus size-variant config table (vision_transformer.py:304-357)."""
    import dataclasses
    import sys

    sys.path.insert(0, "tests") if "tests" not in sys.path[0] else None
    import reference_loader as RL

    if not RL.available():
        import pytest as _pt
        _pt.skip("reference absent")
    import torch

    from nextgen_uia_tpu.models.dinov2 import (DINOV2_ARCHS, dinov2_config,
                                               dinov2_init, forward_features)
    from nextgen_uia_tpu.models.vit import run_mlp

    swi = RL.load("src/third_party/dino/layers/swiglu_ffn.py", "ref_swiglu")
    torch.manual_seed(0)
    d = 64
    m = swi.SwiGLUFFNFused(in_features=d, hidden_features=4 * d).float().eval()
    hidden = (int(4 * d * 2 / 3) + 7) // 8 * 8
    assert m.w12.out_features == 2 * hidden

    x = torch.randn(2, 9, d)
    with torch.no_grad():
        ref = m(x).numpy()

    p = {"w12": {"w": m.w12.weight.detach().numpy().T, "b": m.w12.bias.detach().numpy()},
         "w3": {"w": m.w3.weight.detach().numpy().T, "b": m.w3.bias.detach().numpy()}}
    out = run_mlp(jax.tree_util.tree_map(jnp.asarray, p), jnp.asarray(x.numpy()),
                  "gelu", "auto")
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)

    # variant table matches the reference constructors
    assert dinov2_config("vit_small").width == 384
    assert dinov2_config("vit_large").depth == 24
    g = dinov2_config("vit_giant2")
    assert (g.width, g.depth, g.heads, g.ffn) == (1536, 40, 24, "swiglufused")

    # tiny swiglu tower end-to-end (machinery, not the full giant)
    tiny = dataclasses.replace(g, image_size=28, width=64, depth=2, heads=4)
    params = dinov2_init(jax.random.key(0), tiny)
    assert "w12" in params["blocks"][0]["mlp"]
    feats = forward_features(params, jnp.ones((2, 28, 28, 3)), tiny)
    assert feats["x_norm_clstoken"].shape == (2, 64)
    assert np.isfinite(np.asarray(feats["x_norm_clstoken"])).all()


def test_convert_dinov2_swiglu_roundtrip():
    """Converter maps mlp.w12/mlp.w3 checkpoints into the swiglu tree."""
    import dataclasses

    import nextgen_uia_tpu.convert.torch_to_jax as C
    from nextgen_uia_tpu.models.dinov2 import dinov2_config, dinov2_init

    tiny = dataclasses.replace(dinov2_config("vit_giant2"), image_size=28,
                               width=64, depth=2, heads=4)
    params = dinov2_init(jax.random.key(0), tiny)
    hidden = params["blocks"][0]["mlp"]["w12"]["w"].shape[1] // 2

    rng = np.random.default_rng(0)
    sd = {"patch_embed.proj.weight": rng.normal(size=(64, 3, 14, 14)).astype(np.float32),
          "patch_embed.proj.bias": np.zeros(64, np.float32),
          "cls_token": rng.normal(size=(1, 1, 64)).astype(np.float32),
          "pos_embed": rng.normal(size=(1, tiny.seq_len, 64)).astype(np.float32),
          "norm.weight": np.ones(64, np.float32), "norm.bias": np.zeros(64, np.float32)}
    for i in range(2):
        b = f"blocks.{i}."
        sd.update({
            b + "attn.qkv.weight": rng.normal(size=(192, 64)).astype(np.float32),
            b + "attn.qkv.bias": np.zeros(192, np.float32),
            b + "attn.proj.weight": rng.normal(size=(64, 64)).astype(np.float32),
            b + "attn.proj.bias": np.zeros(64, np.float32),
            b + "norm1.weight": np.ones(64, np.float32), b + "norm1.bias": np.zeros(64, np.float32),
            b + "norm2.weight": np.ones(64, np.float32), b + "norm2.bias": np.zeros(64, np.float32),
            b + "mlp.w12.weight": rng.normal(size=(2 * hidden, 64)).astype(np.float32),
            b + "mlp.w12.bias": np.zeros(2 * hidden, np.float32),
            b + "mlp.w3.weight": rng.normal(size=(64, hidden)).astype(np.float32),
            b + "mlp.w3.bias": np.zeros(64, np.float32),
            b + "ls1.gamma": np.full(64, 1e-5, np.float32),
            b + "ls2.gamma": np.full(64, 1e-5, np.float32),
        })
    flat = C.convert_dinov2(sd, depth=2)
    from test_convert import _unflatten_into

    loaded, n = _unflatten_into(params, flat)
    assert n == len(flat), "all converted tensors must land"
    np.testing.assert_allclose(
        np.asarray(loaded["blocks"][0]["mlp"]["w12"]["w"]),
        sd["blocks.0.mlp.w12.weight"].T)


def test_bert_full_ft_never_passes_residual_to_mha(monkeypatch):
    """Regression (review finding): with mlp_impl='xla' (full fine-tuning,
    --tune_text_encoder) BERT must NOT route attention through the frozen-Wo
    fused path — mha(residual=...) would silently zero dWo on TPU."""
    import nextgen_uia_tpu.models.bert as B

    calls = []
    real_mha = B.mha

    def spy(p, x, **kw):
        calls.append(kw.get("residual") is not None)
        return real_mha(p, x, **kw)

    monkeypatch.setattr(B, "mha", spy)
    cfg = B.BertConfig(vocab_size=64, width=32, depth=2, heads=4,
                       embed_dim=16, max_positions=16, mlp_impl="xla")
    p = B.bert_init(jax.random.key(0), cfg)
    ids = jnp.ones((2, 8), jnp.int32)
    B.bert_apply(p, cfg, ids)
    assert calls and not any(calls), "full-FT BERT passed residual= to mha"

    calls.clear()
    cfg_auto = dataclasses.replace(cfg, mlp_impl="auto")
    B.bert_apply(p, cfg_auto, ids)
    assert calls and all(calls), "frozen BERT should use the residual fusion"


def test_vit_full_ft_never_passes_residual_to_mha(monkeypatch):
    """Same guard as the BERT test for vit.block_apply: with mlp_impl='xla'
    (full fine-tuning) the block must keep LN + residual in XLA — routing
    through mha(residual=/ln=) would zero dWo/dLN grads on TPU."""
    import nextgen_uia_tpu.models.vit as V

    calls = []
    real_mha = V.mha

    def spy(p, x, **kw):
        calls.append(kw.get("residual") is not None or kw.get("ln") is not None)
        return real_mha(p, x, **kw)

    monkeypatch.setattr(V, "mha", spy)
    cfg = dataclasses.replace(TINY, mlp_impl="xla")
    p = vit_init(jax.random.key(0), cfg)
    x = jnp.ones((2, 32, 32, 3))
    vit_apply(p, cfg, x)
    assert calls and not any(calls), "full-FT ViT passed residual=/ln= to mha"

    calls.clear()
    vit_apply(p, TINY, x)  # mlp_impl='auto' (frozen tower)
    assert calls and all(calls), "frozen ViT should use the fused-mha wiring"


def test_text_clip_full_ft_never_passes_residual_to_mha(monkeypatch):
    """Same guard for text_clip._text_block (inline `from ..nn.attention
    import mha` — patch at the attention module)."""
    import nextgen_uia_tpu.nn.attention as A
    from nextgen_uia_tpu.models.text_clip import TextConfig, text_apply, text_init

    calls = []
    real_mha = A.mha

    def spy(p, x, **kw):
        calls.append(kw.get("residual") is not None or kw.get("ln") is not None)
        return real_mha(p, x, **kw)

    monkeypatch.setattr(A, "mha", spy)
    cfg = TextConfig(context_length=16, vocab_size=64, width=32, heads=4,
                     depth=2, embed_dim=16, mlp_impl="xla")
    p = text_init(jax.random.key(0), cfg)
    ids = jnp.ones((2, 16), jnp.int32)
    text_apply(p, cfg, ids)
    assert calls and not any(calls), "full-FT text tower passed residual=/ln= to mha"

    calls.clear()
    text_apply(p, dataclasses.replace(cfg, mlp_impl="auto"), ids)
    assert calls and all(calls), "frozen text tower should use the residual fusion"


def test_lora_dropout_train_eval_semantics():
    """--lora_dropout semantics (reference LinearLoRA.forward, lora.py:73-90):
    train mode (rng given) drops the LoRA-branch input stochastically; eval
    mode (rng=None) and p=0 are deterministic and identical to the undropped
    forward. The frozen projection always sees the raw input."""
    cfg = dataclasses.replace(TINY, lora_dropout=0.5)
    p = vit_init(jax.random.key(0), TINY)
    p, _ = inject_lora(jax.random.key(1), p, dim=64, r=4)
    # nonzero B so the delta (and hence dropout on its input) is visible
    for blk in p["blocks"]:
        lora = {t: dict(pair, b=jnp.full_like(pair["b"], 0.05))
                for t, pair in blk["attn"]["lora"].items()}
        blk["attn"]["lora"] = lora
    x = jax.random.normal(jax.random.key(2), (2, 32, 32, 3))

    base, _ = vit_apply(p, TINY, x)                       # no-dropout config
    ev, _ = vit_apply(p, cfg, x)                          # eval: rng=None
    np.testing.assert_allclose(np.asarray(base), np.asarray(ev), atol=1e-6)

    # p=0 with rng: unchanged (golden stability)
    p0 = dataclasses.replace(TINY, lora_dropout=0.0)
    tr0, _ = vit_apply(p, p0, x, rng=jax.random.key(3))
    np.testing.assert_allclose(np.asarray(base), np.asarray(tr0), atol=1e-6)

    # train mode: stochastic — differs from eval, reproducible per rng
    tr_a, _ = vit_apply(p, cfg, x, rng=jax.random.key(3))
    tr_a2, _ = vit_apply(p, cfg, x, rng=jax.random.key(3))
    tr_b, _ = vit_apply(p, cfg, x, rng=jax.random.key(4))
    assert not np.allclose(np.asarray(base), np.asarray(tr_a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tr_a), np.asarray(tr_a2), atol=1e-6)
    assert not np.allclose(np.asarray(tr_a), np.asarray(tr_b), atol=1e-5)


def test_lora_dropout_bert_text_tower():
    """Same gating for the BERT tower under --tune_text_encoder."""
    from nextgen_uia_tpu.adapters.lora import inject_lora_bert
    from nextgen_uia_tpu.models.bert import BertConfig, bert_apply, bert_init

    cfg = BertConfig(vocab_size=100, width=64, depth=2, heads=4,
                     intermediate=128, embed_dim=32, context_length=16,
                     lora_dropout=0.5)
    p = bert_init(jax.random.key(0), cfg)
    p, _ = inject_lora_bert(jax.random.key(2), p, dim=64, r=4)
    for layer in p["layers"]:
        layer["attn"]["lora"] = {
            t: dict(pair, b=jnp.full_like(pair["b"], 0.05))
            for t, pair in layer["attn"]["lora"].items()}
    ids = jax.random.randint(jax.random.key(1), (2, 16), 1, 100)

    ev = bert_apply(p, cfg, ids)
    ev2 = bert_apply(p, cfg, ids)
    np.testing.assert_allclose(np.asarray(ev), np.asarray(ev2), atol=1e-6)
    tr = bert_apply(p, cfg, ids, rng=jax.random.key(5))
    assert not np.allclose(np.asarray(ev), np.asarray(tr), atol=1e-5)


def test_adapter_kind_sniffing_and_autorouting(tmp_path):
    """A LoRA checkpoint passed via --mona_weights must auto-route to LoRA
    injection (reference adapter_type sniffing, clip/classification.py:86-110),
    recovering r and the layer count from the checkpoint itself."""
    from nextgen_uia_tpu.core import checkpoint as ckpt
    from nextgen_uia_tpu.tasks.common import base_parser, build_clip_model, sniff_adapter_kind

    # build + save a tiny LoRA visual checkpoint (r=4, first 2 blocks)
    args = base_parser("sniff").parse_args(
        ["--debug_tiny", "--img_size", "32", "--lora_r", "4",
         "--lora_layers", "2", "--compute_dtype", "float32"])
    _, params = build_clip_model(args, "biomedclip", adapter="lora")
    lora_path = str(tmp_path / "lora_ckpt.npz")
    assert ckpt.save(lora_path, {"visual": params["visual"]},
                     keyword_filter=["lora"]) > 0
    kind, meta = sniff_adapter_kind(lora_path)
    assert kind == "lora" and meta == {"r": 4, "num_layers": 2}

    # cross-load: --mona_weights pointing at the LoRA ckpt
    args2 = base_parser("sniff2").parse_args(
        ["--debug_tiny", "--img_size", "32", "--compute_dtype", "float32",
         "--mona_weights", lora_path])
    _, params2 = build_clip_model(args2, "biomedclip")
    assert "lora" in params2["visual"]["blocks"][0]["attn"]
    assert "lora" not in params2["visual"]["blocks"][2]["attn"]
    assert "mona" not in params2["visual"]["blocks"][0]
    # loaded, not re-initialised: tensors match the saved ones
    saved = ckpt.load_flat(lora_path)
    got = params2["visual"]["blocks"][0]["attn"]["lora"]["q"]["a"]
    np.testing.assert_array_equal(
        saved["visual/blocks/0/attn/lora/q/a"], np.asarray(got))

    # CORRECT-flag route must recover meta too: --lora_weights on the r=4
    # ckpt with the default --lora_r 16 would otherwise crash on a shape
    # mismatch against the flag-built slots (code-review r4 finding)
    args2b = base_parser("sniff2b").parse_args(
        ["--debug_tiny", "--img_size", "32", "--compute_dtype", "float32",
         "--lora_weights", lora_path])
    assert args2b.lora_r == 16  # default differs from the checkpoint's r=4
    _, params2b = build_clip_model(args2b, "biomedclip")
    assert params2b["visual"]["blocks"][0]["attn"]["lora"]["q"]["a"].shape[1] == 4
    assert "lora" not in params2b["visual"]["blocks"][2]["attn"]
    np.testing.assert_array_equal(
        saved["visual/blocks/0/attn/lora/q/a"],
        np.asarray(params2b["visual"]["blocks"][0]["attn"]["lora"]["q"]["a"]))

    # MONA ckpt via --lora_weights routes the other way
    args3 = base_parser("sniff3").parse_args(
        ["--debug_tiny", "--img_size", "32", "--compute_dtype", "float32"])
    _, params3 = build_clip_model(args3, "biomedclip", adapter="mona")
    mona_path = str(tmp_path / "mona_ckpt.npz")
    assert ckpt.save(mona_path, {"visual": params3["visual"]},
                     keyword_filter=["mona"]) > 0
    assert sniff_adapter_kind(mona_path)[0] == "mona"
    args4 = base_parser("sniff4").parse_args(
        ["--debug_tiny", "--img_size", "32", "--compute_dtype", "float32",
         "--lora_weights", mona_path])
    _, params4 = build_clip_model(args4, "biomedclip")
    assert "mona" in params4["visual"]["blocks"][0]
    assert "lora" not in params4["visual"]["blocks"][0]["attn"]

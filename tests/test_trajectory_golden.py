"""K-step training-dynamics trajectory golden vs the reference torch loop
(VERDICT r4 missing #2).

Module-level seams (towers, adapters, losses, heads) are goldened elsewhere;
this pins the LAST un-goldened seam — the optimizer semantics — by running
the reference's ACTUAL training math (transcribed verbatim from
/root/reference/src/models/biomedclip/finetune.py:242-361: AdamW(0.9/0.95,
wd 0.01) over trainable params, per-update CosineAnnealingLR(T_max=total
updates, eta_min=lr_min), gradient accumulation with loss/accum_steps
scaling, clip_grad_norm_(model.parameters(), 1.0) THEN step THEN
scheduler.step, per-epoch val loss with best-by-val selection) side by side
with our engine (core/train.make_train_step + EarlyStopper, the exact
functions tasks/clip_finetune.py uses) on the vendored toy CLIP with
IDENTICAL converted init and IDENTICAL batches, for 10 updates across 5
epochs, methods {mona, lora, full}.

Dropout is disabled on both sides (torch p=0, ours rng=None): the target is
deterministic optimizer/schedule/accumulation math; dropout SAMPLING is
covered by the distribution tests in test_retrieval_and_augment.py and the
LoRA-dropout goldens in test_models.py.
"""

import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn

import reference_loader as RL
from test_convert import _unflatten_into
from test_golden_pipeline import _our_cfg, _small_torch_clip
from test_mona_parity import _torch_mona_to_pytree

import nextgen_uia_tpu.convert.torch_to_jax as C
from nextgen_uia_tpu.core import train as T
from nextgen_uia_tpu.core.partition import by_keywords, merge, partition
from nextgen_uia_tpu.losses import info_nce
from nextgen_uia_tpu.models import clip as clip_mod

pytestmark = pytest.mark.skipif(not RL.available(), reason="reference absent")

ACCUM = 2
MICRO_BS = 4
EPOCHS = 5
UPDATES_PER_EPOCH = 2
TOTAL_UPDATES = EPOCHS * UPDATES_PER_EPOCH
LR, LR_MIN, WD, TEMP = 2e-3, 1e-8, 0.01, 0.07


def _zero_dropout(model):
    for mod in model.modules():
        if isinstance(mod, nn.Dropout):
            mod.p = 0.0


def _make_data(seed=0):
    """Identical batch streams for both sides: per epoch, UPDATES_PER_EPOCH
    updates of ACCUM microbatches of MICRO_BS (image, tokens) pairs, plus 2
    fixed val batches. Images are pre-scaled f32 (the /255 seam is covered by
    the driver E2E tests)."""
    from nextgen_uia_tpu.data.tokenizer import ClipTokenizer

    tok = ClipTokenizer()
    rng = np.random.default_rng(seed)
    captions = [f"an ultrasound image of a {a} {b} lesion"
                for a in ("benign", "malignant", "cystic", "solid")
                for b in ("breast", "thyroid", "hepatic", "renal")]
    tokens_all = np.asarray(tok(captions, 77))

    def batch(n):
        idx = rng.integers(0, len(captions), n)
        return (rng.random((n, 3, 64, 64), dtype=np.float32),
                tokens_all[idx])

    train = [[batch(MICRO_BS) for _ in range(UPDATES_PER_EPOCH * ACCUM)]
             for _ in range(EPOCHS)]
    val = [batch(MICRO_BS) for _ in range(2)]
    return train, val


def _setup_torch(method):
    """Vendored toy CLIP + the reference's own method setup
    (finetune.py:140-206 / clip/finetune.py:65-88)."""
    m = _small_torch_clip()  # seed 0 inside
    for p in m.parameters():
        p.requires_grad = False
    if method == "mona":
        ref_mona = RL.load("src/adapters/mona.py", "ref_mona_traj")
        torch.manual_seed(3)
        m, n = ref_mona.inject_mona_variant_to_clip(m, variant="hybrid",
                                                    bottleneck_dim=16)
        assert n == 2
        for name, p in m.named_parameters():
            if "mona" in name.lower():
                p.requires_grad = True
    elif method == "lora":
        ref_lora = RL.load("src/adapters/lora.py", "ref_lora_traj")
        torch.manual_seed(3)
        m, n = ref_lora.inject_lora_to_clip(m, lora_r=4, lora_alpha=8,
                                            lora_dropout=0.0)
        assert n == 2
        for name, p in m.named_parameters():
            if "lora" in name.lower():
                p.requires_grad = True
    else:  # full: text tower frozen (tune_text_encoder=False), vision all
        for name, p in m.named_parameters():
            if not (name.startswith("transformer.")
                    or name.startswith("token_embedding.")
                    or name == "positional_embedding"
                    or name.startswith("ln_final.")
                    or name == "text_projection"):
                p.requires_grad = True
    _zero_dropout(m)
    m = m.float()
    return m


def _torch_lora_to_slots(attn):
    """PlainMultiheadAttentionLoRA -> our {'q': {a, b}, ...} slots
    (lora.py:28-36: A [r, in], B [out, r]; ours a [in, r], b [r, out])."""
    out = {}
    for ours, theirs in (("q", attn.q_proj), ("k", attn.k_proj),
                         ("v", attn.v_proj), ("o", attn.proj)):
        out[ours] = {"a": jnp.asarray(theirs.w_lora_A.detach().numpy().T),
                     "b": jnp.asarray(theirs.w_lora_B.detach().numpy().T)}
    return out


def _setup_ours(m, method):
    """Convert the CLEAN towers, then attach the torch-initialized adapter
    params into our declarative slots — identical init by construction."""
    import dataclasses

    cfg = _our_cfg()
    if method == "mona":
        cfg = dataclasses.replace(
            cfg, vision=dataclasses.replace(cfg.vision, mona_variant="hybrid"))
    if method == "lora":
        cfg = dataclasses.replace(
            cfg, vision=dataclasses.replace(cfg.vision, lora_alpha=8.0))
    # state_dict of the injected model still contains the clean tower keys
    sd = m.state_dict()
    clean = {k: v for k, v in sd.items()
             if "mona" not in k.lower() and "lora" not in k.lower()}
    if method == "lora":
        # PlainMultiheadAttentionLoRA renames in_proj -> q/k/v_proj; rebuild
        # the packed layout the converter expects (lora.py:116-142 split)
        for i, blk in enumerate(m.visual.transformer.resblocks):
            a = blk.attn
            pre = f"visual.transformer.resblocks.{i}.attn."
            for k in list(clean):
                if k.startswith(pre):
                    del clean[k]
            clean[pre + "in_proj_weight"] = torch.cat(
                [a.q_proj.weight, a.k_proj.weight, a.v_proj.weight], dim=0)
            clean[pre + "in_proj_bias"] = torch.cat(
                [a.q_proj.bias, a.k_proj.bias, a.v_proj.bias], dim=0)
            clean[pre + "out_proj.weight"] = a.proj.weight
            clean[pre + "out_proj.bias"] = a.proj.bias
    flat = C.convert_openai_clip(clean, depth=2, text_depth=2)
    params = clip_mod.clip_init(jax.random.key(0), cfg)
    params, n = _unflatten_into(params, flat)
    assert n == len(flat)
    blocks = m.visual.transformer.resblocks
    for i, blk in enumerate(params["visual"]["blocks"]):
        if method == "mona":
            blk["mona"] = _torch_mona_to_pytree(blocks[i].mona)
        if method == "lora":
            blk["attn"]["lora"] = _torch_lora_to_slots(blocks[i].attn)
    # CPU jax zero-copies aligned numpy views, and .detach().numpy() views
    # torch storage — without a deep copy the torch loop's IN-PLACE AdamW
    # updates would silently mutate our "initial" params mid-comparison
    params = jax.tree_util.tree_map(lambda a: jnp.array(np.array(a)), params)
    return cfg, params


def _run_torch(m, train_data, val_data):
    """The reference train loop, transcribed from biomedclip/finetune.py:
    242-361 (accumulation + clip + per-update cosine + best-by-val)."""
    ref_losses = RL.load("src/losses/losses.py", "ref_losses_traj")
    criterion = ref_losses.InfoNCELoss(temperature=TEMP)
    trainable = [p for p in m.parameters() if p.requires_grad]
    optimizer = torch.optim.AdamW(trainable, lr=LR, betas=(0.9, 0.95),
                                  weight_decay=WD)
    scheduler = torch.optim.lr_scheduler.CosineAnnealingLR(
        optimizer, T_max=TOTAL_UPDATES, eta_min=LR_MIN)

    update_losses, val_losses = [], []
    best_loss, best_epoch, patience_counter = float("inf"), 0, 0
    optimizer.zero_grad()
    for epoch, batches in enumerate(train_data):
        m.train()
        cycle_loss, cycle_n = 0.0, 0
        for bi, (img, tokens) in enumerate(batches):
            image_features = m.encode_image(torch.as_tensor(img))
            text_features = m.encode_text(torch.as_tensor(tokens))
            loss = criterion(image_features, text_features)
            (loss / ACCUM).backward()
            cycle_loss += loss.item()
            cycle_n += 1
            if (bi + 1) % ACCUM == 0:
                torch.nn.utils.clip_grad_norm_(m.parameters(), max_norm=1.0)
                optimizer.step()
                scheduler.step()
                optimizer.zero_grad()
                update_losses.append(cycle_loss / cycle_n)
                cycle_loss, cycle_n = 0.0, 0
        m.eval()
        with torch.no_grad():
            vl = [criterion(m.encode_image(torch.as_tensor(img)),
                            m.encode_text(torch.as_tensor(tokens))).item()
                  for img, tokens in val_data]
        avg_val = float(np.mean(vl))
        val_losses.append(avg_val)
        if avg_val < best_loss:
            best_loss, best_epoch, patience_counter = avg_val, epoch, 0
        else:
            patience_counter += 1
    return update_losses, val_losses, best_epoch


def _run_ours(cfg, params, method, train_data, val_data):
    """Our engine driven exactly as tasks/clip_finetune.py drives it."""
    if method == "mona":
        pred = by_keywords("mona")
    elif method == "lora":
        # the driver's predicate: lora slots + the wrapped projections'
        # biases, which the reference leaves requires_grad=True
        # (lora.py:28-39 freezes only `weight`)
        from nextgen_uia_tpu.tasks.clip_finetune import _lora_trainable_predicate

        pred = _lora_trainable_predicate(params)
    else:
        from nextgen_uia_tpu.tasks.clip_finetune import _full_ft_predicate

        args = types.SimpleNamespace(tune_layers="all", tune_text_encoder=False)
        pred = _full_ft_predicate(args, depth=cfg.vision.depth)
    trainable, frozen = partition(params, pred)

    tcfg = T.TrainConfig(lr=LR, lr_min=LR_MIN, weight_decay=WD, beta1=0.9,
                         beta2=0.95, grad_clip=1.0, accum_steps=ACCUM,
                         total_updates=TOTAL_UPDATES)
    opt, _ = T.make_optimizer(tcfg)
    state = T.init_state(trainable, opt)

    def loss_fn(tp, fp, mb, rng):
        p = merge(tp, fp)
        img_f, _ = clip_mod.encode_image(p, cfg, mb["image"])
        txt_f = clip_mod.encode_text(p, cfg, mb["tokens"])
        return info_nce(img_f, txt_f, temperature=TEMP)

    step = T.make_train_step(loss_fn, opt, tcfg, donate=False)

    def val_loss(tp):
        p = merge(tp, frozen)
        vl = []
        for img, tokens in val_data:
            i_f, _ = clip_mod.encode_image(p, cfg, jnp.asarray(img.transpose(0, 2, 3, 1)))
            t_f = clip_mod.encode_text(p, cfg, jnp.asarray(tokens))
            vl.append(float(info_nce(i_f, t_f, temperature=TEMP)))
        return float(np.mean(vl))

    stopper = T.EarlyStopper(patience=10, mode="min")
    update_losses, val_losses = [], []
    k = jax.random.key(0)  # unused (no dropout), but the engine requires it
    for epoch, batches in enumerate(train_data):
        for u in range(UPDATES_PER_EPOCH):
            window = batches[u * ACCUM:(u + 1) * ACCUM]
            mb = {"image": jnp.asarray(np.stack(
                      [img.transpose(0, 2, 3, 1) for img, _ in window])),
                  "tokens": jnp.asarray(np.stack([t for _, t in window]))}
            state, metrics = step(state, frozen, mb, k)
            update_losses.append(float(metrics["loss"]))
        av = val_loss(state["params"])
        val_losses.append(av)
        stopper.update(av, epoch)
    return state, frozen, update_losses, val_losses, stopper.best_step


@pytest.mark.parametrize("method", ["mona", "lora", "full"])
def test_trajectory_golden(method):
    train_data, val_data = _make_data()
    m = _setup_torch(method)
    cfg, params = _setup_ours(m, method)

    ref_updates, ref_vals, ref_best = _run_torch(m, train_data, val_data)
    state, frozen, our_updates, our_vals, our_best = _run_ours(
        cfg, params, method, train_data, val_data)

    assert len(ref_updates) == len(our_updates) == TOTAL_UPDATES
    # per-update mean-microbatch loss sequence (finetune.py:287-307)
    np.testing.assert_allclose(our_updates, ref_updates, atol=1e-5, rtol=1e-5)
    # per-epoch val loss + the best-by-val selection (finetune.py:335-346)
    np.testing.assert_allclose(our_vals, ref_vals, atol=1e-5, rtol=1e-5)
    assert our_best == ref_best

    # final trainable params agree — AdamW math, bias correction, wd
    # placement, cosine placement, accum normalization, clip ordering all
    # compound here; 1e-4 f32 over 10 updates
    blocks = m.visual.transformer.resblocks
    if method == "mona":
        for i, blk in enumerate(state["params"]["visual"]["blocks"]):
            ref_tree = _torch_mona_to_pytree(blocks[i].mona)
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4),
                blk["mona"], ref_tree)
    elif method == "lora":
        for i, blk in enumerate(state["params"]["visual"]["blocks"]):
            ref_tree = _torch_lora_to_slots(blocks[i].attn)
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4),
                blk["attn"]["lora"], ref_tree)
            # the co-trained projection biases (reference requires_grad quirk).
            # k is excluded from the value comparison: a uniform key bias
            # shifts every score row by a per-query constant, so softmax —
            # and the whole forward — is INVARIANT to it; its true gradient
            # is zero and both frameworks train it on fp noise that AdamW
            # normalizes to ±lr sign-steps (not cross-framework
            # reproducible, and harmless). Both sides must still keep it
            # near its zero init.
            a = blocks[i].attn
            for ours, theirs in (("q", a.q_proj), ("v", a.v_proj),
                                 ("o", a.proj)):
                np.testing.assert_allclose(
                    np.asarray(blk["attn"][ours]["b"]),
                    theirs.bias.detach().numpy(), atol=1e-4, rtol=1e-4)
            assert np.abs(np.asarray(blk["attn"]["k"]["b"])).max() < 5e-2
            assert np.abs(a.k_proj.bias.detach().numpy()).max() < 5e-2
    else:
        flat_ref = C.convert_openai_clip(m.state_dict(), depth=2, text_depth=2)
        final = merge(state["params"], frozen)
        from nextgen_uia_tpu.core.partition import path_str

        checked = {"n": 0}

        def cmp(path, v):
            key = path_str(path)
            if key.startswith("visual/") and key in flat_ref:
                if key.endswith("/attn/k/b"):
                    # zero-gradient direction (softmax shift invariance, see
                    # the lora branch above): trained on fp noise, compare
                    # only that both sides stay near init
                    assert np.abs(np.asarray(v)).max() < 5e-2
                    assert np.abs(flat_ref[key]).max() < 5e-2
                else:
                    np.testing.assert_allclose(np.asarray(v), flat_ref[key],
                                               atol=1e-4, rtol=1e-4,
                                               err_msg=key)
                checked["n"] += 1
            return v

        jax.tree_util.tree_map_with_path(cmp, final)
        assert checked["n"] > 20
        # logit_scale must NOT have moved: the loss never touches it, so
        # torch AdamW skips it (grad is None) — our trainable set must
        # exclude it too or optax would weight-decay it every update
        np.testing.assert_allclose(
            np.asarray(final["logit_scale"]),
            m.logit_scale.detach().numpy(), atol=0, rtol=0)

"""Whole-transformer-block Pallas megakernel (frozen weights, forward-only).

One grid cell per image runs the ENTIRE block in VMEM:

  pre-norm  (ViT / CLIP visual):  y = x + Wo @ attn(LN1(x)) + bo
                                  out = y + fc2(act(fc1(LN2(y))))
  post-norm (BERT):               y = LN_attn(x + Wo @ attn(x) + bo)
                                  out = LN_ffn(y + fc2(act(fc1(y))))

Motivation and MEASURED OUTCOME (v5e, bench/smoke_fused_block.py): the
per-sublayer kernels (ops/fused_ln_qkv.py, ops/fused_attn_o.py,
ops/fused_ln_mlp.py) hop through HBM twice per block — q/k/v ([B, H, N, dh]
write + read, ~1.8 MB/image/block) and the attention output y. This kernel
reads x once and writes out once (~3x less activation traffic; weights are
constant blocks Mosaic keeps VMEM-resident across grid cells). On THIS chip
that is throughput-NEUTRAL for the ViT forward (20.0 vs 20.1 ms/batch-64 —
the composed pipeline was already hiding those transfers behind compute; the
forward is at its practical floor, not HBM-bound as round-3 PERF.md first
attributed) and ~4% SLOWER for post-norm BERT-256 (21.5 vs 20.7 — opt-in via
NEXTGEN_UIA_FUSED_BLOCK_BERT=1 there). It ships as the default eval path for
pre-norm towers because it is numerically closer to the f32 reference than
the composed bf16 chain (max|d| 0.026 vs 0.032 at ViT-B/16), one dispatch
per block, and strictly less bandwidth — which matters on parts where HBM is
genuinely contended.

FORWARD-ONLY contract: the custom VJP is an exact plain-XLA recomposition of
the same math, kept for correctness if a caller ever differentiates through
it, but it is SLOW (no fused backward kernels). Intended call sites never
trace a backward: eval/zero-shot/retrieval forwards (tasks/* eval fns set
block_impl='fused_infer') and the frozen in-step text tower during adapter
fine-tuning (its output depends only on frozen params, so jax.grad never
visits it). Training towers that need dx keep the composed kernel path.

Reference semantics covered: one timm/OpenAI ViT block
(/root/reference/src/third_party/timm/clip_adapter.py:104-118 tower loop,
openai_clip/model.py:170-214 ResidualAttentionBlock) and one HF BERT layer
(post-norm, as loaded by open_clip's HFTextEncoder —
/root/reference/src/models/biomedclip/finetune.py:116-119).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_attn_o import _group_probs, _g_size
from .fused_mlp import _act_fns, _ln_rows, _tile8

_VMEM_LIMIT = 64 * 1024 * 1024


def fused_block_enabled() -> str:
    """'1' (default, TPU only) | '0' (off) | 'force' (also CPU interpret —
    used by the wiring tests)."""
    return os.environ.get("NEXTGEN_UIA_FUSED_BLOCK", "1")


def fused_block_should_run(opt_in_env: str | None = None) -> bool:
    """The one gate shared by the tower call sites (vit.block_apply,
    text_clip._text_block, bert_apply): mode x backend, plus an optional
    EXTRA opt-in env var required on real TPU (the post-norm BERT variant is
    measured slower there, so it defaults off outside 'force')."""
    mode = fused_block_enabled()
    if mode == "0":
        return False
    if mode == "force":
        return True
    if jax.default_backend() != "tpu":
        return False
    return opt_in_env is None or os.environ.get(opt_in_env) == "1"


def _fwd_kernel(x_ref, ga_ref, ba_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                wv_ref, bv_ref, wo_ref, bo_ref, gb_ref, bb_ref,
                w1_ref, b1_ref, w2_ref, b2_ref, bias_ref, o_ref, *,
                heads, g_size, scale, n_real, causal, act, eps, prenorm,
                n_hc, hc_size, ipc):
    # ipc images per grid cell: LN/projections/MLP run as ONE [ipc*N, D]
    # wide matmul (better MXU pipelining than per-image [N, D] tiles);
    # attention stays per-image (scores are per-image quadratic)
    xs = x_ref[...]                                     # [ipc, N, D]
    n, d = xs.shape[1], xs.shape[2]
    hd = d // heads
    x = xs.reshape(ipc * n, d)                          # leading-dim merge
    x32 = x.astype(jnp.float32)

    # --- attention sublayer -------------------------------------------------
    if prenorm:
        z, _, _ = _ln_rows(x32, ga_ref[0].astype(jnp.float32),
                           ba_ref[0].astype(jnp.float32), eps)
        z = z.astype(x.dtype)
    else:
        z = x                                           # post-norm: raw stream
    qkv = []
    for w_ref, b_ref in ((wq_ref, bq_ref), (wk_ref, bk_ref), (wv_ref, bv_ref)):
        y = jax.lax.dot(z, w_ref[...], preferred_element_type=jnp.float32)
        qkv.append((y + b_ref[0].astype(jnp.float32)[None, :]).astype(x.dtype))
    q, k, v = qkv                                       # each [ipc*N, D]

    img_outs = []
    for b in range(ipc):
        rows = slice(b * n, (b + 1) * n)
        bias_row = bias_ref[b, 0] if bias_ref is not None else None
        outs = []
        for gi in range(heads // g_size):
            hs = range(gi * g_size, (gi + 1) * g_size)
            # per-head 64-lane slices stacked to [G, N, hd] (the (N, D) ->
            # (N, H, hd) shape cast does not lower on this toolchain; lane
            # slices + stack do — same pattern as ops/fused_attn_o.py bwd)
            qg = jnp.stack([q[rows, h * hd:(h + 1) * hd] for h in hs])
            kg = jnp.stack([k[rows, h * hd:(h + 1) * hd] for h in hs])
            vg = jnp.stack([v[rows, h * hd:(h + 1) * hd] for h in hs])
            p = _group_probs(qg, kg, bias_row, scale=scale, n_real=n_real,
                             causal=causal)
            oh = jax.lax.dot_general(p.astype(vg.dtype), vg,
                                     (((2,), (1,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
            outs.extend(oh[i].astype(x.dtype) for i in range(g_size))
        img_outs.append(jnp.concatenate(outs, axis=-1))  # [N, D]
    cat = (img_outs[0] if ipc == 1
           else jnp.concatenate(img_outs, axis=0))       # [ipc*N, D]
    y32 = jax.lax.dot(cat, wo_ref[...], preferred_element_type=jnp.float32)
    y32 = y32 + bo_ref[0].astype(jnp.float32)[None, :] + x32
    if not prenorm:
        y32, _, _ = _ln_rows(y32, ga_ref[0].astype(jnp.float32),
                             ba_ref[0].astype(jnp.float32), eps)

    # --- MLP sublayer -------------------------------------------------------
    if prenorm:
        z2, _, _ = _ln_rows(y32, gb_ref[0].astype(jnp.float32),
                            bb_ref[0].astype(jnp.float32), eps)
    else:
        z2 = y32
    z2 = z2.astype(x.dtype)
    fwd_act, _ = _act_fns(act)
    acc = y32 + b2_ref[0].astype(jnp.float32)[None, :]
    for hc in range(n_hc):                              # hidden stays in VMEM
        w1c = w1_ref[:, hc * hc_size:(hc + 1) * hc_size]
        a = jax.lax.dot(z2, w1c, preferred_element_type=jnp.float32)
        a = a + b1_ref[0, hc * hc_size:(hc + 1) * hc_size].astype(jnp.float32)[None, :]
        h = fwd_act(a).astype(x.dtype)
        w2c = w2_ref[hc * hc_size:(hc + 1) * hc_size, :]
        acc = acc + jax.lax.dot(h, w2c, preferred_element_type=jnp.float32)
    if not prenorm:
        acc, _, _ = _ln_rows(acc, gb_ref[0].astype(jnp.float32),
                             bb_ref[0].astype(jnp.float32), eps)
    o_ref[...] = acc.astype(o_ref.dtype).reshape(ipc, n, d)


def _xla_reference(x, ga, ba, wq, bq, wk, bk, wv, bv, wo, bo, gb, bb,
                   w1, b1, w2, b2, bias, *, heads, n_real, causal, act, eps,
                   prenorm):
    """Plain-XLA recomposition of the kernel math — the source of the VJP
    (forward-only contract: intended call sites never trace it) and the
    parity oracle for the tests."""
    b, n, d = x.shape
    hd = d // heads

    def ln(t32, g, bta):
        mu = t32.mean(-1, keepdims=True)
        var = ((t32 - mu) ** 2).mean(-1, keepdims=True)
        return (t32 - mu) * jax.lax.rsqrt(var + eps) * g + bta

    x32 = x.astype(jnp.float32)
    z = ln(x32, ga, ba).astype(x.dtype) if prenorm else x
    z32 = z.astype(jnp.float32)

    def proj(w, bb_):
        return (z32 @ w.astype(jnp.float32) + bb_[None, None, :]).astype(x.dtype)

    q, k, v = proj(wq, bq), proj(wk, bk), proj(wv, bv)
    qh = q.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqe,bhke->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) / (hd ** 0.5)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
    s = jnp.where(col >= n_real, -1e30, s)
    if bias is not None:
        s = s + bias.astype(jnp.float32)[:, None, None, :]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col > row, -1e30, s)
    p = jax.nn.softmax(s, axis=-1)
    oh = jnp.einsum("bhqk,bhke->bhqe", p.astype(vh.dtype), vh,
                    preferred_element_type=jnp.float32)
    cat = oh.transpose(0, 2, 1, 3).reshape(b, n, d).astype(x.dtype)
    y32 = (cat.astype(jnp.float32) @ wo.astype(jnp.float32)
           + bo[None, None, :] + x32)
    if not prenorm:
        y32 = ln(y32, ga, ba)
    z2 = (ln(y32, gb, bb) if prenorm else y32).astype(x.dtype)
    fwd_act, _ = _act_fns(act)
    h = fwd_act(z2.astype(jnp.float32) @ w1.astype(jnp.float32)
                + b1[None, None, :]).astype(x.dtype)
    acc = (y32 + h.astype(jnp.float32) @ w2.astype(jnp.float32)
           + b2[None, None, :])
    if not prenorm:
        acc = ln(acc, gb, bb)
    return acc.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(18, 19, 20, 21, 22, 23))
def _fused(x, ga, ba, wq, bq, wk, bk, wv, bv, wo, bo, gb, bb, w1, b1, w2, b2,
           bias, heads, n_real, causal, act, eps, prenorm):
    return _fwd_impl(x, ga, ba, wq, bq, wk, bk, wv, bv, wo, bo, gb, bb,
                     w1, b1, w2, b2, bias, heads, n_real, causal, act, eps,
                     prenorm)


def _ipc(b: int) -> int:
    """Images per grid cell (divisor of the batch). Measured on v5e
    (bench/smoke_fused_block.py): ipc=1 wins — 20.0 ms/batch-64 ViT-B fwd vs
    21.4 at ipc=2; wider [ipc*N, D] matmuls do NOT help (the forward is not
    matmul-width-bound), and larger cells pipeline worse against the grid.
    Env override NEXTGEN_UIA_BLOCK_IPC for re-measurement."""
    try:
        pref = int(os.environ.get("NEXTGEN_UIA_BLOCK_IPC", "1"))
    except ValueError:
        pref = 1
    for c in range(min(pref, b), 0, -1):
        if b % c == 0:
            return c
    return 1


def _fwd_impl(x, ga, ba, wq, bq, wk, bk, wv, bv, wo, bo, gb, bb, w1, b1, w2,
              b2, bias, heads, n_real, causal, act, eps, prenorm):
    b, n, d = x.shape
    hidden = w1.shape[1]
    gs = _g_size(heads, n)
    ipc = _ipc(b)
    n_hc = max(hidden // 1024, 1)
    while hidden % n_hc:
        n_hc -= 1
    row = pl.BlockSpec((ipc, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vec_d = pl.BlockSpec((8, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec_h = pl.BlockSpec((8, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM)
    sq = pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [row, vec_d, vec_d, sq, vec_d, sq, vec_d, sq, vec_d, sq, vec_d,
                vec_d, vec_d,
                pl.BlockSpec((d, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
                vec_h,
                pl.BlockSpec((hidden, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                vec_d]
    args = [x, _tile8(ga), _tile8(ba), wq, _tile8(bq), wk, _tile8(bk),
            wv, _tile8(bv), wo, _tile8(bo), _tile8(gb), _tile8(bb),
            w1, _tile8(b1), w2, _tile8(b2)]
    kw = dict(heads=heads, g_size=gs, scale=1.0 / ((d // heads) ** 0.5),
              n_real=n_real, causal=causal, act=act, eps=eps, prenorm=prenorm,
              n_hc=n_hc, hc_size=hidden // n_hc, ipc=ipc)
    if bias is not None:
        in_specs.append(pl.BlockSpec((ipc, 8, n), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.broadcast_to(bias.astype(jnp.float32)[:, None, :],
                                     (b, 8, n)))
        kernel = functools.partial(_fwd_kernel, **kw)
    else:
        def kernel(*refs):
            _fwd_kernel(*refs[:-1], None, refs[-1], **kw)
    return pl.pallas_call(
        kernel, grid=(b // ipc,), in_specs=in_specs, out_specs=row,
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() == "cpu",
    )(*args)


def _fwd_rule(x, ga, ba, wq, bq, wk, bk, wv, bv, wo, bo, gb, bb, w1, b1, w2,
              b2, bias, heads, n_real, causal, act, eps, prenorm):
    out = _fwd_impl(x, ga, ba, wq, bq, wk, bk, wv, bv, wo, bo, gb, bb,
                    w1, b1, w2, b2, bias, heads, n_real, causal, act, eps,
                    prenorm)
    return out, (x, ga, ba, wq, bq, wk, bk, wv, bv, wo, bo, gb, bb,
                 w1, b1, w2, b2, bias)


def _bwd_rule(heads, n_real, causal, act, eps, prenorm, res, g):
    # correctness-only (see module docstring): exact XLA recomposition;
    # intended call sites are never differentiated
    (x, ga, ba, wq, bq, wk, bk, wv, bv, wo, bo, gb, bb, w1, b1, w2, b2,
     bias) = res
    diff = (x, ga, ba, wq, bq, wk, bk, wv, bv, wo, bo, gb, bb, w1, b1, w2, b2)
    _, vjp = jax.vjp(
        lambda *d: _xla_reference(*d, bias, heads=heads, n_real=n_real,
                                  causal=causal, act=act, eps=eps,
                                  prenorm=prenorm), *diff)
    grads = vjp(g)
    zb = jnp.zeros_like(bias) if bias is not None else None
    return (*grads, zb)


_fused.defvjp(_fwd_rule, _bwd_rule)


def fused_block_infer(x, p, *, heads: int, act: str = "gelu",
                      eps: float = 1e-5, key_bias=None,
                      n_real: int | None = None, causal: bool = False,
                      layout: str = "prenorm"):
    """One whole transformer block in a single Pallas kernel (see module
    docstring — FORWARD-ONLY contract).

    p: block param dict — pre-norm layout reads {'ln1','attn','ln2','mlp'}
    (models/vit.py, models/text_clip.py); post-norm reads
    {'attn','attn_ln','ffn','ffn_ln'} (models/bert.py). Returns None when
    ineligible (LoRA slot present, shapes don't tile, biases missing,
    unsupported activation) — callers fall back to the composed path.
    """
    b, n, d = x.shape
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    prenorm = layout == "prenorm"
    attn = p["attn"]
    ln_a = p["ln1"] if prenorm else p["attn_ln"]
    ln_b = p["ln2"] if prenorm else p["ffn_ln"]
    mlp = p["mlp"] if prenorm else p["ffn"]
    if (n % sub or d % 128 or d % heads or (d // heads) % 64
            or "lora" in attn or "fc1" not in mlp
            or act not in ("gelu", "quick_gelu")):
        return None
    if any(k not in attn or "b" not in attn[k] for k in ("q", "k", "v", "o")):
        return None
    if "b" not in mlp["fc1"] or "b" not in mlp["fc2"]:
        return None
    return _fused(
        x,
        ln_a["scale"].astype(jnp.float32), ln_a["bias"].astype(jnp.float32),
        attn["q"]["w"].astype(x.dtype), attn["q"]["b"].astype(jnp.float32),
        attn["k"]["w"].astype(x.dtype), attn["k"]["b"].astype(jnp.float32),
        attn["v"]["w"].astype(x.dtype), attn["v"]["b"].astype(jnp.float32),
        attn["o"]["w"].astype(x.dtype), attn["o"]["b"].astype(jnp.float32),
        ln_b["scale"].astype(jnp.float32), ln_b["bias"].astype(jnp.float32),
        mlp["fc1"]["w"].astype(x.dtype), mlp["fc1"]["b"].astype(jnp.float32),
        mlp["fc2"]["w"].astype(x.dtype), mlp["fc2"]["b"].astype(jnp.float32),
        key_bias, heads, n_real if n_real is not None else n, causal, act,
        eps, prenorm)

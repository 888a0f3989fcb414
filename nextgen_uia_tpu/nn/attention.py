"""Multi-head attention with declarative LoRA slots.

TPU-native replacement for the reference's two attention flavours
(torch ``nn.MultiheadAttention`` in OpenAI CLIP, timm fused-qkv ``Attention``
in BiomedCLIP — cf. /root/reference/src/adapters/lora.py:93-199,298-313).
Both are expressed here as one implementation with separate q/k/v/o projection
subtrees; checkpoint converters split fused qkv weights on load, so the model
code never branches on layout.

LoRA is NOT a wrapper module: if the attention param subtree contains a
``lora`` entry ({'q': {'a','b'}, ...}), the low-rank update is added inline.
This keeps everything jit-friendly and makes "injection" a pure function of
the parameter tree (see adapters/lora.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .layers import linear, linear_init


def _flash_n_max() -> int:
    import os

    # auto-route ceiling for the VMEM-resident flash kernel; lower to 512
    # to force the pre-round-4 einsum routing for long sequences (A/B knob
    # used by bench/smoke_dino.py)
    return int(os.environ.get("NEXTGEN_UIA_FLASH_NMAX", "2048"))


def _fused_qkv_enabled() -> bool:
    import os

    return os.environ.get("NEXTGEN_UIA_FUSED_QKV", "1") != "0"


def _fused_attn_o_enabled() -> bool:
    import os

    return os.environ.get("NEXTGEN_UIA_FUSED_ATTN_O", "1") != "0"


def attention_init(rng, dim: int, *, bias: bool = True):
    ks = jax.random.split(rng, 4)
    return {
        "q": linear_init(ks[0], dim, dim, bias=bias),
        "k": linear_init(ks[1], dim, dim, bias=bias),
        "v": linear_init(ks[2], dim, dim, bias=bias),
        "o": linear_init(ks[3], dim, dim, bias=bias),
    }


def _lora_drop(x, name, drop_keys, rate: float):
    """Inverted dropout on the LoRA-branch INPUT only (train mode), matching
    the reference LinearLoRA.forward: the frozen projection sees the raw x,
    only the low-rank delta sees the dropped x (lora.py:73-90). Each of
    q/k/v/o is a separate LinearLoRA there, so each draws its own mask."""
    if drop_keys is None or name not in drop_keys:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(drop_keys[name], keep, x.shape)
    return jnp.where(mask, x, jnp.zeros_like(x)) / keep


def _proj_with_lora(p, lora, name, x, *, dtype, lora_scale,
                    drop_keys=None, drop_rate=0.0):
    y = linear(p[name], x, dtype=dtype)
    if lora is not None and name in lora:
        la = lora[name]
        xl = _lora_drop(x, name, drop_keys, drop_rate)
        # x @ A^T… in our [in, out] layout: x @ a [in, r] @ b [r, out]
        delta = (xl.astype(y.dtype) @ la["a"].astype(y.dtype)) @ la["b"].astype(y.dtype)
        y = y + delta * lora_scale
    return y


def mha(p, x, *, num_heads: int, mask=None, causal: bool = False,
        key_padding_bias=None, dtype=None, lora_alpha: float | None = None,
        lora_dropout: float = 0.0, lora_rng=None,
        impl: str = "auto", ln=None, ln_eps: float = 1e-5, residual=None):
    """Self-attention over [B, N, D].

    mask: optional generic additive mask broadcastable to [B, H, N, N]
      (forces the einsum path). Structured cases use ``causal`` and
      ``key_padding_bias`` ([B, N] additive) so the Pallas flash kernel can
      serve them.
    impl: 'auto' (flash on TPU, einsum elsewhere/with generic mask) |
      'einsum' | 'flash'.
    ln: optional pre-attention LayerNorm params. When given, the LN is fused
      into the q/k/v projection kernel on the frozen-tower TPU path
      (ops/fused_ln_qkv.py); otherwise it is applied here before projecting.
      Callers that need LN fusion pass raw x + ln instead of layernorm(x).
    residual: optional skip tensor. When given, the return value is
      residual + attention output (fused into the o-projection kernel on the
      frozen-tower TPU path, ops/fused_attn_o.py; added here otherwise).
      FROZEN-Wo contract: the fused kernel returns structural-zero Wo/bo
      grads, so callers must pass residual ONLY when the o-projection does
      not train (models gate this on their mlp_impl == 'auto').
    LoRA scaling follows the reference: alpha / sqrt(r) (lora.py:21).
    """
    b, n, d = x.shape
    head_dim = d // num_heads
    lora = p.get("lora")
    lora_scale = 1.0
    drop_keys = None
    if lora is not None:
        r = next(iter(lora.values()))["a"].shape[1]
        lora_scale = (lora_alpha if lora_alpha is not None else 1.0) / math.sqrt(r)
        if lora_rng is not None and lora_dropout > 0.0:
            # train mode (callers pass lora_rng only then): one independent
            # dropout mask per projection, reference LinearLoRA semantics
            ks = jax.random.split(lora_rng, 4)
            drop_keys = {t: ks[i] for i, t in enumerate(("q", "k", "v", "o"))
                         if t in lora}

    # the flash kernel holds per-head-group [Np, Np] f32 scores in VMEM.
    # Two regimes (ops/flash_attention.py docstring): N <= 512 runs G=4
    # heads/cell under the default scoped-vmem ceiling; 512 < N <= _FLASH_N_MAX
    # (DINOv2 at 518 px = 1370 tokens) runs one head/cell with a raised
    # ceiling — the einsum path at that length streams ~5.8 GB/layer of
    # softmax traffic through HBM at batch 32 (PERF.md round 4). Beyond the
    # cap (no model here runs there) XLA's einsum path takes over.
    use_flash = (impl == "flash" or
                 (impl == "auto" and mask is None and n <= _flash_n_max()
                  and jax.default_backend() == "tpu"))

    qkv_fused = None
    if ln is not None:
        # the LN+QKV / attn+o fusions are designed and measured for the
        # short regime (N ~ 200-256); long sequences (DINOv2 1370) keep LN
        # + einsum projections around the flash kernel
        if (use_flash and n <= 512 and mask is None and lora is None
                and "qkv" not in p and _fused_qkv_enabled()):
            from ..ops.fused_ln_qkv import fused_ln_qkv

            xx = x if dtype is None else x.astype(dtype)
            qkv_fused = fused_ln_qkv(xx, ln, p, heads=num_heads, eps=ln_eps)
        if qkv_fused is None:
            from .layers import layernorm

            x = layernorm(ln, x, eps=ln_eps)
    if impl == "fused_block" and mask is None and lora is None:
        # fully fused qkv+attn+o kernel (ops/fused_attention.py). Measured
        # SLOWER than einsum-projections + flash on v5e (thin per-head
        # matmuls underutilize the MXU) — kept opt-in, not 'auto'.
        from ..ops.fused_attention import fused_attn_block

        xx = x if dtype is None else x.astype(dtype)
        out = fused_attn_block(xx, p, heads=num_heads,
                               bias=key_padding_bias, causal=causal)
        if out is not None:
            return out if residual is None else residual + out
    if impl == "hybrid_block" and mask is None and lora is None:
        # einsum+flash forward with an all-in-one fused backward (dx direct).
        # Measured slower than letting XLA back-project dq/dk/dv on v5e
        # (thin per-head matmuls in the bwd kernel) — opt-in only.
        from ..ops.fused_attention import hybrid_attn_block

        xx = x if dtype is None else x.astype(dtype)
        out = hybrid_attn_block(xx, p, heads=num_heads,
                                bias=key_padding_bias, causal=causal)
        if out is not None:
            return out if residual is None else residual + out
    if qkv_fused is not None:
        q, k, v = qkv_fused
        if residual is not None and _fused_attn_o_enabled():
            from ..ops.fused_attn_o import fused_attn_o_residual

            rr = residual if dtype is None else residual.astype(dtype)
            out = fused_attn_o_residual(q, k, v, rr, p["o"], heads=num_heads,
                                        bias=key_padding_bias, causal=causal)
            if out is not None:
                return out
        from ..ops.flash_attention import flash_attention

        out = flash_attention(q, k, v, bias=key_padding_bias, causal=causal,
                              layout="bhnd", bias_grad=False)
        wo = p["o"]["w"]
        if dtype is not None:
            wo = wo.astype(dtype)
        out_flat = jnp.einsum("bhne,hed->bnd", out,
                              wo.reshape(num_heads, head_dim, d))
        if "b" in p["o"]:
            out_flat = out_flat + p["o"]["b"].astype(out_flat.dtype)
        return out_flat if residual is None else residual + out_flat

    if use_flash and mask is None:
        # head-major projection straight from the einsum: XLA fuses the
        # layout permutation into the matmul output, so the flash kernel
        # consumes [B, H, N, D] without explicit transpose copies in HBM.
        from ..ops.flash_attention import flash_attention

        def proj_bhnd(name):
            w = p[name]["w"]
            if dtype is not None:
                w = w.astype(dtype)
            wh = w.reshape(d, num_heads, head_dim)
            xx = x if dtype is None else x.astype(dtype)
            y = jnp.einsum("bnd,dhe->bhne", xx, wh)
            if "b" in p[name]:
                y = y + p[name]["b"].astype(y.dtype).reshape(num_heads, head_dim)[None, :, None, :]
            if lora is not None and name in lora:
                la = lora[name]
                xl = _lora_drop(xx, name, drop_keys, lora_dropout)
                delta = (xl.astype(y.dtype) @ la["a"].astype(y.dtype)) @ la["b"].astype(y.dtype)
                y = y + (delta * lora_scale).reshape(b, n, num_heads, head_dim).transpose(0, 2, 1, 3)
            return y

        if "qkv" in p:
            # freeze-time prepacked projection (core/partition.prepack_qkv):
            # one [d, 3d] matmul straight to head-major layout
            wp = p["qkv"]["w"]
            if dtype is not None:
                wp = wp.astype(dtype)
            xx = x if dtype is None else x.astype(dtype)
            y = jnp.einsum("bnd,dthe->tbhne", xx,
                           wp.reshape(d, 3, num_heads, head_dim))
            if "b" in p["qkv"]:
                y = y + p["qkv"]["b"].astype(y.dtype).reshape(
                    3, 1, num_heads, 1, head_dim)
            q, k, v = y[0], y[1], y[2]
            if lora is not None:
                outs = []
                for i, name in enumerate(("q", "k", "v")):
                    yi = y[i]
                    if name in lora:
                        la = lora[name]
                        xl = _lora_drop(xx, name, drop_keys, lora_dropout)
                        delta = (xl.astype(yi.dtype) @ la["a"].astype(yi.dtype)
                                 ) @ la["b"].astype(yi.dtype)
                        yi = yi + (delta * lora_scale).reshape(
                            b, n, num_heads, head_dim).transpose(0, 2, 1, 3)
                    outs.append(yi)
                q, k, v = outs
        else:
            q, k, v = proj_bhnd("q"), proj_bhnd("k"), proj_bhnd("v")
        if (residual is not None and lora is None and n <= 512
                and _fused_attn_o_enabled()):
            # post-norm towers (BERT) reach here with residual but no ln:
            # the attention+o-proj+residual kernel applies all the same
            # (short-regime kernel — see the qkv_fused gate above)
            from ..ops.fused_attn_o import fused_attn_o_residual

            rr = residual if dtype is None else residual.astype(dtype)
            fused_out = fused_attn_o_residual(q, k, v, rr, p["o"],
                                              heads=num_heads,
                                              bias=key_padding_bias,
                                              causal=causal)
            if fused_out is not None:
                return fused_out
        # key_padding_bias here is always a constant mask (BERT padding /
        # once-padded ViT tokens) — skip the dbias accumulation in backward
        out = flash_attention(q, k, v, bias=key_padding_bias, causal=causal,
                              layout="bhnd", bias_grad=False)
        # fused output projection from head-major layout
        wo = p["o"]["w"]
        if dtype is not None:
            wo = wo.astype(dtype)
        out_flat = jnp.einsum("bhne,hed->bnd", out, wo.reshape(num_heads, head_dim, d))
        if "b" in p["o"]:
            out_flat = out_flat + p["o"]["b"].astype(out_flat.dtype)
        if lora is not None and "o" in lora:
            xo = jnp.einsum("bhne->bnhe", out).reshape(b, n, d)
            xo = _lora_drop(xo, "o", drop_keys, lora_dropout)
            la = lora["o"]
            out_flat = out_flat + ((xo @ la["a"].astype(xo.dtype))
                                   @ la["b"].astype(xo.dtype)) * lora_scale
        return out_flat if residual is None else residual + out_flat

    q = _proj_with_lora(p, lora, "q", x, dtype=dtype, lora_scale=lora_scale,
                        drop_keys=drop_keys, drop_rate=lora_dropout)
    k = _proj_with_lora(p, lora, "k", x, dtype=dtype, lora_scale=lora_scale,
                        drop_keys=drop_keys, drop_rate=lora_dropout)
    v = _proj_with_lora(p, lora, "v", x, dtype=dtype, lora_scale=lora_scale,
                        drop_keys=drop_keys, drop_rate=lora_dropout)

    q = q.reshape(b, n, num_heads, head_dim)
    k = k.reshape(b, n, num_heads, head_dim)
    v = v.reshape(b, n, num_heads, head_dim)

    scale = 1.0 / math.sqrt(head_dim)
    # [B, H, N, N] logits in f32 for numerical stability of the softmax
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = logits + mask
    if key_padding_bias is not None:
        logits = logits + key_padding_bias[:, None, None, :]
    if causal:
        logits = logits + causal_mask(n)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
    out = out.reshape(b, n, d)
    out = _proj_with_lora(p, lora, "o", out, dtype=dtype, lora_scale=lora_scale,
                          drop_keys=drop_keys, drop_rate=lora_dropout)
    return out if residual is None else residual + out


def causal_mask(n: int, dtype=jnp.float32):
    """Additive causal mask [1, 1, N, N]; -inf above the diagonal."""
    m = jnp.triu(jnp.full((n, n), -jnp.inf, dtype=dtype), k=1)
    return m[None, None, :, :]

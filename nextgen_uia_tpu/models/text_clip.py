"""CLIP text transformer (OpenAI layout) in JAX.

Mirrors /root/reference/src/third_party/openai_clip/model.py:300-374:
token embedding + learned positional embedding, causal transformer
(quick-gelu), final LayerNorm, EOT pooling (argmax over token ids — the EOT
token has the highest id in the vocabulary), matrix text projection.
Used by: OpenAI CLIP, MetaCLIP, UniMedCLIP (whose text weights the reference
never loads — src/models/unimedclip/finetune.py:86-88 — semantics we keep).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn.layers import embedding, embedding_init, layernorm, layernorm_init, linear, linear_init
from .vit import ViTConfig, _block_init


@dataclasses.dataclass(frozen=True)
class TextConfig:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    depth: int = 12
    embed_dim: int = 512
    act: str = "quick_gelu"
    ln_eps: float = 1e-5
    mlp_impl: str = "auto"   # 'xla' required when text MLP weights train
    # 'fused_infer' = whole-block megakernel on forward-only paths
    # (ops/fused_block.py); the 77-token sequence is padded to a sublane
    # multiple first — with causal attention the pad columns are invisible
    # to real rows and pad rows are never EOT-pooled, so this is exact.
    block_impl: str = "auto"


def _as_vit_cfg(cfg: TextConfig) -> ViTConfig:
    # Text blocks share the pre-norm block implementation with the ViT.
    return ViTConfig(width=cfg.width, heads=cfg.heads, depth=cfg.depth,
                     act=cfg.act, ln_eps=cfg.ln_eps, mlp_impl=cfg.mlp_impl,
                     block_impl=cfg.block_impl)


def text_init(rng, cfg: TextConfig):
    ks = jax.random.split(rng, cfg.depth + 4)
    return {
        "token_embedding": embedding_init(ks[0], cfg.vocab_size, cfg.width, std=0.02),
        "pos": jax.random.normal(ks[1], (cfg.context_length, cfg.width), jnp.float32) * 0.01,
        "blocks": [_block_init(ks[2 + i], _as_vit_cfg(cfg)) for i in range(cfg.depth)],
        "ln_final": layernorm_init(cfg.width),
        "proj": linear_init(ks[-1], cfg.width, cfg.embed_dim, bias=False, std=cfg.width ** -0.5),
    }


def text_apply(p, cfg: TextConfig, token_ids, *, dtype=None):
    """token_ids [B, L] int32 -> [B, embed_dim]."""
    x = embedding(p["token_embedding"], token_ids, dtype=dtype)
    x = x + p["pos"][: x.shape[1]].astype(x.dtype)
    blk_cfg = _as_vit_cfg(cfg)
    n_real = x.shape[1]
    if cfg.block_impl == "fused_infer":
        # pad rows to the kernel sublane tile — exact under causal attention
        # (real rows never see later pad columns; pad rows are never pooled)
        sub = 16 if x.dtype == jnp.bfloat16 else 8
        if n_real % sub:
            x = jnp.pad(x, ((0, 0), (0, sub - n_real % sub), (0, 0)))
    for blk in p["blocks"]:
        x = _text_block(blk, x, blk_cfg, dtype=dtype)
    x = x[:, :n_real]
    x = layernorm(p["ln_final"], x, eps=cfg.ln_eps)
    # EOT pooling: feature at the position of the max token id (model.py:372)
    eot = jnp.argmax(token_ids, axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0, :]
    return linear(p["proj"], pooled, dtype=pooled.dtype)


def _text_block(p, x, cfg: ViTConfig, *, dtype=None):
    from ..nn.attention import mha
    from .vit import run_mlp

    if cfg.block_impl == "fused_infer" and cfg.mlp_impl == "auto":
        # forward-only whole-block megakernel (ops/fused_block.py)
        from ..ops.fused_block import fused_block_infer, fused_block_should_run

        if fused_block_should_run():
            xx = x if dtype is None else x.astype(dtype)
            out = fused_block_infer(xx, p, heads=cfg.heads, act=cfg.act,
                                    eps=cfg.ln_eps, causal=True)
            if out is not None:
                return out
    if cfg.mlp_impl == "auto":
        # frozen tower: raw x + ln1 + residual lets the TPU path fuse LN
        # into q/k/v and the o-proj + skip add into the attention kernel;
        # at 77 tokens the LN+QKV kernel declines (sublane tiling) and mha
        # falls back op-by-op with identical math
        x = mha(p["attn"], x, num_heads=cfg.heads, causal=True, dtype=dtype,
                ln=p["ln1"], ln_eps=cfg.ln_eps, residual=x)
    else:
        x = x + mha(p["attn"], layernorm(p["ln1"], x, eps=cfg.ln_eps),
                    num_heads=cfg.heads, causal=True, dtype=dtype)
    x = x + run_mlp(p["mlp"], layernorm(p["ln2"], x, eps=cfg.ln_eps),
                    cfg.act, cfg.mlp_impl, dtype=dtype)
    return x

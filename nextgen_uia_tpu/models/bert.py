"""BERT text tower (PubMedBERT) for BiomedCLIP in JAX.

The reference loads this through open_clip's HFTextEncoder wrapping
``microsoft/BiomedCLIP-PubMedBERT_256-vit_base_patch16_224``
(/root/reference/src/models/biomedclip/finetune.py:116-119): a BERT-base
encoder (12 post-norm layers, width 768, vocab 30522, ctx 256), CLS pooling of
the last hidden state, and an MLP projection 768 -> (768+512)//2 -> 512 with
no biases (open_clip ``proj='mlp'`` convention). Re-implemented TPU-first:
batch-first everywhere, LayerNorm statistics in f32, one fused attention path
shared with the ViT.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn.attention import mha
from ..nn.layers import (embedding, embedding_init, gelu, layernorm,
                         layernorm_init, linear, linear_init)


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    width: int = 768
    depth: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 512
    type_vocab: int = 2
    context_length: int = 256
    embed_dim: int = 512          # CLIP-space projection dim
    ln_eps: float = 1e-12
    pad_id: int = 0
    mlp_impl: str = "auto"   # 'xla' required when BERT MLP weights train
    lora_alpha: float = 32.0  # scaling for text-tower LoRA slots (alpha/sqrt(r))
    # dropout on the LoRA-branch input in train mode (reference LinearLoRA
    # under --tune_text_encoder, lora.py:317-367; gated on rng presence)
    lora_dropout: float = 0.0
    # 'fused_infer' = whole-layer Pallas megakernel (ops/fused_block.py,
    # FORWARD-ONLY contract) — set on eval paths and on the frozen in-step
    # text tower (its output never feeds jax.grad); 'auto' = per-sublayer
    # fused kernels.
    block_impl: str = "auto"


def bert_init(rng, cfg: BertConfig):
    ks = jax.random.split(rng, cfg.depth + 6)
    hidden = (cfg.width + cfg.embed_dim) // 2
    return {
        "embeddings": {
            "word": embedding_init(ks[0], cfg.vocab_size, cfg.width),
            "position": embedding_init(ks[1], cfg.max_positions, cfg.width),
            "token_type": embedding_init(ks[2], cfg.type_vocab, cfg.width),
            "ln": layernorm_init(cfg.width),
        },
        "layers": [_bert_layer_init(ks[3 + i], cfg) for i in range(cfg.depth)],
        "proj": {
            "fc1": linear_init(ks[-2], cfg.width, hidden, bias=False),
            "fc2": linear_init(ks[-1], hidden, cfg.embed_dim, bias=False),
        },
    }


def _bert_layer_init(rng, cfg: BertConfig):
    from ..nn.attention import attention_init

    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "attn": attention_init(k1, cfg.width),
        "attn_ln": layernorm_init(cfg.width),
        "ffn": {
            "fc1": linear_init(k2, cfg.width, cfg.intermediate),
            "fc2": linear_init(k3, cfg.intermediate, cfg.width),
        },
        "ffn_ln": layernorm_init(cfg.width),
    }


def _fused_bert_enabled() -> bool:
    import os

    return os.environ.get("NEXTGEN_UIA_FUSED_BERT", "1") != "0"


def _fused_bert_layer(layer, x, cfg: BertConfig, pad_bias, dtype):
    """One frozen post-norm BERT layer in three Pallas kernels: raw-x
    head-major q/k/v (full-width matmuls — the XLA per-head einsum leaves
    half the MXU lanes idle), attention + o-proj + residual + LN epilogue
    (the pre-LN sum never round-trips HBM), post-norm MLP + LN. Returns None
    when any kernel declines (caller falls back op-by-op)."""
    from ..ops.fused_attn_o import fused_attn_o_residual
    from ..ops.fused_ln_mlp import fused_postnorm_mlp_ln
    from ..ops.fused_ln_qkv import fused_ln_qkv

    xx = x if dtype is None else x.astype(dtype)
    qkv = fused_ln_qkv(xx, None, layer["attn"], heads=cfg.heads)
    if qkv is None:
        return None
    q, k, v = qkv
    y = fused_attn_o_residual(q, k, v, xx, layer["attn"]["o"], heads=cfg.heads,
                              bias=pad_bias, post_ln=layer["attn_ln"],
                              ln_eps=cfg.ln_eps)
    if y is None:
        return None
    return fused_postnorm_mlp_ln(y, layer["ffn"], layer["ffn_ln"],
                                 act="gelu", eps=cfg.ln_eps)


def bert_apply(p, cfg: BertConfig, token_ids, *, attention_mask=None,
               dtype=None, rng=None):
    """token_ids [B, L] -> CLS-pooled, MLP-projected embedding [B, embed_dim].

    rng: pass only in train mode — enables LoRA-branch dropout on layers
    carrying 'lora' slots (cfg.lora_dropout > 0)."""
    if attention_mask is None:
        attention_mask = (token_ids != cfg.pad_id).astype(jnp.float32)
    emb = p["embeddings"]
    x = embedding(emb["word"], token_ids, dtype=dtype)
    positions = jnp.arange(token_ids.shape[1])
    x = x + embedding(emb["position"], positions, dtype=x.dtype)[None]
    x = x + embedding(emb["token_type"], jnp.zeros_like(token_ids), dtype=x.dtype)
    x = layernorm(emb["ln"], x, eps=cfg.ln_eps)

    # additive key-padding bias [B, L]: 0 where attended, -1e9 where padded
    pad_bias = (1.0 - attention_mask) * -1e9

    from .vit import run_mlp

    fully_fused = (cfg.mlp_impl == "auto" and _fused_bert_enabled()
                   and jax.default_backend() == "tpu")
    # whole-layer megakernel: measured SLOWER than the 3-kernel chain for
    # BERT-256 on v5e (21.5 vs 20.7 ms/batch-64 fwd, bench/smoke_fused_block)
    # — post-norm LNs already fuse into the chain's epilogues, so the
    # megakernel only removes HBM hops the pipeline was hiding. Opt-in for
    # re-measurement on other parts; force mode serves the CPU wiring tests.
    mega = False
    if cfg.block_impl == "fused_infer" and cfg.mlp_impl == "auto":
        from ..ops.fused_block import fused_block_should_run

        mega = fused_block_should_run(opt_in_env="NEXTGEN_UIA_FUSED_BLOCK_BERT")
    for layer in p["layers"]:
        lora_rng = None
        if (rng is not None and cfg.lora_dropout > 0.0
                and "lora" in layer["attn"]):
            rng, lora_rng = jax.random.split(rng)
        # post-norm residual blocks (HF BERT layout). The frozen in-step
        # tower runs the whole layer through three Pallas kernels (head-major
        # qkv, attention+o+residual+LN epilogue, post-norm MLP+LN) — gated on
        # mlp_impl=='auto' exactly like the ViT/text blocks: full fine-tuning
        # (--tune_text_encoder, mlp_impl='xla') must keep every projection
        # and LN differentiable in XLA.
        if mega and "lora" not in layer["attn"]:
            # forward-only whole-layer megakernel: one HBM read + write
            # per layer (ops/fused_block.py)
            from ..ops.fused_block import fused_block_infer

            xx = x if dtype is None else x.astype(dtype)
            y = fused_block_infer(xx, layer, heads=cfg.heads, act="gelu",
                                  eps=cfg.ln_eps, key_bias=pad_bias,
                                  layout="postnorm")
            if y is not None:
                x = y
                continue
        if fully_fused and "lora" not in layer["attn"]:
            y = _fused_bert_layer(layer, x, cfg, pad_bias, dtype)
            if y is not None:
                x = y
                continue
        if cfg.mlp_impl == "auto":
            # residual=x fuses o-proj + skip into the attention kernel
            # (ops/fused_attn_o.py) — frozen-Wo contract
            a_sum = mha(layer["attn"], x, num_heads=cfg.heads,
                        key_padding_bias=pad_bias, dtype=dtype,
                        lora_alpha=cfg.lora_alpha, residual=x,
                        lora_dropout=cfg.lora_dropout, lora_rng=lora_rng)
        else:
            a_sum = x + mha(layer["attn"], x, num_heads=cfg.heads,
                            key_padding_bias=pad_bias, dtype=dtype,
                            lora_alpha=cfg.lora_alpha,
                            lora_dropout=cfg.lora_dropout, lora_rng=lora_rng)
        x = layernorm(layer["attn_ln"], a_sum, eps=cfg.ln_eps)
        h = run_mlp(layer["ffn"], x, "gelu", cfg.mlp_impl, dtype=dtype)
        x = layernorm(layer["ffn_ln"], x + h, eps=cfg.ln_eps)

    pooled = x[:, 0, :]  # CLS last-hidden-state pooling
    h = gelu(linear(p["proj"]["fc1"], pooled, dtype=pooled.dtype))
    return linear(p["proj"]["fc2"], h, dtype=h.dtype)

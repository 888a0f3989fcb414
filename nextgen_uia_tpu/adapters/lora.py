"""LoRA adapters as declarative parameter slots.

Behavioural contract from the reference (/root/reference/src/adapters/lora.py):
  - A: [r, in] kaiming-uniform(a=sqrt(5)); B: [out, r] zeros  (lora.py:39-44)
  - scaling = alpha / sqrt(r)  (NOT alpha/r — lora.py:21)
  - applied to q, k, v, o projections of attention (lora.py:202-248) or, for
    timm-style fused layouts, to qkv+proj — our converters split fused qkv, so
    here LoRA always lives on separate q/k/v/o slots.

In our [in, out] weight layout we store a: [in, r], b: [r, out] with
delta(x) = (x @ a) @ b * scaling, consumed inline by nn.attention.mha when an
attention subtree contains a 'lora' entry. Injection is a pure function on the
param tree; "freezing" falls out of the trainable-parameter partitioning
(core/partition.py) rather than requires_grad mutation.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def lora_pair_init(rng, in_dim: int, out_dim: int, r: int):
    # torch kaiming_uniform_(a=sqrt(5)) on A [r, in]: bound = 1/sqrt(fan_in)
    # (gain 1/sqrt(3) cancels the uniform sqrt(3)) — lora.py:39-44
    bound = 1.0 / math.sqrt(in_dim)
    a = jax.random.uniform(rng, (in_dim, r), jnp.float32, -bound, bound)
    return {"a": a, "b": jnp.zeros((r, out_dim), jnp.float32)}


def inject_lora_bert(rng, bert_params, *, dim: int, r: int = 16,
                     targets=("q", "k", "v", "o"), num_layers: int | None = None):
    """Add 'lora' slots to the BERT text tower's self-attention q/k/v/o —
    the reference's tune_text_encoder path (lora.py:317-367: query/key/value
    + attention.output.dense of the first ``num_layers`` encoder layers).
    Returns (new_bert_params, count)."""
    layers = bert_params["layers"]
    n = len(layers) if num_layers is None else min(num_layers, len(layers))
    new_layers = []
    for i, layer in enumerate(layers):
        layer = dict(layer)
        if i < n:
            attn = dict(layer["attn"])
            lora = {}
            for t in targets:
                rng, sub = jax.random.split(rng)
                lora[t] = lora_pair_init(sub, dim, dim, r)
            attn["lora"] = lora
            layer["attn"] = attn
        new_layers.append(layer)
    out = dict(bert_params)
    out["layers"] = new_layers
    return out, n


def inject_lora(rng, vit_params, *, dim: int, r: int = 16,
                targets=("q", "k", "v", "o"), num_layers: int | None = None):
    """Return (new_vit_params, count): add 'lora' slots to attention subtrees
    of the first ``num_layers`` blocks."""
    blocks = vit_params["blocks"]
    n = len(blocks) if num_layers is None else min(num_layers, len(blocks))
    new_blocks = []
    for i, blk in enumerate(blocks):
        blk = dict(blk)
        if i < n:
            attn = dict(blk["attn"])
            lora = {}
            for t in targets:
                rng, sub = jax.random.split(rng)
                lora[t] = lora_pair_init(sub, dim, dim, r)
            attn["lora"] = lora
            blk["attn"] = attn
        new_blocks.append(blk)
    out = dict(vit_params)
    out["blocks"] = new_blocks
    return out, n

"""Trainable-parameter partitioning.

The reference freezes weights by mutating ``requires_grad``
(/root/reference/src/models/biomedclip/finetune.py:165-175). The JAX-native
equivalent is a *partition* of the parameter pytree into (trainable, frozen)
subtrees selected by path predicates; gradients are only ever computed for the
trainable subtree, so optimizer state stays tiny (adapters-only) and frozen
weights can be donated/sharded freely.

Paths are '/'-joined key strings, e.g. ``visual/blocks/3/mona/down/w`` —
name-compatible with the reference's ``"mona" in name`` filters
(finetune.py:173-175) and with component-scoped checkpoints (§5.4).
"""

from __future__ import annotations

from typing import Callable

import jax


def path_str(path) -> str:
    parts = []
    for k in path:
        if isinstance(k, jax.tree_util.DictKey):
            parts.append(str(k.key))
        elif isinstance(k, jax.tree_util.SequenceKey):
            parts.append(str(k.idx))
        elif isinstance(k, jax.tree_util.GetAttrKey):
            parts.append(str(k.name))
        else:
            parts.append(str(k))
    return "/".join(parts)


def flatten_with_paths(tree):
    leaves, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [(path_str(p), v) for p, v in leaves]


def partition(params, predicate: Callable[[str], bool]):
    """Split a pytree into (selected, rest) by path predicate.

    Both outputs keep the full tree structure with ``None`` at excluded leaves,
    so ``merge`` can zip them back without shape bookkeeping.
    """
    selected = jax.tree_util.tree_map_with_path(
        lambda p, v: v if predicate(path_str(p)) else None, params)
    rest = jax.tree_util.tree_map_with_path(
        lambda p, v: None if predicate(path_str(p)) else v, params)
    return selected, rest


def merge(a, b):
    """Inverse of ``partition``: combine two complementary trees.

    Structural union: keys present in only one tree pass through (needed for
    freeze-time compute extras like prepack_qkv's 'qkv' entries, which exist
    only on the frozen side). Where both sides carry a non-None leaf, ``a``
    wins — partition guarantees complementarity for its own outputs.
    """
    if a is None:
        return b
    if b is None:
        return a
    if isinstance(a, dict) and isinstance(b, dict):
        return {k: merge(a.get(k), b.get(k)) for k in set(a) | set(b)}
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)) \
            and len(a) == len(b):
        return type(a)(merge(x, y) for x, y in zip(a, b))
    return a


def by_keywords(*keywords: str) -> Callable[[str], bool]:
    """Predicate matching any path containing one of the (lowercased) keywords —
    the reference's ``"mona" in name.lower()`` convention."""
    kws = tuple(k.lower() for k in keywords)
    return lambda path: any(k in path.lower() for k in kws)


def count_params(tree) -> int:
    return sum(v.size for _, v in flatten_with_paths(tree) if v is not None)


def cast_frozen_bf16(frozen):
    """Cast a frozen param subtree to bf16 (halves weight-read HBM traffic;
    safe for inference-only towers — LayerNorm statistics still run in f32
    inside the layers). Leaves None placeholders untouched."""
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16)
        if v is not None and v.dtype == jnp.float32 else v,
        frozen, is_leaf=lambda v: v is None)


def prepack_qkv(frozen):
    """Freeze-time attention prepack: concatenate each frozen attention
    subtree's q/k/v weights into one ``qkv`` entry ({'w': [d, 3d],
    'b': [3, d]}) so the projection runs as ONE wide matmul instead of three
    thin ones (profiled ~2x on the MXU; nn.attention.mha prefers 'qkv' when
    present). Original q/k/v entries are kept for the einsum fallback and
    checkpoint-name stability; the duplicates are frozen weights, so the
    extra HBM residency is bounded (~3.5 MB/block bf16).

    Apply to the FROZEN subtree only — trainable attention weights must stay
    unpacked so their gradients keep the reference layout.
    """
    import jax.numpy as jnp

    def walk(node):
        if isinstance(node, dict):
            out = {k: walk(v) for k, v in node.items()}
            if all(t in node and isinstance(node[t], dict) and "w" in node[t]
                   for t in ("q", "k", "v", "o")):
                ws = [node[t]["w"] for t in ("q", "k", "v")]
                if all(w is not None and getattr(w, "ndim", 0) == 2
                       and w.shape == ws[0].shape for w in ws):
                    packed = {"w": jnp.concatenate(ws, axis=1)}
                    if all(node[t].get("b") is not None for t in ("q", "k", "v")):
                        packed["b"] = jnp.stack(
                            [node[t]["b"] for t in ("q", "k", "v")])
                    out["qkv"] = packed
            return out
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(frozen)


def trainable_predicate(method: str) -> Callable[[str], bool]:
    """Standard finetune-method partitions (finetune.py:123-128)."""
    if method == "mona":
        return by_keywords("mona")
    if method == "lora":
        return by_keywords("lora")
    if method == "full":
        return lambda path: True
    raise ValueError(f"Unknown method {method!r}")

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
    """Inverse of ``partition``: combine two complementary trees."""
    return jax.tree_util.tree_map(
        lambda x, y: x if x is not None else y, a, b,
        is_leaf=lambda v: v is None)


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


def trainable_predicate(method: str) -> Callable[[str], bool]:
    """Standard finetune-method partitions (finetune.py:123-128)."""
    if method == "mona":
        return by_keywords("mona")
    if method == "lora":
        return by_keywords("lora")
    if method == "full":
        return lambda path: True
    raise ValueError(f"Unknown method {method!r}")

"""Component-scoped checkpoints.

Reference semantics (SURVEY.md §5.4): best-model checkpoints contain only the
trainable component subtree (adapter-only for finetune — finetune.py:200-208;
{reduces, blocks, head, mona} for supervised tasks — segmentation.py:236-246)
and are loaded by *name-intersection merge* with ``assert loaded > 0``
(zero_shot.py:136-147).

Format: a single ``.npz`` holding path->array pairs with '/'-joined pytree
paths (core/partition.py). Dependency-free, layout-stable, and merge-by-name
falls out naturally. Nested list indices are part of the path, so round-trips
through differently-shaped trees fail loudly instead of silently.
"""

from __future__ import annotations

import io
import os

import jax
import numpy as np

from .partition import flatten_with_paths, path_str


def save(path: str, params, *, keyword_filter=None) -> int:
    """Save (optionally keyword-filtered) params; returns count saved."""
    flat = {p: np.asarray(v) for p, v in flatten_with_paths(params) if v is not None}
    if keyword_filter:
        kws = [k.lower() for k in keyword_filter]
        flat = {p: v for p, v in flat.items() if any(k in p.lower() for k in kws)}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)
    return len(flat)


class NoMatch(ValueError):
    """Checkpoint/template name intersection is empty.

    Distinct from the shape-mismatch ValueError so dual-root fallbacks
    (driver ckpts root at 'params/head/...', converter ckpts at the component
    root) can retry a different template WITHOUT swallowing a genuine
    wrong-config error like a reduce_dim mismatch."""


def peek_keys(path: str) -> list[str]:
    """Names stored in a .npz checkpoint WITHOUT loading the arrays (npz
    members are read lazily; ``files`` only parses the zip directory).
    Used for adapter-type sniffing (tasks/common.py)."""
    with np.load(path) as data:
        return list(data.files)


def load_flat(path: str) -> dict:
    """Read a .npz checkpoint into a flat path->array dict (one file read,
    shareable across several merge_flat templates)."""
    with np.load(path) as data:
        return {k: data[k] for k in data.files}


def merge_flat(saved: dict, params, *, source: str = "checkpoint", skip=()):
    """Name-intersection merge of a flat path->array dict into a param tree.

    ``skip``: path prefixes to leave at their template values even when the
    checkpoint carries them (e.g. an ImageNet-width classifier head the task
    replaces). Returns (new_params, loaded_count); raises NoMatch if nothing
    matched (mirroring the reference's ``assert mona_params_loaded > 0``) and
    plain ValueError on a shape mismatch.
    """
    counter = {"n": 0}

    def merge_leaf(p, v):
        key = path_str(p)
        if key in saved and not any(key.startswith(s) for s in skip):
            arr = saved[key]
            if v is not None and tuple(arr.shape) != tuple(np.shape(v)):
                raise ValueError(f"Shape mismatch for {key}: ckpt {arr.shape} vs model {np.shape(v)}")
            counter["n"] += 1
            return jax.numpy.asarray(arr)
        return v

    new_params = jax.tree_util.tree_map_with_path(merge_leaf, params)
    if counter["n"] == 0:
        raise NoMatch(f"No parameters from {source} matched the model tree")
    return new_params, counter["n"]


def load_into(path: str, params, *, skip=()):
    """Name-intersection merge of a saved checkpoint into a param tree.

    Returns (new_params, loaded_count); raises NoMatch if nothing matched.
    """
    return merge_flat(load_flat(path), params, source=path, skip=skip)


# ---------------------------------------------------------------------------
# Mid-run resume — a capability the reference lacks (SURVEY.md §5.3: no
# preemption handling, no resume-from-step). Saves the FULL train state
# (params + optimizer state + step counter + host-side scalars) atomically.
# ---------------------------------------------------------------------------


def save_train_state(path: str, state, extra: dict | None = None) -> int:
    """Atomic full-state save; ``extra`` holds host scalars (epoch, best...).

    ``extra`` rides INSIDE the .npz (key ``__meta__``) so the state and its
    position metadata publish in one os.replace — a preemption kill between
    two file writes can never pair new state with stale meta (which would
    silently double-apply the epoch's updates on resume). The sidecar
    .meta.json is still written afterwards for human inspection only.
    """
    import json

    # one batched device->host transfer for the whole tree — per-leaf
    # np.asarray would issue one blocking fetch per array (~96 ms RTT on the
    # TPU relay × hundreds of optimizer/BN leaves, every epoch)
    state = jax.device_get(state)
    flat = {p: np.asarray(v) for p, v in flatten_with_paths(state) if v is not None}
    if extra is not None:
        flat["__meta__"] = np.array(json.dumps(extra))
    tmp = path + ".tmp.npz"  # explicit .npz so np.savez doesn't append one
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(tmp, **flat)
    os.replace(tmp, path)
    if extra is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(extra, f)
    return len(flat) - (1 if extra is not None else 0)


def load_train_state(path: str, state_template):
    """Restore a full train state saved by save_train_state.

    Returns (state, extra_dict). Strict: every leaf of the template must be
    present in the checkpoint."""
    import json

    with np.load(path) as data:
        saved = {k: data[k] for k in data.files}
    meta_arr = saved.pop("__meta__", None)

    def fill(p, v):
        key = path_str(p)
        if key not in saved:
            raise KeyError(f"train-state checkpoint {path} is missing {key}")
        return jax.numpy.asarray(saved[key])

    state = jax.tree_util.tree_map_with_path(fill, state_template)
    if meta_arr is not None:
        # authoritative: published atomically with the state itself
        extra = json.loads(str(meta_arr.item()))
    else:
        extra = {}
        if os.path.exists(path + ".meta.json"):  # pre-__meta__ checkpoints
            with open(path + ".meta.json") as f:
                extra = json.load(f)
    return state, extra

"""Device mesh and sharding policy.

The reference is single-GPU by construction (SURVEY.md §0); parallelism here
is a new, TPU-first design (§5.8): a 2-D mesh ``('data', 'model')``.

  - batches are sharded over 'data' (pure data parallelism — adapter-grad
    all-reduce rides ICI via the psum XLA inserts under jit)
  - large frozen tower matrices are sharded over 'model' (tensor-parallel
    style for the MLP/attention weights when divisible, FSDP-flavoured for
    everything else ≥ the size threshold) so replicated frozen weights don't
    dominate HBM at scale
  - small tensors (norms, biases, adapters) replicate: adapter optimizer
    state is tiny by design, the whole point of parameter-efficient tuning

Policies are expressed as PartitionSpecs derived from path + shape alone, so
they apply to any of the model families without per-model annotations.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, *, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = max(len(devices) // n_model, 1)
    need = n_data * n_model
    if len(devices) < need:
        raise ValueError(
            f"make_mesh: need {need} devices for a ({n_data} data x {n_model} "
            f"model) mesh, but only {len(devices)} visible "
            f"({jax.default_backend()} backend). For a virtual CPU mesh set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={need} and "
            f"force jax.config.update('jax_platforms', 'cpu') before backend "
            f"init (see tests/conftest.py).")
    use = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(use, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_spec(path: str, shape, *, model_axis_size: int, min_size: int = 2 ** 16) -> P:
    """PartitionSpec for one parameter.

    2-D matrices with a divisible trailing dim and ≥ min_size elements shard
    that dim over 'model'; embeddings/large 2-D shard the leading (vocab) dim;
    everything else replicates. Adapters (mona/lora) always replicate — their
    grads are the ones being all-reduced every step and they're tiny.
    """
    if model_axis_size <= 1:
        return P()
    lpath = path.lower()
    if "mona" in lpath or "lora" in lpath:
        return P()
    size = int(np.prod(shape)) if shape else 0
    if len(shape) == 2 and size >= min_size:
        if shape[1] % model_axis_size == 0:
            return P(None, "model")
        if shape[0] % model_axis_size == 0:
            return P("model", None)
    return P()


def param_pspecs(params, mesh: Mesh):
    """The PartitionSpec tree from param_spec policy (for shard_map in_specs).

    Canonical path-to-spec traversal: param_shardings and shard_params are
    thin derivations so the policy application lives in exactly one place.
    """
    from .partition import path_str

    def spec_of(path, v):
        return param_spec(path_str(path), np.shape(v),
                          model_axis_size=mesh.shape["model"])

    return jax.tree_util.tree_map_with_path(spec_of, params)


def param_shardings(params, mesh: Mesh):
    """The NamedSharding tree matching shard_params (for jit in_shardings)."""
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s),
                                  param_pspecs(params, mesh),
                                  is_leaf=lambda s: isinstance(s, P))


def shard_params(params, mesh: Mesh):
    """Device_put a param pytree according to param_spec policy."""
    return jax.tree_util.tree_map(jax.device_put, params,
                                  param_shardings(params, mesh))

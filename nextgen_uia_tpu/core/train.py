"""The shared jitted train-step engine.

One engine powers every task driver (SURVEY.md §7 "one jitted train-step
engine parameterized by (model_fn, loss_fn, metrics) that all task CLIs
share"), replacing the reference's 24 near-identical hand-written loops.

Reference training semantics reproduced (finetune.py:211-361,
segmentation.py:152-281):
  - AdamW (betas 0.9/0.95, CLI-overridable --beta1/--beta2), wd 0.01
  - cosine LR per *update* from lr to lr_min over total updates
  - gradient accumulation: K microbatches per update, loss averaged
  - global-norm gradient clipping (max_norm 1.0)
  - non-finite-loss microbatches are skipped (their grads are zeroed)

TPU-first: accumulation runs as a lax.scan over microbatches *inside* the
jitted step — one compiled program per update, weights read once per
microbatch from HBM, no Python-side accumulation. Data parallelism falls out
of sharded batch inputs; XLA inserts the psum over the 'data' axis.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass
class TrainConfig:
    lr: float = 1e-4
    lr_min: float = 1e-8
    weight_decay: float = 0.01
    beta1: float = 0.9
    beta2: float = 0.95
    grad_clip: float = 1.0
    accum_steps: int = 1
    total_updates: int = 1000


def make_optimizer(cfg: TrainConfig):
    schedule = optax.cosine_decay_schedule(
        init_value=cfg.lr, decay_steps=max(cfg.total_updates, 1),
        alpha=cfg.lr_min / cfg.lr if cfg.lr > 0 else 0.0)
    return optax.adamw(schedule, b1=cfg.beta1, b2=cfg.beta2,
                       weight_decay=cfg.weight_decay), schedule


def cosine_lr_value(cfg: TrainConfig, count: int) -> float:
    """Host-side value of make_optimizer's cosine schedule at 0-indexed
    update ``count`` — same formula as optax.cosine_decay_schedule, in pure
    Python so per-update lr logging never dispatches to the device (the
    relay's fetch RTT makes a jnp call per update prohibitive)."""
    import math

    steps = max(cfg.total_updates, 1)
    t = min(max(count, 0), steps)
    alpha = cfg.lr_min / cfg.lr if cfg.lr > 0 else 0.0
    return cfg.lr * ((1 - alpha) * 0.5 * (1 + math.cos(math.pi * t / steps))
                     + alpha)


def init_state(trainable_params, optimizer):
    return {"params": trainable_params, "opt": optimizer.init(trainable_params),
            "step": jnp.zeros((), jnp.int32)}


def make_train_step(loss_fn: Callable[..., Any], optimizer, cfg: TrainConfig,
                    *, donate: bool = True, has_aux: bool = False):
    """Build the jitted update function.

    loss_fn(trainable_params, frozen_params, microbatch, rng) -> scalar loss,
    or (loss, aux) when has_aux=True (aux = e.g. updated batchnorm state; the
    last microbatch's aux is returned in metrics['aux']).

    Returned step(state, frozen, batch, rng) expects batch leaves shaped
    [accum_steps, micro_bs, ...] (use ``stack_microbatches``) and returns
    (new_state, metrics dict with 'loss', 'grad_norm', 'skipped').
    """

    grad_fn = jax.value_and_grad(loss_fn, has_aux=has_aux)

    def step(state, frozen, batch, rng):
        params = state["params"]

        def micro(carry, xs):
            grads_acc, loss_acc, count, _ = carry
            mb, mb_rng = xs
            if has_aux:
                (loss, aux), grads = grad_fn(params, frozen, mb, mb_rng)
            else:
                loss, grads = grad_fn(params, frozen, mb, mb_rng)
                aux = None
            ok = jnp.isfinite(loss)
            # skip non-finite microbatches (finetune.py:281-285)
            grads = jax.tree_util.tree_map(
                lambda g, a: a + jnp.where(ok, g, 0.0), grads, grads_acc)
            return (grads, loss_acc + jnp.where(ok, loss, 0.0), count + ok, aux), None

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        rngs = jax.random.split(rng, cfg.accum_steps)
        aux0 = None
        if has_aux:
            # aux structure from one abstract eval (batchnorm state shapes)
            aux0 = jax.eval_shape(
                lambda: loss_fn(params, frozen,
                                jax.tree_util.tree_map(lambda x: x[0], batch),
                                rng)[1])
            aux0 = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), aux0)
        (grads, loss_sum, n_ok, aux), _ = jax.lax.scan(
            micro, (zero_grads, 0.0, jnp.zeros((), jnp.int32), aux0), (batch, rngs))

        denom = jnp.maximum(n_ok, 1).astype(jnp.float32)
        grads = jax.tree_util.tree_map(lambda g: g / denom, grads)

        gnorm = optax.global_norm(grads)
        if cfg.grad_clip > 0:
            scale = jnp.minimum(1.0, cfg.grad_clip / jnp.maximum(gnorm, 1e-12))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)

        updates, new_opt = optimizer.update(grads, state["opt"], params)
        new_params = optax.apply_updates(params, updates)
        # if every microbatch was non-finite, skip the whole update: keep
        # previous params AND optimizer state (moments/step count must not
        # advance on zero grads — reference skip-the-step semantics)
        any_ok = n_ok > 0
        new_params, new_opt = _keep_if_skipped(
            any_ok, (new_params, new_opt), (params, state["opt"]))
        new_state = {"params": new_params, "opt": new_opt, "step": state["step"] + 1}
        metrics = {"loss": loss_sum / denom, "grad_norm": gnorm,
                   "skipped": cfg.accum_steps - n_ok}
        if has_aux:
            metrics["aux"] = aux
        return new_state, metrics

    donate_args = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_args)


def _keep_if_skipped(any_ok, new_trees, old_trees):
    """Select new vs old pytrees elementwise on the any_ok predicate.

    Non-float leaves (e.g. optax int step counters) are selected too so the
    schedule does not advance on an all-skipped update.
    """
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(any_ok, n, o), new_trees, old_trees)


def make_sharded_train_step(loss_fn, optimizer, cfg: TrainConfig, mesh,
                            *, donate: bool = True, has_aux: bool = False,
                            frozen_specs=None):
    """Data-parallel train step via shard_map over the mesh's 'data' axis —
    optionally with the frozen tower FSDP-sharded over 'model'.

    Inside shard_map every device runs the per-shard program on LOCAL shapes —
    this is what makes the Pallas kernels (flash attention, fused MLP)
    multi-chip safe: a plain jit would hand them globally-sharded operands
    that custom calls can't partition. Gradients/losses are psum-averaged
    over the data-parallel axes; trainable params/opt state are replicated.

    ``frozen_specs`` (a PartitionSpec tree matching ``frozen``, from
    core.mesh.param_pspecs) activates the §5.8 "frozen weights sharded once"
    design when the mesh's 'model' axis is >1: frozen matrices live sharded
    over 'model' in HBM (memory / n_model) and are all-gathered over ICI at
    use inside the step — classic FSDP, minus the reduce-scatter because
    frozen weights receive no gradients. The batch then shards over BOTH
    mesh axes, so all devices do data-parallel compute.

    Batch leaves must be [accum, global_batch, ...], sharded on axis 1.

    Note on contrastive losses: loss_fn sees the LOCAL shard, so InfoNCE
    negatives are shard-local — identical semantics to the reference's
    single-device batches when per-chip batch == the reference batch size.
    For global negatives, all_gather features inside loss_fn over the
    data-parallel axes (both of them under FSDP).
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    grad_fn = jax.value_and_grad(loss_fn, has_aux=has_aux)
    n_model = mesh.shape.get("model", 1)
    fsdp = frozen_specs is not None and n_model > 1
    dp_axes = ("data", "model") if fsdp else "data"

    def _gather_frozen(frozen):
        if not fsdp:
            return frozen
        return gather_from_specs(frozen, frozen_specs)

    def local_grads(params, frozen, batch, rng):
        # decorrelate per-shard randomness (dropout, augmentation)
        shard_idx = jax.lax.axis_index("data")
        if fsdp:
            shard_idx = shard_idx * n_model + jax.lax.axis_index("model")
        rng = jax.random.fold_in(rng, shard_idx)
        # FSDP: materialize full frozen weights from their 'model' shards
        # once per step (forward AND the scan reuse the gathered tree)
        frozen = _gather_frozen(frozen)

        def micro(carry, xs):
            grads_acc, loss_acc, count, _ = carry
            mb, mb_rng = xs
            if has_aux:
                (loss, aux), grads = grad_fn(params, frozen, mb, mb_rng)
            else:
                loss, grads = grad_fn(params, frozen, mb, mb_rng)
                aux = None
            ok = jnp.isfinite(loss)
            grads = jax.tree_util.tree_map(
                lambda g, a: a + jnp.where(ok, g, 0.0), grads, grads_acc)
            return (grads, loss_acc + jnp.where(ok, loss, 0.0), count + ok, aux), None

        zero = jax.tree_util.tree_map(jnp.zeros_like, params)
        rngs = jax.random.split(rng, cfg.accum_steps)
        aux0 = None
        if has_aux:
            aux0 = jax.eval_shape(
                lambda: loss_fn(params, frozen,
                                jax.tree_util.tree_map(lambda x: x[0], batch),
                                rng)[1])
            aux0 = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), aux0)
        (grads, loss_sum, n_ok, aux), _ = jax.lax.scan(
            micro, (zero, 0.0, jnp.zeros((), jnp.int32), aux0), (batch, rngs))
        # average over microbatches locally, then over the DP axes
        denom = jnp.maximum(n_ok, 1).astype(jnp.float32)
        grads = jax.tree_util.tree_map(lambda g: g / denom, grads)
        grads = jax.lax.pmean(grads, dp_axes)
        loss = jax.lax.pmean(loss_sum / denom, dp_axes)
        n_ok_any = jax.lax.pmax(n_ok, dp_axes)
        skipped = jax.lax.pmax(cfg.accum_steps - n_ok, dp_axes)
        if has_aux:
            # merge per-shard batch statistics (e.g. BN running stats)
            aux = jax.tree_util.tree_map(lambda a: jax.lax.pmean(a, dp_axes), aux)
        return grads, loss, n_ok_any, skipped, aux

    rep = P()
    batch_spec = P(None, dp_axes)

    def step(state, frozen, batch, rng):
        specs_batch = jax.tree_util.tree_map(lambda _: batch_spec, batch)
        frozen_in = (frozen_specs if fsdp
                     else jax.tree_util.tree_map(lambda _: rep, frozen))
        sharded = shard_map(
            local_grads, mesh=mesh,
            in_specs=(jax.tree_util.tree_map(lambda _: rep, state["params"]),
                      frozen_in,
                      specs_batch, rep),
            out_specs=(jax.tree_util.tree_map(lambda _: rep, state["params"]),
                       rep, rep, rep, rep),
            check_vma=False)
        grads, loss, n_ok_any, skipped, aux = sharded(
            state["params"], frozen, batch, rng)

        gnorm = optax.global_norm(grads)
        if cfg.grad_clip > 0:
            scale = jnp.minimum(1.0, cfg.grad_clip / jnp.maximum(gnorm, 1e-12))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, new_opt = optimizer.update(grads, state["opt"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        # all-skipped update on every shard: keep params AND opt state
        new_params, new_opt = _keep_if_skipped(
            n_ok_any > 0, (new_params, new_opt), (state["params"], state["opt"]))
        new_state = {"params": new_params, "opt": new_opt, "step": state["step"] + 1}
        metrics = {"loss": loss, "grad_norm": gnorm, "skipped": skipped}
        if has_aux:
            metrics["aux"] = aux
        return new_state, metrics

    donate_args = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_args)


def gather_from_specs(tree, specs):
    """Inside shard_map: all_gather every leaf whose PartitionSpec names the
    'model' axis — materializes full FSDP-sharded weights at use."""

    def g(x, spec):
        for axis, name in enumerate(spec):
            names = name if isinstance(name, tuple) else (
                (name,) if name is not None else ())
            if "model" in names:
                return jax.lax.all_gather(x, "model", axis=axis, tiled=True)
        return x

    return jax.tree_util.tree_map(g, tree, specs)


def make_sharded_apply(fn, mesh=None, *, frozen_specs=None):
    """Data-parallel evaluation/inference via shard_map (the eval-side
    counterpart of make_sharded_train_step — VERDICT r2 Weak #5).

    ``fn(trainable, frozen, batch)`` must return arrays whose LEADING axis is
    the batch axis (logits, features, per-sample losses). Batch leaves shard
    on axis 0 over the mesh's data-parallel width; trainable params
    replicate. ``frozen_specs`` (core.mesh.param_pspecs) lets eval consume
    the FSDP-sharded frozen tree directly — the same all-gather-at-use as the
    train step, so no second unsharded copy of the frozen tower sits in HBM.

    shard_map (not plain jit-with-shardings) for the same reason as training:
    the Pallas custom calls (flash attention, fused MLP) can only see LOCAL
    shapes (CLAUDE.md invariant).

    Returns ``(apply, batch_sharding, dp_width)``. Callers must pad ragged
    eval batches to a multiple of dp_width (``pad_eval_batch``) and slice
    outputs back to the real length. On a 1-device mesh this degrades to a
    plain jit with dp_width=1 (padding becomes a no-op).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    n_model = mesh.shape.get("model", 1) if mesh is not None else 1
    fsdp = frozen_specs is not None and n_model > 1
    dp_width = (mesh.shape["data"] if mesh is not None else 1) * (
        n_model if fsdp else 1)
    if mesh is None or dp_width <= 1:
        return jax.jit(fn), None, 1
    dp_axes = ("data", "model") if fsdp else "data"
    rep = P()
    bspec = P(dp_axes)

    def local_fn(tp, fz, batch):
        if fsdp:
            fz = gather_from_specs(fz, frozen_specs)
        return fn(tp, fz, batch)

    def apply(tp, fz, batch):
        in_specs = (jax.tree_util.tree_map(lambda _: rep, tp),
                    frozen_specs if fsdp
                    else jax.tree_util.tree_map(lambda _: rep, fz),
                    jax.tree_util.tree_map(lambda _: bspec, batch))
        # out_specs as a spec prefix: every output leaf is batch-leading
        return shard_map(local_fn, mesh=mesh, in_specs=in_specs,
                         out_specs=bspec, check_vma=False)(tp, fz, batch)

    return jax.jit(apply), NamedSharding(mesh, bspec), dp_width


def pad_eval_batch(batch: dict, multiple: int):
    """Host-side: pad array leaves' leading dim up to a multiple of
    ``multiple`` by repeating the last row (finite values keep BN/softmax
    well-behaved). Accepts numpy or jax array leaves; non-array leaves (name
    lists, ints) pass through. Returns (batch, n_real); slice every output
    back to n_real before accumulating metrics."""
    import numpy as np

    def is_arr(v):
        return hasattr(v, "shape") and hasattr(v, "dtype") and getattr(
            v, "ndim", 0) >= 1

    n = next(v.shape[0] for v in batch.values() if is_arr(v))
    if multiple <= 1 or n % multiple == 0:
        return batch, n
    pad = multiple - n % multiple
    out = {}
    for k, v in batch.items():
        if is_arr(v):
            a = np.asarray(v)
            out[k] = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], axis=0)
        else:
            out[k] = v
    return out, n


def scale_gradient(x, s: float):
    """Identity on the forward pass; multiplies the cotangent by ``s``.

    Needed when a shard-local loss_fn computes a GLOBAL loss from
    all_gathered activations: each shard's grad is only its local-sample
    contribution, and the engine pmean would under-scale it by the data-axis
    size — pre-scaling by that size makes pmean(g) the true global gradient.
    """
    return x * s + jax.lax.stop_gradient(x * (1.0 - s))


def make_step_for_mesh(loss_fn, optimizer, cfg: TrainConfig, mesh=None,
                       *, donate: bool = True, has_aux: bool = False,
                       frozen_example=None):
    """Build the right step for a mesh: the plain jitted step when only one
    device participates, else the shard_map data-parallel step — the
    Pallas-safe multi-chip path (CLAUDE.md invariant: custom calls must see
    local shapes).

    ``frozen_example`` (the frozen pytree, or any tree with its shapes)
    activates FSDP sharding of the frozen tower over the mesh's 'model' axis
    when that axis is >1 — the batch then shards over BOTH axes. Pass the
    frozen tree through core.mesh.shard_params first so HBM actually holds
    shards from step one (jit would otherwise reshard on call).

    Returns (step, batch_sharding): device_put each host-stacked
    [accum, global_batch, ...] batch with ``batch_sharding`` before calling
    step (None means unsharded single-device placement).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_data = mesh.shape.get("data", 1) if mesh is not None else 1
    n_model = mesh.shape.get("model", 1) if mesh is not None else 1
    fsdp = n_model > 1 and frozen_example is not None
    if mesh is None or (n_data <= 1 and not fsdp):
        return (make_train_step(loss_fn, optimizer, cfg, donate=donate,
                                has_aux=has_aux), None)
    frozen_specs = None
    batch_axes = "data"
    if fsdp:
        from .mesh import param_pspecs

        frozen_specs = param_pspecs(frozen_example, mesh)
        batch_axes = ("data", "model")
    step = make_sharded_train_step(loss_fn, optimizer, cfg, mesh,
                                   donate=donate, has_aux=has_aux,
                                   frozen_specs=frozen_specs)
    return step, NamedSharding(mesh, P(None, batch_axes))


def stack_microbatches(batch: dict, accum_steps: int):
    """Reshape batch leaves [B, ...] -> [accum, B//accum, ...]."""
    def r(x):
        b = x.shape[0]
        micro = b // accum_steps
        return x[: accum_steps * micro].reshape(accum_steps, micro, *x.shape[1:])
    return {k: r(v) for k, v in batch.items()}


class EarlyStopper:
    """Best-metric tracking + patience early stop (finetune.py:335-356)."""

    def __init__(self, patience: int, mode: str = "min"):
        self.patience = patience
        self.mode = mode
        self.best = None
        self.best_step = -1
        self.counter = 0

    def update(self, value: float, step: int) -> bool:
        """Returns True when this is a new best."""
        better = (self.best is None
                  or (self.mode == "min" and value < self.best)
                  or (self.mode == "max" and value > self.best))
        if better:
            self.best = value
            self.best_step = step
            self.counter = 0
            return True
        self.counter += 1
        return False

    @property
    def should_stop(self) -> bool:
        return self.counter >= self.patience


def stopper_meta(stopper: EarlyStopper) -> dict:
    """The early-stop fields every resumable checkpoint must carry — one
    schema shared by both train engines (restore with restore_stopper)."""
    return {"best": stopper.best, "best_epoch": stopper.best_step,
            "patience_counter": stopper.counter}


def restore_stopper(stopper: EarlyStopper, meta: dict) -> None:
    stopper.best = meta.get("best")
    stopper.best_step = int(meta.get("best_epoch", -1))
    stopper.counter = int(meta.get("patience_counter", 0))


class GracefulShutdown:
    """Preemption handler for the train engines.

    Preemptible TPU pools deliver SIGTERM shortly before reclaiming the
    host; the reference has no handling at all (SURVEY §5.3) and dies
    mid-step, losing the run since its last best-model save. Installing this
    lets a loop finish the in-flight update, checkpoint the FULL train state
    (core/checkpoint.save_train_state), and exit cleanly so `--resume`
    continues exactly where the signal landed.

    The first SIGTERM/SIGINT only sets ``requested`` and restores the
    previous handlers — a second signal therefore behaves as before install
    (kill/KeyboardInterrupt), so a stuck run can still be terminated.
    install() is a no-op off the main thread (the signal module's rule);
    ``requested`` then simply stays False.
    """

    def __init__(self):
        self.requested = False
        self._prev = {}

    def _handler(self, signum, frame):
        import logging

        self.requested = True
        logging.warning(f"signal {signum} received: finishing the current "
                        "update, then checkpointing for --resume "
                        "(signal again to force the previous behavior)")
        self.uninstall()

    def install(self):
        import signal
        import threading

        if threading.current_thread() is not threading.main_thread():
            return self
        for s in (signal.SIGTERM, signal.SIGINT):
            self._prev[s] = signal.signal(s, self._handler)
        return self

    def uninstall(self):
        import signal

        prev, self._prev = self._prev, {}
        for s, h in prev.items():
            signal.signal(s, h)

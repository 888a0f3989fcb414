"""Augmentation cost at 518^2 + the Pallas LUT kernel A/B (round 5).

VERDICT r4 flagged that the 518-px augmentation bill was an extrapolation
(224^2 measured 18.9 ms/batch-32, scaled to "~94 ms" for the dino-seg step)
and asked for a measurement plus a re-adjudication of the LUT-flush levers
at that size. This probe measures, on the real chip:

  1. lut-apply microbench (one application, the per-slot dominant term):
     fused compare-select-sum (round-4 form) vs one-hot matmul vs the
     16x16-factorized XLA form (round-5 default) vs the Pallas 16x16
     kernel (opt-in), plus the histogram variants, at 32x224^2 and
     24x518^2;
  2. the full strong+weak augment_batch at both geometries with the Pallas
     apply kernel OFF (shipped default: factorized XLA) and ON (opt-in) —
     measured a wash, which is why the kernel is opt-in (PERF.md round 5).

Methodology per CLAUDE.md: chained applications via lax.fori_loop-free
host loop with a dependency chain, host scalar fetch as the barrier, best
of 2 windows, run solo.  python bench/smoke_aug518.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

STEPS = int(os.environ.get("NEXTGEN_UIA_BENCH_STEPS", "20"))


def timeit(fn, *args):
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    # dependency-chained host loop + scalar fetch (CLAUDE.md barrier rule)
    dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        x = args[0]
        for _ in range(STEPS):
            x = fn(x, *args[1:])
            x = jax.tree.map(lambda a: a, x)
        s = jax.tree.leaves(x)[0]
        float(s.reshape(-1)[0])
        dts.append(time.perf_counter() - t0)
    return min(dts) / STEPS


def lut_micro(results, tag, b, side):
    from nextgen_uia_tpu.ops.lut import (hist256_fact, lut_apply,
                                         lut_apply_fact, lut_apply_xla)

    img = jax.random.uniform(jax.random.key(0), (b, side, side, 1))
    luts = jax.random.randint(jax.random.key(1), (b, 256), 0, 256)

    def one_hot_matmul(img, luts):
        u8 = jnp.clip(jnp.round(img * 255.0), 0, 255)
        oh = (u8[..., None] == jnp.arange(256, dtype=jnp.float32)).astype(
            jnp.bfloat16)
        return jnp.einsum("bhwcn,bn->bhwc", oh,
                          luts.astype(jnp.bfloat16)).astype(jnp.float32) / 255.0

    variants = {
        "xla_cmpsum": jax.jit(jax.vmap(lambda i, l: lut_apply_xla(i, l) / 255.0)),
        "onehot_matmul": jax.jit(one_hot_matmul),
        "xla_fact16": jax.jit(jax.vmap(lambda i, l: lut_apply_fact(i, l) / 255.0)),
        "pallas_16x16": jax.jit(jax.vmap(lambda i, l: lut_apply(i, l) / 255.0)),
    }
    for name, fn in variants.items():
        dt = timeit(fn, img, luts)
        results[f"lut_{name}_{tag}_ms"] = round(dt * 1e3, 2)
        print(f"lut apply {name:14s} {tag}: {dt * 1e3:7.2f} ms/application",
              flush=True)

    def hist_cmp(img):
        u8 = jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.int32)
        return jnp.sum(
            u8.reshape(img.shape[0], -1, 1) == jnp.arange(256, dtype=jnp.int32),
            axis=1, dtype=jnp.int32).astype(jnp.float32)

    def hist_fact(img):
        return jax.vmap(hist256_fact)(img).astype(jnp.float32)

    # timeit chains output->input, so return an image-shaped value with a
    # data dependency on the histogram (one extra image-size scalar-multiply
    # per iteration, identical for both variants)
    def chained(hist_fn):
        return jax.jit(lambda i: i * jnp.exp(0.0 * jnp.sum(hist_fn(i))))

    for name, fn in (("hist_cmpsum", chained(hist_cmp)),
                     ("hist_fact16", chained(hist_fact))):
        dt = timeit(fn, img)
        results[f"{name}_{tag}_ms"] = round(dt * 1e3, 2)
        print(f"{name:14s} {tag}: {dt * 1e3:7.2f} ms/batch", flush=True)


def full_aug(results, tag, b, side, kernel_on):
    os.environ["NEXTGEN_UIA_LUT_KERNEL"] = "1" if kernel_on else "0"
    from nextgen_uia_tpu.data import augment as A
    from nextgen_uia_tpu.ops import lut as lut_ops

    lut_ops.use_kernel.cache_clear()
    A.augment_batch._clear_cache()

    img = jax.random.uniform(jax.random.key(2), (b, side, side, 1))
    mask = (jax.random.uniform(jax.random.key(3), (b, side, side, 1)) > 0.7
            ).astype(jnp.float32)

    def step(img, mask):
        o, m = A.augment_batch(jax.random.key(4), img, mask, strong=True,
                               weak=True, out_size=side)
        return o

    dt = timeit(jax.jit(step), img, mask)
    # kernel=off -> the shipped default (factorized XLA hist + apply);
    # kernel=on  -> Pallas apply (opt-in A/B)
    key = f"aug_full_{tag}_{'kernel' if kernel_on else 'fact16'}_ms"
    results[key] = round(dt * 1e3, 1)
    print(f"augment_batch {tag} kernel={'on ' if kernel_on else 'off'}: "
          f"{dt * 1e3:7.1f} ms/batch ({b / dt:7.1f} img/s)", flush=True)


def main():
    results = {}
    for tag, b, side in (("224", 32, 224), ("518", 24, 518)):
        lut_micro(results, tag, b, side)
    for tag, b, side in (("224", 32, 224), ("518", 24, 518)):
        for kernel_on in (False, True):
            full_aug(results, tag, b, side, kernel_on)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

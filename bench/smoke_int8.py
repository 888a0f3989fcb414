"""Int8 MXU feasibility probe for a quantized serving path.

VERDICT: REJECTED on this chip — int8 matmul measured 0.99x bf16 (no int8
MXU speedup on this part/toolchain), so a quantized serving path was NOT
built; full numbers + reasoning in PERF.md "Int8 quantized serving". This
script is the settled probe, kept ONLY to re-run on other TPU generations
(v4/v6e expose int8 differently) before revisiting.

Question it answers: does int8 x int8 -> int32 matmul actually run ~2x bf16
on this chip (v5e peak ~394 TOPS int8 vs ~197 TFLOP/s bf16), and does it
lower through (a) plain XLA and (b) Pallas/Mosaic on this toolchain?  The
eval forward is at a compute/pipeline floor (PERF.md megakernel section), so
the only remaining serving lever is lower-precision FLOPs — worth building
ONLY if the raw matmul speedup materializes.

Method follows the repo bench discipline (CLAUDE.md): chained fori_loop
matmuls (data dependency defeats CSE; no per-step dispatch), host scalar
fetch as the barrier, best of 2 windows, >=30 iterations.

Run: python bench/smoke_int8.py   (on the TPU; solo)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

M = K = N = 4096
ITERS = 30


def _time(fn, *args):
    fn(*args)  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def bf16_chain(a, b):
    def body(i, acc):
        # acc folds into a's first row: data dependency chains the matmuls
        a2 = a.at[0, 0].set(acc.astype(jnp.bfloat16))
        c = jax.lax.dot(a2, b, preferred_element_type=jnp.float32)
        return c[0, 0]
    return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))


def int8_chain(a, b):
    def body(i, acc):
        a2 = a.at[0, 0].set((acc & 0x7F).astype(jnp.int8))
        c = jax.lax.dot(a2, b, preferred_element_type=jnp.int32)
        return c[0, 0]
    return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))


def pallas_int8_probe():
    """Does a Mosaic kernel lower jax.lax.dot(int8, int8 -> int32)?"""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot(a_ref[...], b_ref[...],
                                 preferred_element_type=jnp.int32)

    a = jnp.ones((256, 256), jnp.int8)
    b = jnp.ones((256, 256), jnp.int8)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int32),
        interpret=jax.default_backend() == "cpu",
    )(a, b)
    return int(out[0, 0])


def main():
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (M, K), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int8))
    abf = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    bbf = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)

    flops = 2.0 * M * K * N

    t_bf = _time(jax.jit(bf16_chain), abf, bbf)
    print(f"bf16  {M}x{K}x{N}: {t_bf*1e3:.3f} ms/matmul  "
          f"{flops/t_bf/1e12:.1f} TF/s")

    try:
        t_i8 = _time(jax.jit(int8_chain), a8, b8)
        print(f"int8  {M}x{K}x{N}: {t_i8*1e3:.3f} ms/matmul  "
              f"{flops/t_i8/1e12:.1f} TOP/s   speedup {t_bf/t_i8:.2f}x")
    except Exception as e:  # noqa: BLE001 — feasibility probe
        print(f"int8 XLA matmul FAILED: {type(e).__name__}: {e}")

    try:
        v = pallas_int8_probe()
        print(f"pallas int8 dot lowers: out[0,0]={v} (expect 256)")
    except Exception as e:  # noqa: BLE001
        print(f"pallas int8 dot FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0] if str(e) else e}")


if __name__ == "__main__":
    sys.exit(main())

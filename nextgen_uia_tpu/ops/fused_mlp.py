"""Fused frozen-MLP Pallas kernel: fc1 -> activation -> fc2 in one pass.

Motivation: this chip is HBM-bandwidth-bound (~89 GB/s measured, PERF.md).
XLA materializes the transformer MLP's hidden tensor ([B*N, 4D] bf16 — 76 MB
for ViT-B at batch 64) in HBM between the two matmuls, costing ~150 MB of
traffic per block per direction. This kernel streams row tiles through
fc1 -> act -> fc2 with the hidden chunk held in VMEM: per-block traffic drops
to read-x + write-out + weights.

Shape strategy: grid (row_tiles, hidden_chunks). x tile and the f32 output
accumulator have constant index along the hidden axis, so Mosaic keeps them
resident while hidden chunks stream; the output block accumulates across
hidden steps (init at hc == 0). Weights are chunked along the hidden dim
(w1 [D, Hc], w2 [Hc, D]).

Backward (custom VJP) assumes FROZEN weights — it produces dx only (weight
grads are structural zeros). Drivers must route full fine-tuning through the
XLA path (ViTConfig.mlp_impl = 'xla'); adapter methods (mona/lora) never
differentiate MLP weights, which is the hot production path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (|err| < 1.5e-7) — Mosaic on this
    toolchain has no erf/erfc lowering."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _act_fns(name):
    if name == "gelu":
        fwd = lambda a: 0.5 * a * (1.0 + _erf(a * (1.0 / jnp.sqrt(2.0))))

        def grad(a):
            # d/da [a * Phi(a)] = Phi(a) + a * phi(a)
            phi = jnp.exp(-0.5 * a * a) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
            Phi = 0.5 * (1.0 + _erf(a * (1.0 / jnp.sqrt(2.0))))
            return Phi + a * phi
    elif name == "quick_gelu":
        fwd = lambda a: a * jax.nn.sigmoid(1.702 * a)

        def grad(a):
            s = jax.nn.sigmoid(1.702 * a)
            return s + 1.702 * a * s * (1.0 - s)
    else:
        raise ValueError(f"unsupported activation {name!r}")
    return fwd, grad


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, act, n_hc, hc_size):
    x = x_ref[...]
    fwd, _ = _act_fns(act)
    acc = jnp.broadcast_to(b2_ref[0].astype(jnp.float32)[None, :],
                           (x.shape[0], o_ref.shape[-1]))
    for hc in range(n_hc):  # static unroll; hidden chunk stays in VMEM
        w1c = w1_ref[:, hc * hc_size:(hc + 1) * hc_size]
        a = jax.lax.dot(x, w1c, preferred_element_type=jnp.float32)
        a = a + b1_ref[0, hc * hc_size:(hc + 1) * hc_size].astype(jnp.float32)[None, :]
        h = fwd(a).astype(x.dtype)
        w2c = w2_ref[hc * hc_size:(hc + 1) * hc_size, :]
        acc = acc + jax.lax.dot(h, w2c, preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def _bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, g_ref, dx_ref, *, act, n_hc, hc_size):
    x = x_ref[...]
    g = g_ref[...]
    _, gradf = _act_fns(act)
    acc = jnp.zeros((x.shape[0], x.shape[1]), jnp.float32)
    for hc in range(n_hc):
        w1c = w1_ref[:, hc * hc_size:(hc + 1) * hc_size]
        a = jax.lax.dot(x, w1c, preferred_element_type=jnp.float32)
        a = a + b1_ref[0, hc * hc_size:(hc + 1) * hc_size].astype(jnp.float32)[None, :]
        w2c = w2_ref[hc * hc_size:(hc + 1) * hc_size, :]
        dh = jax.lax.dot_general(g, w2c, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dpre = (dh * gradf(a)).astype(x.dtype)
        acc = acc + jax.lax.dot_general(dpre, w1c, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    dx_ref[...] = acc.astype(dx_ref.dtype)


def _tiles(m: int, hidden: int):
    # tm capped at 128: resident w1+w2 (~9.4 MB at ViT-B) plus per-tile
    # transients must stay under the 16 MB VMEM scoped limit in backward
    tm = 128
    while m % tm != 0:
        tm //= 2
        if tm < 8:
            return None, None
    n_hc = max(hidden // 1024, 1)
    while hidden % n_hc != 0:
        n_hc -= 1
    return tm, n_hc


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused(x, w1, b1, w2, b2, act):
    return _fused_fwd_impl(x, w1, b1, w2, b2, act)


def _fused_fwd_impl(x, w1, b1, w2, b2, act):
    m, d = x.shape
    hidden = w1.shape[1]
    tm, n_hc = _tiles(m, hidden)
    hc_size = hidden // n_hc
    return pl.pallas_call(
        functools.partial(_fwd_kernel, act=act, n_hc=n_hc, hc_size=hc_size),
        grid=(m // tm,),
        in_specs=[
            pl.BlockSpec((tm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(x, w1, _tile8(b1), w2, _tile8(b2))


def _ln_stats(x32, eps: float = 1e-5):
    """Row-local LayerNorm statistics (f32): returns (xhat, rstd)."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return (x32 - mean) * rstd, rstd


def _ln_rows(x32, gamma, beta, eps: float = 1e-5):
    """Row-local LayerNorm with affine: returns (y, xhat, rstd)."""
    xhat, rstd = _ln_stats(x32, eps)
    return xhat * gamma[None, :] + beta[None, :], xhat, rstd


def _tile8(b):
    # min-tile (8, 128): ship 1-D bias as an 8-row broadcast
    return jnp.broadcast_to(b[None, :], (8, b.shape[0]))


def _fused_fwd_rule(x, w1, b1, w2, b2, act):
    return _fused_fwd_impl(x, w1, b1, w2, b2, act), (x, w1, b1, w2, b2)


def _fused_bwd_rule(act, res, g):
    x, w1, b1, w2, b2 = res
    m, d = x.shape
    hidden = w1.shape[1]
    tm, n_hc = _tiles(m, hidden)
    hc_size = hidden // n_hc
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, act=act, n_hc=n_hc, hc_size=hc_size),
        grid=(m // tm,),
        in_specs=[
            pl.BlockSpec((tm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        interpret=jax.default_backend() == "cpu",
    )(x, w1, _tile8(b1), w2, g.astype(x.dtype))
    # frozen-weight contract: structural zeros (use mlp_impl='xla' to train them)
    return (dx, jnp.zeros_like(w1), jnp.zeros_like(b1),
            jnp.zeros_like(w2), jnp.zeros_like(b2))


_fused.defvjp(_fused_fwd_rule, _fused_bwd_rule)


def fused_mlp(x, w1, b1, w2, b2, *, act: str = "gelu"):
    """x [..., D] -> [..., D] through fc1/act/fc2 with frozen weights.

    Falls back to plain XLA ops when the row count doesn't tile cleanly.
    """
    shape = x.shape
    d = shape[-1]
    m = x.size // d
    xm = x.reshape(m, d)
    tm, n_hc = _tiles(m, w1.shape[1])
    if tm is None:
        fwd, _ = _act_fns(act)
        h = fwd((xm @ w1 + b1).astype(jnp.float32)).astype(x.dtype)
        return (h @ w2 + b2).reshape(shape)
    out = _fused(xm, w1.astype(x.dtype), b1.astype(jnp.float32),
                 w2.astype(x.dtype), b2.astype(jnp.float32), act)
    return out.reshape(shape)

"""Fully-fused MONA adapter block (forward + full-gradient backward).

One Pallas grid cell per image runs the ENTIRE adapter
(adapters/mona.py::mona_apply; reference /root/reference/src/adapters/mona.py
:75-487) with every intermediate in VMEM:

    z1 = LN(x)*gamma + x*gammax          (scaled-skip pre-norm)
    zd = z1 @ W_down + b_down            (768 -> 64)
    s  = spatial rows of zd; f = s * freq_filter (FFT identity, mona.py:284)
    wts = softmax(MLP(GAP(f)))           (noise-aware variants)
    y  = dwconv7[sum_t wts_t K_t](f) + sum_t wts_t b_t + s
    o  = y + pw(y)                       (1x1 conv residual)
    u  = dropout(gelu([cls | o | tail])) @ W_up + b_up
    out = x + u

Unfused, every full-width [N, 768] intermediate (z1, u, and their backward
twins) round-trips HBM per block — profiled ~0.74 ms/block/step, almost all
bandwidth. Fused, traffic is read-(x, mask) + write-out forward and
read-(x, mask, g) + write-dx backward.

Unlike the frozen-tower kernels, MONA parameters are the TRAINABLE set, so
the hand-written backward emits gradients for every parameter. Parameter
gradients accumulate across grid cells in Pallas outputs with constant index
maps: each accumulator block stays resident in VMEM for the whole grid,
zero-initialised at cell 0, written back to HBM once. Accumulation order is
the (deterministic) grid order.

The dropout mask is generated OUTSIDE with the exact jax.random stream the
unfused path uses (nn/layers.dropout), so fused and unfused training paths
produce identical values under the same key. GELU is the exact erf form via
the polynomial from ops/fused_mlp (Mosaic here lacks an erf lowering).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import _act_fns, _ln_stats, _tile8

K = 7
HALO = K // 2


def _should_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _forward_core(x32, sc, bi, ga, gx, dw, db, uw, ub, fr, tk, tb, pw, pb,
                  f1w, f1b, f2w, f2b, *, h, w, has_freq, has_noise, cdt):
    """Everything up to the pre-GELU activations, f32; returns intermediates.

    x32: [bc, n, d] — a CHUNK of images per grid cell; the projections run on
    the flattened [bc*n, d] rows so the MXU sees full-height matmuls instead
    of bc thin per-image ones (the per-image formulation measured ~2x slower
    forward)."""
    bc, n, d = x32.shape
    c = dw.shape[1]
    hw = h * w
    xf = x32.reshape(bc * n, d)

    xhat, rstd = _ln_stats(xf)
    scale = sc[0].astype(jnp.float32)
    gamma = ga[0].astype(jnp.float32)
    gammax = gx[0].astype(jnp.float32)
    # the wide [bc*n, D] chain runs in the compute dtype — this matches the
    # composed path (layernorm casts to x.dtype before the gamma/gammax
    # muls, nn/layers.py) and keeps the per-image VMEM footprint inside the
    # 16 MB ceiling (an all-f32 chain measured ~10.6 MB/image scoped)
    z0 = (xhat * scale[None, :] + bi[0].astype(jnp.float32)[None, :]).astype(cdt)
    z1 = z0 * gamma.astype(cdt)[None, :] + xf.astype(cdt) * gammax.astype(cdt)[None, :]
    zd = jax.lax.dot(z1, dw[...].astype(cdt),
                     preferred_element_type=jnp.float32)
    zd = (zd + db[0].astype(jnp.float32)[None, :]).reshape(bc, n, c)

    s = zd[:, 1:1 + hw].reshape(bc, h, w, c)
    freq = fr[0].astype(jnp.float32)
    f = s * freq[None, None, None, :] if has_freq else s

    taps = tk[...].astype(jnp.float32)           # [3, K, K, c]
    tapb = tb[...].astype(jnp.float32)           # [8, c]; rows 0..2 used
    if has_noise:
        pooled = jnp.mean(f, axis=(1, 2))                    # [bc, c]
        a1_pre = jax.lax.dot(pooled, f1w[...].astype(jnp.float32),
                             preferred_element_type=jnp.float32)
        a1_pre = a1_pre + f1b[0].astype(jnp.float32)[None, :]
        a1 = jnp.maximum(a1_pre, 0.0)
        logits = jax.lax.dot(a1, f2w[...].astype(jnp.float32),
                             preferred_element_type=jnp.float32)
        logits = logits + f2b[0, :3].astype(jnp.float32)[None, :]
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        wts = e / jnp.sum(e, axis=-1, keepdims=True)          # [bc, 3]
    else:
        pooled = a1_pre = a1 = None
        wts = jnp.full((bc, 3), 1.0 / 3.0, jnp.float32)
    # Mosaic constraints shape this mixing: wts[:, t] (non-leading integer
    # index) lowers to an unsupported gather, and [bc,1,1,1]x[1,K,K,c]
    # broadcasts in sublanes AND lanes at once ("Not implemented") — so
    # slice each weight column and pre-broadcast it across lanes first
    wtc = [jnp.broadcast_to(wts[:, t:t + 1], (bc, c)) for t in range(3)]
    kern = (wtc[0][:, None, None, :] * taps[0][None]
            + wtc[1][:, None, None, :] * taps[1][None]
            + wtc[2][:, None, None, :] * taps[2][None])       # [bc, K, K, c]
    biasw = (wtc[0] * tapb[0][None] + wtc[1] * tapb[1][None]
             + wtc[2] * tapb[2][None])                        # [bc, c]

    fp = jnp.pad(f, ((0, 0), (HALO, HALO), (HALO, HALO), (0, 0)))
    acc = s + biasw[:, None, None, :]
    for di in range(K):
        for dj in range(K):
            win = jax.lax.slice(fp, (0, di, dj, 0), (bc, di + h, dj + w, c))
            ktap = jax.lax.slice(kern, (0, di, dj, 0),
                                 (bc, di + 1, dj + 1, c))     # [bc, 1, 1, c]
            acc = acc + win * ktap
    y2 = acc.reshape(bc * hw, c)
    pwp = jax.lax.dot(y2.astype(cdt), pw[...].astype(cdt),
                      preferred_element_type=jnp.float32)
    out_sp = (y2 + pwp + pb[0].astype(jnp.float32)[None, :]).reshape(bc, hw, c)

    zcat = jnp.concatenate([zd[:, :1], out_sp, zd[:, 1 + hw:]], axis=1)
    return dict(xhat=xhat, rstd=rstd, scale=scale, z0=z0, gamma=gamma,
                gammax=gammax, z1=z1, zd=zd, s=s, f=f, fp=fp, freq=freq,
                pooled=pooled, a1_pre=a1_pre, a1=a1, wts=wts, taps=taps,
                tapb=tapb, kern=kern, y2=y2, zcat=zcat)


def _fwd_kernel(x_ref, m_ref, sc, bi, ga, gx, dw, db, uw, ub, fr, tk, tb,
                pw, pb, f1w, f1b, f2w, f2b, o_ref, *, h, w, has_freq,
                has_noise):
    bc, n, d = x_ref.shape
    c = dw.shape[1]
    x32 = x_ref[...].astype(jnp.float32)
    cdt = x_ref.dtype
    iv = _forward_core(x32, sc, bi, ga, gx, dw, db, uw, ub, fr, tk, tb, pw,
                       pb, f1w, f1b, f2w, f2b, h=h, w=w, has_freq=has_freq,
                       has_noise=has_noise, cdt=cdt)
    gelu_fwd, _ = _act_fns("gelu")
    gd = gelu_fwd(iv["zcat"]).reshape(bc * n, c) \
        * m_ref[...].astype(jnp.float32).reshape(bc * n, c)
    u = jax.lax.dot(gd.astype(cdt), uw[...].astype(cdt),
                    preferred_element_type=jnp.float32)
    # bias-add and residual in the compute dtype — exactly what the composed
    # path does (linear(dtype=x.dtype) then x + z), and it keeps the tail's
    # wide temps out of f32 (the fwd kernel sits ~0.6 MB from the VMEM cap)
    u = (u + ub[0].astype(jnp.float32)[None, :]).astype(cdt)
    o_ref[...] = (x_ref[...].reshape(bc * n, d).astype(cdt) + u).reshape(
        bc, n, d).astype(o_ref.dtype)


def _bwd_kernel(x_ref, m_ref, sc, bi, ga, gx, dw, db, uw, ub, fr, tk, tb,
                pw, pb, f1w, f1b, f2w, f2b, g_ref,
                dx_ref, dvd_ref, dwd_ref, dvc_ref, dwu_ref, dtk_ref, dpw_ref,
                df1w_ref, df2w_ref, dvs_ref, *, h, w, has_freq, has_noise):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dvd_ref, dwd_ref, dvc_ref, dwu_ref, dtk_ref, dpw_ref,
                  df1w_ref, df2w_ref, dvs_ref):
            r[...] = jnp.zeros(r.shape, r.dtype)

    bc, n, d = x_ref.shape
    c = dw.shape[1]
    hw = h * w
    x32 = x_ref[...].astype(jnp.float32)
    cdt = x_ref.dtype
    iv = _forward_core(x32, sc, bi, ga, gx, dw, db, uw, ub, fr, tk, tb, pw,
                       pb, f1w, f1b, f2w, f2b, h=h, w=w, has_freq=has_freq,
                       has_noise=has_noise, cdt=cdt)
    gelu_fwd, gelu_grad = _act_fns("gelu")
    gf = g_ref[...].astype(jnp.float32).reshape(bc * n, d)
    maskf = m_ref[...].astype(jnp.float32).reshape(bc * n, c)
    zcat_f = iv["zcat"].reshape(bc * n, c)

    # ---- up projection ----
    gd = gelu_fwd(zcat_f) * maskf
    dwu_ref[...] += jax.lax.dot_general(
        gd.astype(cdt), gf.astype(cdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                     # [c, D]
    dvd_ref[4, :] += jnp.sum(gf, axis=0)                        # d b_up
    dgd = jax.lax.dot_general(gf.astype(cdt), uw[...].astype(cdt),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dzcat = (dgd * maskf * gelu_grad(zcat_f)).reshape(bc, n, c)

    # ---- pw conv + residual ----
    d_out_sp = dzcat[:, 1:1 + hw].reshape(bc * hw, c)
    dpw_ref[...] += jax.lax.dot_general(
        iv["y2"].astype(cdt), d_out_sp.astype(cdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                     # [c, c]
    dvc_ref[1, :] += jnp.sum(d_out_sp, axis=0)                  # d b_pw
    dy2 = d_out_sp + jax.lax.dot_general(
        d_out_sp.astype(cdt), pw[...].astype(cdt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dy = dy2.reshape(bc, h, w, c)

    # ---- depthwise stencil backward ----
    wts, taps, tapb = iv["wts"], iv["taps"], iv["tapb"]
    dyp = jnp.pad(dy, ((0, 0), (HALO, HALO), (HALO, HALO), (0, 0)))
    df_conv = jnp.zeros((bc, h, w, c), jnp.float32)
    rows = [jnp.zeros((bc, c), jnp.float32) for _ in range(3)]  # d(wts) parts
    dk_img = [[None] * K for _ in range(K)]                     # [bc, c] each
    for di in range(K):
        for dj in range(K):
            gwin = jax.lax.slice(dyp, (0, K - 1 - di, K - 1 - dj, 0),
                                 (bc, K - 1 - di + h, K - 1 - dj + w, c))
            ktap = jax.lax.slice(iv["kern"], (0, di, dj, 0),
                                 (bc, di + 1, dj + 1, c))
            df_conv = df_conv + gwin * ktap
            fwin = jax.lax.slice(iv["fp"], (0, di, dj, 0),
                                 (bc, di + h, dj + w, c))
            dk_ij = jnp.sum(dy * fwin, axis=(1, 2))             # [bc, c]
            dk_img[di][dj] = dk_ij
            if has_noise:
                for t in range(3):
                    rows[t] = rows[t] + dk_ij * taps[t, di, dj][None, :]
    dbiasw = jnp.sum(dy, axis=(1, 2))                           # [bc, c]
    # accumulate tap-kernel grads: dK_t[ij] = sum_b wts[b,t] * dk_img[ij][b]
    for t in range(3):
        dtk_ref[t] += jnp.stack([
            jnp.stack([jnp.sum(wts[:, t:t + 1] * dk_img[di][dj], axis=0)
                       for dj in range(K)]) for di in range(K)])
        dvc_ref[2 + t, :] += jnp.sum(wts[:, t:t + 1] * dbiasw, axis=0)

    # ---- noise MLP backward ----
    df_pool = None
    if has_noise:
        dwts = jnp.concatenate([
            jnp.sum(rows[t] + dbiasw * tapb[t][None, :], axis=1,
                    keepdims=True) for t in range(3)], axis=1)   # [bc, 3]
        dlogits = wts * (dwts - jnp.sum(dwts * wts, axis=-1, keepdims=True))
        df2w_ref[...] += jax.lax.dot_general(
            iv["a1"], dlogits, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                 # [c4, 3]
        c4 = dvs_ref.shape[1]
        dvs_ref[1, :] += jnp.pad(jnp.sum(dlogits, axis=0), (0, c4 - 3))
        da1 = jax.lax.dot_general(dlogits, f2w[...].astype(jnp.float32),
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        da1 = da1 * (iv["a1_pre"] > 0.0)
        df1w_ref[...] += jax.lax.dot_general(
            iv["pooled"], da1, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                 # [c, c4]
        dvs_ref[0, :] += jnp.sum(da1, axis=0)                   # d fc1.b
        dpooled = jax.lax.dot_general(da1, f1w[...].astype(jnp.float32),
                                      (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        df_pool = jnp.broadcast_to(dpooled[:, None, None, :] / (h * w),
                                   (bc, h, w, c))

    # ---- freq + identity back to s ----
    df = df_conv if df_pool is None else df_conv + df_pool
    if has_freq:
        ds = dy + df * iv["freq"][None, None, None, :]
        dvc_ref[5, :] += jnp.sum(iv["s"] * df, axis=(0, 1, 2))  # d freq
    else:
        ds = dy + df

    # ---- reassemble d(zd), down projection ----
    dzd = jnp.concatenate([dzcat[:, :1], ds.reshape(bc, hw, c),
                           dzcat[:, 1 + hw:]], axis=1).reshape(bc * n, c)
    dwd_ref[...] += jax.lax.dot_general(
        iv["z1"].astype(cdt), dzd.astype(cdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                     # [D, c]
    dvc_ref[0, :] += jnp.sum(dzd, axis=0)                       # d b_down
    dz1 = jax.lax.dot_general(dzd.astype(cdt), dw[...].astype(cdt),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)

    # ---- scaled-skip + LN backward ----
    xf = x32.reshape(bc * n, d)
    dvd_ref[2, :] += jnp.sum(dz1 * iv["z0"], axis=0)            # d gamma
    dvd_ref[3, :] += jnp.sum(dz1 * xf, axis=0)                  # d gammax
    dz0 = dz1 * iv["gamma"][None, :]
    dvd_ref[0, :] += jnp.sum(dz0 * iv["xhat"], axis=0)          # d LN scale
    dvd_ref[1, :] += jnp.sum(dz0, axis=0)                       # d LN bias
    dxhat = dz0 * iv["scale"][None, :]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * iv["xhat"], axis=-1, keepdims=True)
    dx_ln = (dxhat - m1 - iv["xhat"] * m2) * iv["rstd"]
    dx_ref[...] = (gf + dx_ln + dz1 * iv["gammax"][None, :]).reshape(
        bc, n, d).astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------


def _const(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, _n=nd: (0,) * _n,
                        memory_space=pltpu.VMEM)


def _chunked(bc, shape):
    nd = len(shape)
    return pl.BlockSpec((bc,) + shape, lambda i, _n=nd: (i,) + (0,) * _n,
                        memory_space=pltpu.VMEM)


def _pick_bc(b, cap):
    for bc in range(cap, 0, -1):
        if b % bc == 0:
            return bc
    return 1


def _pack_params(p, has_noise):
    """MONA param tree -> 17 kernel arrays (+ their specs)."""
    d, c = p["down"]["w"].shape
    taps = jnp.stack([
        jnp.pad(p["conv3"]["w"], ((2, 2), (2, 2), (0, 0), (0, 0)))[:, :, 0, :],
        jnp.pad(p["conv5"]["w"], ((1, 1), (1, 1), (0, 0), (0, 0)))[:, :, 0, :],
        p["conv7"]["w"][:, :, 0, :]]).astype(jnp.float32)       # [3, K, K, c]
    tapb = jnp.zeros((8, c), jnp.float32)
    tapb = tapb.at[0].set(p["conv3"]["b"]).at[1].set(p["conv5"]["b"]) \
               .at[2].set(p["conv7"]["b"])
    freq = p.get("freq_filter", jnp.ones((c,), jnp.float32))
    if has_noise:
        c4 = p["noise_est"]["fc1"]["w"].shape[1]
        f1w = p["noise_est"]["fc1"]["w"].astype(jnp.float32)
        f1b = _tile8(p["noise_est"]["fc1"]["b"])
        f2w = p["noise_est"]["fc2"]["w"].astype(jnp.float32)
        f2b = _tile8(jnp.pad(p["noise_est"]["fc2"]["b"], (0, c4 - 3)))
    else:
        c4 = 16
        f1w = jnp.zeros((c, c4), jnp.float32)
        f1b = jnp.zeros((8, c4), jnp.float32)
        f2w = jnp.zeros((c4, 3), jnp.float32)
        f2b = jnp.zeros((8, c4), jnp.float32)
    return (_tile8(p["norm"]["scale"]), _tile8(p["norm"]["bias"]),
            _tile8(p["gamma"]), _tile8(p["gammax"]),
            p["down"]["w"].astype(jnp.float32), _tile8(p["down"]["b"]),
            p["up"]["w"].astype(jnp.float32), _tile8(p["up"]["b"]),
            _tile8(freq), taps, tapb,
            p["pw"]["w"][0, 0].astype(jnp.float32), _tile8(p["pw"]["b"]),
            f1w, f1b, f2w, f2b)


def _unpack_grads(p, has_freq, has_noise, dvd, dwd, dvc, dwu, dtk, dpw,
                  df1w, df2w, dvs):
    """Packed accumulators -> cotangent tree matching the MONA param tree."""
    out = {
        "norm": {"scale": dvd[0], "bias": dvd[1]},
        "gamma": dvd[2], "gammax": dvd[3],
        "down": {"w": dwd, "b": dvc[0]},
        "up": {"w": dwu, "b": dvd[4]},
        "pw": {"w": dpw[None, None], "b": dvc[1]},
        "conv3": {"w": dtk[0][2:5, 2:5][:, :, None, :], "b": dvc[2]},
        "conv5": {"w": dtk[1][1:6, 1:6][:, :, None, :], "b": dvc[3]},
        "conv7": {"w": dtk[2][:, :, None, :], "b": dvc[4]},
    }
    if has_freq:
        out["freq_filter"] = dvc[5]
    if has_noise:
        out["noise_est"] = {
            "fc1": {"w": df1w, "b": dvs[0]},
            "fc2": {"w": df2w, "b": dvs[1, :3]},
        }
    return jax.tree_util.tree_map(
        lambda ref, grad: grad.astype(ref.dtype), p, out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _mona_block(x, mask, p, static):
    out, _ = _mb_fwd(x, mask, p, static)
    return out


def _mb_fwd(x, mask, p, static):
    h, w, has_freq, has_noise = static
    b, n, d = x.shape
    args = _pack_params(p, has_noise)
    c = args[4].shape[1]
    specs = [_const(a.shape) for a in args]
    # two images per cell: the projections see 416-row matmuls; the scoped
    # stack is ~16.6 MB so the call raises the compiler scoped-vmem cap
    bc = _pick_bc(b, 2)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, h=h, w=w, has_freq=has_freq,
                          has_noise=has_noise),
        grid=(b // bc,),
        in_specs=[_chunked(bc, (n, d)), _chunked(bc, (n, c))] + specs,
        out_specs=_chunked(bc, (n, d)),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_should_interpret(),
    )(x, mask, *args)
    return out, (x, mask, p)


def _mb_bwd(static, res, g):
    h, w, has_freq, has_noise = static
    x, mask, p = res
    b, n, d = x.shape
    args = _pack_params(p, has_noise)
    c = args[4].shape[1]
    c4 = args[13].shape[1]
    specs = [_const(a.shape) for a in args]
    # backward recomputes the forward and holds its own twin temps — only
    # bc=1 fits the 16 MB VMEM ceiling
    bc = _pick_bc(b, 1)
    out_specs = (_chunked(bc, (n, d)), _const((8, d)), _const((d, c)),
                 _const((8, c)), _const((c, d)), _const((3, K, K, c)),
                 _const((c, c)), _const((c, c4)), _const((c4, 3)),
                 _const((8, c4)))
    out_shape = (jax.ShapeDtypeStruct((b, n, d), x.dtype),
                 jax.ShapeDtypeStruct((8, d), jnp.float32),
                 jax.ShapeDtypeStruct((d, c), jnp.float32),
                 jax.ShapeDtypeStruct((8, c), jnp.float32),
                 jax.ShapeDtypeStruct((c, d), jnp.float32),
                 jax.ShapeDtypeStruct((3, K, K, c), jnp.float32),
                 jax.ShapeDtypeStruct((c, c), jnp.float32),
                 jax.ShapeDtypeStruct((c, c4), jnp.float32),
                 jax.ShapeDtypeStruct((c4, 3), jnp.float32),
                 jax.ShapeDtypeStruct((8, c4), jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, h=h, w=w, has_freq=has_freq,
                          has_noise=has_noise),
        grid=(b // bc,),
        in_specs=[_chunked(bc, (n, d)), _chunked(bc, (n, c))] + specs +
                 [_chunked(bc, (n, d))],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_should_interpret(),
    )(x, mask, *args, g.astype(x.dtype))
    dx = outs[0]
    dp = _unpack_grads(p, has_freq, has_noise, *outs[1:])
    return dx, jnp.zeros_like(mask), dp


_mona_block.defvjp(_mb_fwd, _mb_bwd)


def mona_block_fused(p, x, hw, *, variant: str, mask=None):
    """Fused MONA adapter: x [B, N, D] -> x + adapter(x), full param grads.

    mask: pre-scaled dropout mask [B, N, c] (values 0 or 1/(1-rate)); pass
    None for eval — a ones mask is substituted. Returns None when ineligible
    (the caller falls back to the composed path in adapters/mona.py).
    """
    b, n, d = x.shape
    h, w = hw
    c = p["down"]["w"].shape[1]
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    if n < h * w + 1 or d % 128 or n % sub:
        return None
    # gate on the VARIANT (variant-name sets mirror adapters.mona._HAS_FREQ/
    # _HAS_NOISE — the caller, mona_apply, is the source of truth and passes
    # consistent (params, variant) pairs). Any params/variant mismatch —
    # missing slots the variant needs OR extra slots it doesn't — falls back
    # to the composed path: the backward's cotangent tree must match p
    # exactly, so extra slots would crash _unpack_grads.
    has_freq = variant in ("freq_enhanced", "hybrid")
    has_noise = variant in ("noise_aware", "hybrid")
    if ("freq_filter" in p) != has_freq or ("noise_est" in p) != has_noise:
        return None
    if mask is None:
        mask = jnp.ones((b, n, c), jnp.float32)
    return _mona_block(x, mask, p, (h, w, has_freq, has_noise))

"""Fused LN+MLP+residual kernel vs the unfused reference chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nextgen_uia_tpu.nn.layers import layernorm, layernorm_init, linear_init
from nextgen_uia_tpu.ops.fused_ln_mlp import fused_ln_mlp_residual


def _setup(d=128, hidden=256):
    ks = jax.random.split(jax.random.key(0), 4)
    ln = layernorm_init(d)
    ln["scale"] = ln["scale"] + jax.random.normal(ks[0], (d,)) * 0.1
    ln["bias"] = ln["bias"] + jax.random.normal(ks[1], (d,)) * 0.1
    mlp = {"fc1": linear_init(ks[2], d, hidden), "fc2": linear_init(ks[3], hidden, d)}
    return ln, mlp


def ref_chain(x, ln, mlp, act, eps):
    z = layernorm(ln, x, eps=eps)
    h = z @ mlp["fc1"]["w"] + mlp["fc1"]["b"]
    if act == "gelu":
        h = jax.nn.gelu(h, approximate=False)
    else:
        h = h * jax.nn.sigmoid(1.702 * h)
    return x + (h @ mlp["fc2"]["w"] + mlp["fc2"]["b"])


@pytest.mark.parametrize("act", ["gelu", "quick_gelu"])
def test_fused_forward(act):
    ln, mlp = _setup()
    x = jax.random.normal(jax.random.key(5), (64, 128)) * 0.7
    out = fused_ln_mlp_residual(x, ln, mlp, act=act, eps=1e-5)
    ref = ref_chain(x, ln, mlp, act, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_backward_dx():
    ln, mlp = _setup()
    x = jax.random.normal(jax.random.key(6), (64, 128)) * 0.7
    g_f = jax.grad(lambda x: jnp.sum(fused_ln_mlp_residual(x, ln, mlp) ** 2))(x)
    g_r = jax.grad(lambda x: jnp.sum(ref_chain(x, ln, mlp, "gelu", 1e-5) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r), atol=1e-3, rtol=1e-3)


def test_ineligible_rows_return_none():
    ln, mlp = _setup()
    x = jnp.ones((7, 128))
    assert fused_ln_mlp_residual(x, ln, mlp) is None

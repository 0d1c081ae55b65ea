"""GELU numerics (ops/gelu.py): the fast erf-grade approximations ('ans',
'cheb') vs the exact-erf parity baseline.

The reference activation is torch ``nn.GELU()`` — exact erf (timm Mlp
default, src/models/cav_mae_base.py block MLPs). The claim validated here is
EXHAUSTIVE, not sampled: over every finite bf16 value, the fast paths are
bit-identical to ``jax.nn.gelu(approximate=False)`` on >= 99.5% of inputs,
and every disagreement is a single bf16 ulp confined to the deep negative
tail (|gelu| <= 0.08, |delta| <= 1 ulp) — i.e. parity at bf16 resolution.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsiam_tpu.ops.gelu import (gelu, gelu_f32, gelu_grad_f32)


def _bf16_grid():
    bits = np.arange(65536, dtype=np.uint16)
    f32 = (bits.astype(np.uint32) << 16).view(np.float32)
    return jnp.asarray(f32[np.isfinite(f32)]).astype(jnp.bfloat16)


@pytest.mark.parametrize("impl,slack", [("ans", 5e-6), ("cheb", 5e-6),
                                        ("tanh5", 5e-5)])
def test_bf16_grid_bit_parity(impl, slack):
    """Every finite bf16 input: >=99.5% bit-identical to the exact-erf path;
    all disagreements within ~1 bf16 ulp (0.8-1% relative) plus a small
    absolute slack confined to tail values (|gelu| <= 0.1)."""
    x = _bf16_grid()
    base = np.asarray(jax.jit(lambda v: gelu(v, "erf"))(x))
    out = np.asarray(jax.jit(lambda v: gelu(v, impl))(x))
    bb = base.view(np.uint16)
    ob = out.view(np.uint16)
    basef = base.astype(np.float32)
    outf = out.astype(np.float32)
    mism = (bb != ob) & ~((basef == 0) & (outf == 0))  # -0 vs +0 is equal
    assert 1.0 - mism.mean() >= 0.995, mism.mean()
    if mism.any():
        d = np.abs(basef[mism] - outf[mism])
        # one bf16 ulp is 2^-8..2^-9 relative; tail values are tiny absolutes
        assert np.all(d <= 0.01 * np.abs(basef[mism]) + slack), d.max()
        assert np.abs(basef[mism]).max() <= 0.1


@pytest.mark.parametrize("impl,eps", [("ans", 1.5e-6), ("cheb", 1.5e-6),
                                      ("tanh5", 4e-6)])
def test_f32_accuracy_vs_float64(impl, eps):
    """f32 evaluation within eps * max(1, |x|) of the float64 ground truth
    (CDF error ~1.5e-7 for ans/cheb, ~3e-6 for the tanh-composite)."""
    xs = np.linspace(-9.0, 9.0, 200001)
    truth = np.array([0.5 * v * math.erfc(-v / math.sqrt(2.0)) for v in xs])
    got = np.asarray(jax.jit(lambda v: gelu(v, impl))(jnp.asarray(xs, jnp.float32)),
                     np.float64)
    tol = eps * np.maximum(1.0, np.abs(xs))
    assert np.all(np.abs(got - truth) <= tol), np.max(np.abs(got - truth) / tol)


@pytest.mark.parametrize("impl", ["ans", "cheb", "tanh", "tanh5"])
def test_grad_formula_matches_autodiff(impl):
    """gelu_grad_f32 (used explicitly by the Pallas MLP kernel) must track
    the gradient of the function it claims to differentiate: for 'tanh' that
    is the tanh-gelu itself; for the erf-grade impls it is the EXACT gelu
    gradient Phi + x*pdf (gelu_grad_f32 uses the analytic form, which is
    tighter than autodiff-through-the-approximation — the Chebyshev
    polynomial's derivative carries ~deg^2 * eps ~ 5e-5 error)."""
    x = jnp.asarray(np.linspace(-6.0, 6.0, 4001), jnp.float32)
    ref_impl = impl if impl in ("tanh", "tanh5") else "erf"
    auto = jax.vmap(jax.grad(lambda v: gelu_f32(v, ref_impl)))(x)
    manual = gelu_grad_f32(x, impl)
    np.testing.assert_allclose(np.asarray(manual), np.asarray(auto),
                               atol=2e-6, rtol=1e-5)


def test_grad_close_to_exact():
    """Autodiff through the fast paths tracks the exact-erf gradient."""
    x = jnp.asarray(np.linspace(-5.0, 5.0, 2001), jnp.float32)
    g_ref = jax.vmap(jax.grad(lambda v: gelu(v, "erf")))(x)
    for impl, atol in (("ans", 5e-6), ("cheb", 5e-6), ("tanh5", 2e-5)):
        g = jax.vmap(jax.grad(lambda v: gelu(v, impl)))(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   atol=atol, rtol=1e-4, err_msg=impl)

"""GELU implementations: exact erf, tanh approximation, and two fast
erf-grade approximations that are bit-equivalent to exact erf at bf16.

The reference MLP activation is torch ``nn.GELU()`` — exact erf
(src/models/cav_mae_base.py block MLPs, timm Mlp default). On TPU the XLA
``erf`` lowering is a rational approximation whose division dominates VPU
cost (measured ~18% of the whole pretrain step vs tanh GELU, BENCH_NOTES.md).
Both fast paths below carry max absolute error ~1.5e-7 in the CDF — two
orders of magnitude below bf16 resolution (2^-9 relative) — so their bf16
outputs are bit-identical to the exact-erf path except for a sub-ulp fringe
(exhaustively verified over the full bf16 grid in tests/test_gelu.py):

* ``ans``  — Abramowitz & Stegun 7.1.26 erf (5-term polynomial in a
  transformed variable, one exp, one reciprocal); max |erf err| 1.5e-7.
* ``cheb`` — degree-15 Chebyshev expansion of the Gaussian CDF
  Phi(x) = 0.5 + x * r(x^2), Clenshaw-evaluated (numerically stable in f32,
  unlike a power-basis polynomial which loses 3 digits to cancellation);
  pure multiply-add — NO division or transcendental; max |Phi err| 1.6e-7.
* ``tanh5`` — erf(z) ~= tanh(z * q(z^2)), 5-term q: max |erf err| 3.0e-6,
  one tanh + 4 FMA; 99.63% bit-identical to 'erf' over the bf16 grid.
  MEASURED no faster than 'erf' on v5e despite the smaller formula: the
  bf16->f32 converts and the f32 tanh dominate, and the exact path pays the
  same converts inside XLA's erfc expansion. Only the bf16-NATIVE tanh-GELU
  ('tanh') escapes that cost — and evaluating tanh5 in bf16 would degrade
  it to tanh-class accuracy. Parity GELU is convert-bound on this VPU.

Everything here is jnp-only (no lax.erf except impl='erf'), so 'ans', 'cheb'
and 'tanh' also lower inside Pallas TPU kernels (the erf HLO has no Mosaic
lowering) — ops/mlp.py consumes gelu_f32/gelu_grad_f32 directly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

GELU_IMPLS = ("erf", "tanh", "ans", "cheb", "tanh5")

_SQRT_2 = math.sqrt(2.0)
_INV_SQRT_2 = 1.0 / math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)
_TANH_C = math.sqrt(2.0 / math.pi)

# ---------------------------------------------------------------------------
# Abramowitz & Stegun 7.1.26 erf: max abs error 1.5e-7.
# ---------------------------------------------------------------------------


def erf_ans(x):
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    return s * (1.0 - poly * jnp.exp(-a * a))


def erfc_ans(w):
    """A&S 7.1.26 in its native erfc form: erfc(a) = poly(t) * exp(-a^2).
    Unlike 1 - erf, this keeps RELATIVE accuracy in the positive tail
    (below bf16 half-ulp through a ~ 3.5, where erfc ~ 7e-7), which is what
    makes bf16 bit-parity with lax.erfc possible (jax.nn.gelu's exact path
    is erfc-based precisely to preserve that tail)."""
    a = jnp.abs(w)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    ec = poly * jnp.exp(-a * a)
    return jnp.where(w >= 0, ec, 2.0 - ec)


# ---------------------------------------------------------------------------
# Chebyshev Gaussian CDF: Phi(x) = 0.5 + x * r(x^2), r expanded in T_k over
# x^2 in [0, XB^2], XB = 5.5241 (Phi(-XB) = 1.7e-8, below the approximation
# error, so clamping is free). Fit in float64 on 4e5 nodes; Clenshaw
# recurrence keeps f32 evaluation error at the fit error (1.6e-7).
# ---------------------------------------------------------------------------

_PHI_XB = 5.5241
_PHI_HI = _PHI_XB * _PHI_XB  # Chebyshev domain [0, HI] for u = x^2
_PHI_COEF = (
    1.7453262166e-01,
    -1.2245549191e-01,
    5.6471478729e-02,
    -2.6176051971e-02,
    1.1596678412e-02,
    -4.8265382104e-03,
    1.8749111940e-03,
    -6.7851131750e-04,
    2.2884733538e-04,
    -7.2054287449e-05,
    2.1223857706e-05,
    -5.8650471743e-06,
    1.5224583179e-06,
    -3.7438715481e-07,
    8.4960083070e-08,
    -2.0862519096e-08,
)


def _phi_r(u):
    """Clenshaw evaluation of r(u^2) with Phi(u) = 0.5 + u * r(u^2)."""
    s = u * u
    t = s * (2.0 / _PHI_HI) - 1.0
    t2 = 2.0 * t
    b1 = jnp.zeros_like(t)
    b2 = jnp.zeros_like(t)
    for c in _PHI_COEF[:0:-1]:
        b1, b2 = t2 * b1 - b2 + c, b1
    return t * b1 - b2 + _PHI_COEF[0]


def phi_cheb(x):
    """Gaussian CDF Phi(x) for f32 input via the Clenshaw recurrence."""
    u = jnp.clip(x, -_PHI_XB, _PHI_XB)
    return 0.5 + u * _phi_r(u)


def erfc_cheb(w):
    """erfc(w) = 2 * Phi(-sqrt(2) w) via the Chebyshev CDF; computed as
    1 - 2u*r (no 0.5+x cancellation). Positive-tail relative accuracy decays
    past w ~ 2.7 (erfc < 1e-4) where the 1 - (...) subtraction cancels —
    gelu outputs there are < 1e-4 in magnitude; max abs error stays 3e-7.
    Beyond the fit domain (w > 3.9, erfc < 3.3e-8) the value is flushed to 0
    rather than saturated, so gelu decays like the exact path instead of
    growing linearly in x."""
    z = -1.4142135623730951 * w
    u = jnp.clip(z, -_PHI_XB, _PHI_XB)
    ec = 1.0 + 2.0 * (u * _phi_r(u))
    return jnp.where(z < -_PHI_XB, 0.0, ec)


# ---------------------------------------------------------------------------
# GELU forward/grad on f32 (shared by the XLA path and the Pallas MLP kernel)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# tanh-composite erf: erf(z) ~= tanh(z * q(z^2)) with a 5-term q fitted by
# Lawson-reweighted least squares on [0, 4] (max |erf err| 3.0e-6, f32).
# The tanh composition makes the tail DECAY like the true erfc (unlike a
# bare polynomial) and q is monotone-increasing on the range. 99.63%
# bit-identical to 'erf' over the full bf16 grid (244 mismatches, all
# |gelu| <= 0.073, max delta 4.9e-4). Speed on v5e equals 'erf', NOT 'tanh'
# (see module docstring) — kept as the most accurate Pallas-lowerable erf
# and as the measured answer to "can a cheaper formula beat XLA's erfc".
# ---------------------------------------------------------------------------

_T5_ZC = 4.0  # clamp: erf(4) = 1 - 1.5e-8; p(4) = 12.24 (tanh saturated)
_T5_COEF = (
    1.1283580408023280e+00,
    1.0293362111282685e-01,
    -4.9766147444393120e-04,
    -4.1481581200152707e-04,
    3.2207836663742104e-05,
)


def erf_tanh5(z):
    """erf via the tanh-composite fit (f32 math)."""
    zc = jnp.clip(z, -_T5_ZC, _T5_ZC)
    u = zc * zc
    q = _T5_COEF[4]
    for c in _T5_COEF[3::-1]:
        q = q * u + c
    return jnp.tanh(zc * q)


def erfc_tanh5(w):
    """erfc(w) = 1 + erf(-w); the tanh value saturates to -1 in f32 past the
    clamp, so the deep tail floors at ~3.6e-11 instead of decaying (absolute
    error <= 1.5e-8 there)."""
    return 1.0 + erf_tanh5(-w)


def gelu_f32(x, impl: str):
    """GELU of an f32 array. impl='erf' is the XLA exact lowering (NOT
    Pallas-lowerable); 'ans'/'cheb'/'tanh' are primitive-only."""
    if impl == "erf":
        return 0.5 * x * (1.0 + jax.lax.erf(x * _INV_SQRT_2))
    if impl == "tanh":
        inner = _TANH_C * (x + 0.044715 * x * x * x)
        return 0.5 * x * (1.0 + jnp.tanh(inner))
    if impl == "ans":
        return 0.5 * x * (1.0 + erf_ans(x * _INV_SQRT_2))
    if impl == "cheb":
        return x * phi_cheb(x)
    if impl == "tanh5":
        return 0.5 * x * (1.0 + erf_tanh5(x * _INV_SQRT_2))
    raise ValueError(f"unknown gelu impl: {impl}")


def gelu_grad_f32(x, impl: str):
    """d gelu / dx = Phi(x) + x * pdf(x) (explicit form for Pallas kernels)."""
    if impl == "tanh":
        inner = _TANH_C * (x + 0.044715 * x * x * x)
        t = jnp.tanh(inner)
        dinner = _TANH_C * (1.0 + 3 * 0.044715 * x * x)
        return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * dinner
    if impl == "tanh5":
        # derivative of the approximation itself (keeps the fused-MLP
        # kernel's VJP consistent with autodiff of its forward, and avoids
        # reintroducing exp): with t = tanh(p(z)), p = z*q(z^2), z = x/sqrt2:
        #   gelu' = 0.5*(1+t) + 0.5 x (1 - t^2) p'(z) / sqrt(2)
        #   p'(z) = q(u) + 2u q'(u),  u = z^2
        z = jnp.clip(x * _INV_SQRT_2, -_T5_ZC, _T5_ZC)
        u = z * z
        q = _T5_COEF[4]
        for c in _T5_COEF[3::-1]:
            q = q * u + c
        qp = 4.0 * _T5_COEF[4]
        for k in (3, 2, 1):
            qp = qp * u + k * _T5_COEF[k]
        t = jnp.tanh(z * q)
        pprime = q + 2.0 * u * qp
        return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * pprime * _INV_SQRT_2
    if impl == "cheb":
        cdf = phi_cheb(x)
    elif impl == "ans":
        cdf = 0.5 * (1.0 + erf_ans(x * _INV_SQRT_2))
    elif impl == "erf":
        cdf = 0.5 * (1.0 + jax.lax.erf(x * _INV_SQRT_2))
    else:
        raise ValueError(f"unknown gelu impl: {impl}")
    pdf = jnp.exp(-0.5 * x * x) * _INV_SQRT_2PI
    return cdf + x * pdf


def gelu_act_grad_f32(x, impl: str):
    """(gelu(x), gelu'(x)) with shared subexpressions — for backward kernels
    that need both (dw2 wants the activation, the GELU VJP wants the
    derivative). For 'ans' the A&S erf's exp(-z^2) with z = x/sqrt(2) IS the
    Gaussian pdf's exp(-x^2/2): one exp + one reciprocal + one polynomial
    serve both outputs (vs 3 exps + 2 reciprocals for separate
    gelu_f32 + gelu_grad_f32 calls). For 'cheb' the Clenshaw CDF is shared;
    'tanh' shares the inner tanh. Values match the separate calls to f32
    reassociation (sub-bf16-ulp)."""
    if impl == "ans":
        z = x * _INV_SQRT_2
        a = jnp.abs(z)
        t = 1.0 / (1.0 + 0.3275911 * a)
        poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
                 - 0.284496736) * t + 0.254829592) * t
        eexp = jnp.exp(-a * a)  # == exp(-x^2/2): shared with the pdf
        erf = jnp.sign(z) * (1.0 - poly * eexp)
        cdf = 0.5 * (1.0 + erf)
        pdf = eexp * _INV_SQRT_2PI
        return x * cdf, cdf + x * pdf
    if impl == "cheb":
        cdf = phi_cheb(x)
        pdf = jnp.exp(-0.5 * x * x) * _INV_SQRT_2PI
        return x * cdf, cdf + x * pdf
    if impl == "tanh":
        inner = _TANH_C * (x + 0.044715 * x * x * x)
        t = jnp.tanh(inner)
        dinner = _TANH_C * (1.0 + 3 * 0.044715 * x * x)
        return (0.5 * x * (1.0 + t),
                0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * dinner)
    return gelu_f32(x, impl), gelu_grad_f32(x, impl)


def gelu(x: jnp.ndarray, impl: str = "erf") -> jnp.ndarray:
    """GELU with selectable numerics.

    'erf' defers to jax.nn.gelu's exact path (the parity baseline:
    ``0.5 * x * erfc(-x * sqrt(1/2))`` with dtype-native arithmetic). 'ans'
    and 'cheb' mirror that operation order EXACTLY — same dtype-native
    multiply steps, erfc evaluated in f32 like XLA's own expansion — with
    only the erfc kernel swapped for the approximation, so under bf16 their
    outputs are bit-identical to 'erf' except where the approximation's
    1.5e-7 absolute error spans a bf16 rounding boundary (exhaustively
    quantified over the full bf16 grid in tests/test_gelu.py)."""
    if impl == "erf":
        return jax.nn.gelu(x, approximate=False)
    if impl == "tanh":
        return jax.nn.gelu(x, approximate=True)
    if impl not in ("ans", "cheb", "tanh5"):
        raise ValueError(f"unknown gelu impl: {impl}")
    sqrt_half = jnp.asarray(0.7071067811865476, x.dtype)
    w = (-x * sqrt_half).astype(jnp.float32)
    if impl == "ans":
        ec = erfc_ans(w)
    elif impl == "cheb":
        ec = erfc_cheb(w)
    else:
        ec = erfc_tanh5(w)
    return (0.5 * x * ec.astype(x.dtype)).astype(x.dtype)

"""LayerNorm with float32 statistics: XLA forward, fused Pallas backward.

The reference's blocks use torch nn.LayerNorm (f32 master weights under
autocast — statistics in f32); the forward here mirrors flax nn.LayerNorm's
exact formula (mean-of-squares variance with a zero clamp) so existing
goldens and checkpoints are unchanged.

Why a custom backward: profiling the pretrain step (BENCH_NOTES.md round 3)
shows XLA lowers each LayerNorm backward as SEPARATE fusions — a dx fusion
and a dgamma/dbeta multiply-reduce fusion — each re-reading the [rows, C]
activations from HBM (~0.6 ms per decoder LN site). The step is
bandwidth-bound, so the extra reads are pure waste. The Pallas backward
reads x and dy ONCE per tile, recomputes the row statistics in registers
(cheaper than a second HBM pass), and produces dx plus dgamma/dbeta partial
sums accumulated across the sequential grid.

Numerics: all statistics and the VJP run in f32 exactly like the XLA
autodiff of the forward; gradient equivalence is tested (interpret mode on
CPU, tests/test_layernorm.py). Dispatch: the Pallas backward engages on TPU
for C % 128 == 0 (every AVSiam LN); anywhere else the analytic jnp backward
runs (same math, XLA-fused).

MEASURED-NEGATIVE on v5e at B=64: 167.3 clips/s / 382.7 ms with the Pallas
backward vs 181.4 / 352.8 with XLA's — the same ~30 ms penalty the
attention stat-saving experiment paid (ops/attention.py). Two independent
kernels with locally-sound traffic math losing by the same margin points at
a global effect: every extra custom-call fragments XLA's overlap of async
parameter/activation copies with compute, and ~60 extra calls/step serialize
more DMA time than the saved HBM reads are worth. Round-3 rule of thumb on
this toolchain: REPLACE ops or change shapes inside existing kernels; don't
add new kernel boundaries to an already-tuned graph. Kept as an A/B knob
(AVSIAM_LN=pallas), default XLA.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_LANE = 128
_ROW_TILE = 512
LN_IMPL = os.environ.get("AVSIAM_LN", "xla")


def _stats_f32(xf, eps):
    """flax nn.LayerNorm's statistics: mean-of-squares variance, clamped."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    mu2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    return mu, jax.lax.rsqrt(var + eps)


def _ln_fwd_math(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu, rstd = _stats_f32(xf, eps)
    # flax nn.LayerNorm's operation order exactly: (x - mu) * (rstd * scale)
    # (scale folded into the multiplier first) — keeps f32 bit-parity
    mul = rstd * scale.astype(jnp.float32)
    y = (xf - mu) * mul + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _ln_bwd_math(x, scale, dy, eps):
    """Analytic LN VJP in f32 (matches autodiff of _ln_fwd_math)."""
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    mu, rstd = _stats_f32(xf, eps)
    xhat = (xf - mu) * rstd
    dbeta = jnp.sum(dyf, axis=tuple(range(dyf.ndim - 1)))
    dgamma = jnp.sum(dyf * xhat, axis=tuple(range(dyf.ndim - 1)))
    dxhat = dyf * scale.astype(jnp.float32)
    c1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    c2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - c1 - xhat * c2)
    return dx.astype(x.dtype), dgamma, dbeta


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ln_bwd_kernel(x_ref, dy_ref, scale_ref, dx_ref, dg_ref, db_ref, *,
                   eps: float, rows: int, row_tile: int):
    i = pl.program_id(0)
    xf = x_ref[...].astype(jnp.float32)
    dyf = dy_ref[...].astype(jnp.float32)
    # mask rows past the ragged end: their VMEM contents are undefined and
    # must not leak into the dgamma/dbeta accumulators (select blocks NaN)
    rem = rows - i * row_tile
    if rows % row_tile != 0:
        rowid = jax.lax.broadcasted_iota(jnp.int32, xf.shape, 0)
        valid = rowid < rem
        xf = jnp.where(valid, xf, 0.0)
        dyf = jnp.where(valid, dyf, 0.0)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    mu2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd
    sc = scale_ref[...].astype(jnp.float32)  # [1, C]
    dxhat = dyf * sc
    c1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    c2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (rstd * (dxhat - c1 - xhat * c2)).astype(dx_ref.dtype)
    dg = jnp.sum(dyf * xhat, axis=0, keepdims=True)  # [1, C]
    db = jnp.sum(dyf, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        dg_ref[...] = dg
        db_ref[...] = db

    @pl.when(i > 0)
    def _acc():
        dg_ref[...] += dg
        db_ref[...] += db


def _ln_bwd_pallas(x2, dy2, scale, eps):
    R, C = x2.shape
    # round the row tile to the dtype's sublane (16 for bf16, 8 for f32):
    # a tile that exceeds R without matching the tiling multiple is an
    # invalid block spec under Mosaic
    sub = 16 if x2.dtype == jnp.bfloat16 else 8
    tile = min(_ROW_TILE, ((R + sub - 1) // sub) * sub)
    grid = (pl.cdiv(R, tile),)
    kernel = functools.partial(_ln_bwd_kernel, eps=eps, rows=R,
                               row_tile=tile)
    dx, dg, db = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, C), x2.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        interpret=_interpret(),
    )(x2, dy2, scale.astype(jnp.float32)[None, :])
    return dx, dg[0], db[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm_fp32(x, scale, bias, eps):
    """LayerNorm over the last axis, f32 statistics, output in x.dtype.
    Forward is plain jnp (XLA fuses it with neighbors); backward dispatches
    to the fused Pallas kernel on TPU."""
    return _ln_fwd_math(x, scale, bias, eps)


def _ln_fwd_rule(x, scale, bias, eps):
    return _ln_fwd_math(x, scale, bias, eps), (x, scale)


def _ln_bwd_rule(eps, res, dy):
    x, scale = res
    C = x.shape[-1]
    use_pallas = (LN_IMPL == "pallas" and _HAS_PLTPU
                  and C % _LANE == 0
                  and jax.default_backend() == "tpu")
    if not use_pallas:
        dx, dg, db = _ln_bwd_math(x, scale, dy, eps)
    else:
        x2 = x.reshape(-1, C)
        dy2 = dy.reshape(-1, C)
        dx, dg, db = _ln_bwd_pallas(x2, dy2, scale, eps)
        dx = dx.reshape(x.shape)
    return dx, dg.astype(scale.dtype), db.astype(scale.dtype)


layer_norm_fp32.defvjp(_ln_fwd_rule, _ln_bwd_rule)

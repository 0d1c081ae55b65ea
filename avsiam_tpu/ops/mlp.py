"""Fused transformer MLP (fc1 -> GELU -> fc2) as a Pallas TPU kernel.

The reference's MLP is two torch Linears with an exact-erf GELU between
(src/models/cav_mae_base.py block MLPs, timm Mlp). Under XLA the [T, 4D]
hidden activation round-trips HBM between the two GEMMs in both the forward
and backward passes; this kernel keeps it in VMEM.

Design:
* forward — grid over row blocks of the token-packed [T, D] input; both
  weight matrices stay VMEM-resident across grid steps (constant index_map);
  fc1 accumulates f32, GELU computed in f32, fc2 accumulates f32.
* backward — custom VJP, ONE kernel (grid over row blocks): recompute
  h_pre = x@w1+b1 and act = gelu(h_pre) in VMEM, gh = gelu'(h_pre) *
  (dout @ w2ᵀ), write dx = gh @ w1ᵀ, and accumulate dw1 += xᵀ@gh,
  dw2 += actᵀ@dout, db1/db2 (column sums) into VMEM-resident f32 outputs
  (constant index maps; TPU grids run sequentially, so revisiting the same
  output block accumulates correctly). Nothing hidden-sized ever touches
  HBM in either direction. The round-2 three-kernel form (dx kernel
  stashing gh/act to HBM + two weight-grad kernels re-reading them —
  measured-negative: the [T,H] stash round-trips cost more than the dw
  consolidation saved) is kept behind AVSIAM_MLP_BWD=split.
* rows are padded to the block size with zeros; zero rows contribute zero to
  every gradient, so no masking is needed.

Numerics: GELU is evaluated in f32 (ops/gelu.py numerics; the 'erf' request
maps to the A&S approximation because the erf HLO has no Pallas TPU lowering
— max error 1.5e-7, below bf16 resolution), matching LayerNormFP32's policy
of f32 nonlinear math under bf16 GEMM compute.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from avsiam_tpu.ops.gelu import gelu_act_grad_f32, gelu_f32, gelu_grad_f32


def _kernel_impl(gelu: str) -> str:
    """Map the requested numerics to a Pallas-lowerable impl: 'erf' has no
    Mosaic lowering, so it runs as 'ans' (bf16-bit-equivalent)."""
    return "ans" if gelu == "erf" else gelu


def _gelu_f32(x, impl: str):
    return gelu_f32(x, _kernel_impl(impl))


def _gelu_grad_f32(x, impl: str):
    return gelu_grad_f32(x, _kernel_impl(impl))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _params():
    """Raise the Mosaic scoped-VMEM cap (default 16 MB) so the resident
    weight pair + f32 hidden blocks fit with double buffering; same practice
    as jax's TPU flash-attention kernels."""
    if pltpu is None:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, *out_refs, gelu,
                save_hpre: bool):
    # out_refs: (o,) or (o, hpre) — save_hpre emits the pre-GELU hidden as a
    # residual for an XLA backward ('fres' impl)
    hpre = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    hpre = hpre + b1_ref[:].astype(jnp.float32)
    if save_hpre:
        out_refs[1][:] = hpre.astype(out_refs[1].dtype)
    h = _gelu_f32(hpre, gelu).astype(x_ref.dtype)
    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    out_refs[0][:] = (y + b2_ref[:].astype(jnp.float32)).astype(
        out_refs[0].dtype)


def _bwd_dx_kernel(x_ref, w1_ref, b1_ref, w2_ref, do_ref,
                   dx_ref, gh_ref, act_ref, *, gelu):
    hpre = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    hpre = hpre + b1_ref[:].astype(jnp.float32)
    act_ref[:] = _gelu_f32(hpre, gelu).astype(act_ref.dtype)
    dh = jax.lax.dot_general(  # dout @ w2^T: contract the D axis
        do_ref[:], w2_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    gh = dh * _gelu_grad_f32(hpre, gelu)
    gh_ref[:] = gh.astype(gh_ref.dtype)
    dx = jax.lax.dot_general(  # gh @ w1^T: contract the H axis
        gh.astype(x_ref.dtype), w1_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _dw_kernel(a_ref, g_ref, dw_ref, db_ref):
    # grid (m_tiles, n_tiles, row_blocks), rows fastest: the (jm, jn) output
    # tile stays VMEM-resident while the row dimension accumulates. Tiling
    # both weight dims keeps tile + dot-result temp well under VMEM.
    jm = pl.program_id(0)
    i = pl.program_id(2)
    part = jax.lax.dot_general(  # a^T @ g over the row-block axis
        a_ref[:], g_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = part

    @pl.when(i > 0)
    def _():
        dw_ref[:] += part

    # db is independent of the m tiling — accumulate it on the jm == 0 wall
    bpart = jnp.sum(g_ref[:].astype(jnp.float32), axis=0, keepdims=True)

    @pl.when((jm == 0) & (i == 0))
    def _():
        db_ref[:] = bpart

    @pl.when((jm == 0) & (i > 0))
    def _():
        db_ref[:] += bpart


def _bwd_fused_kernel(x_ref, w1_ref, b1_ref, w2_ref, do_ref,
                      dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, *, gelu):
    # One row block per grid step; dw/db outputs have constant index maps and
    # stay VMEM-resident in f32 across the whole (sequential) grid.
    i = pl.program_id(0)
    x = x_ref[:]
    do = do_ref[:]
    hpre = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    hpre = hpre + b1_ref[:].astype(jnp.float32)
    act_f32, grad = gelu_act_grad_f32(hpre, _kernel_impl(gelu))
    act = act_f32.astype(x.dtype)
    dh = jax.lax.dot_general(  # dout @ w2^T: contract the D axis
        do, w2_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    gh = dh * grad
    ghb = gh.astype(x.dtype)
    dx = jax.lax.dot_general(  # gh @ w1^T: contract the H axis
        ghb, w1_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[:] = dx.astype(dx_ref.dtype)
    dw1_part = jax.lax.dot_general(  # x^T @ gh over the row-block axis
        x, ghb, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw2_part = jax.lax.dot_general(  # act^T @ dout over the row-block axis
        act, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_part = jnp.sum(gh, axis=0, keepdims=True)
    db2_part = jnp.sum(do.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = dw1_part
        db1_ref[:] = db1_part
        dw2_ref[:] = dw2_part
        db2_ref[:] = db2_part

    @pl.when(i > 0)
    def _():
        dw1_ref[:] += dw1_part
        db1_ref[:] += db1_part
        dw2_ref[:] += dw2_part
        db2_ref[:] += db2_part


def _pad_rows(x, tp):
    return x if x.shape[0] == tp else jnp.pad(x, ((0, tp - x.shape[0]),
                                                  (0, 0)))


_BLOCK_T = 256  # row block for fwd AND the single-kernel bwd; only the
# non-default split bwd (_bwd_call_split) drops to 128 (more f32 live/row)


def _fwd_call(x, w1, b1, w2, b2, gelu, save_hpre: bool = False):
    T, D = x.shape
    H = w1.shape[1]
    tp = -(-T // _BLOCK_T) * _BLOCK_T
    xp = _pad_rows(x, tp)
    grid = (tp // _BLOCK_T,)
    const = lambda i: (0, 0)
    row = lambda i: (i, 0)
    o_spec = pl.BlockSpec((_BLOCK_T, D), row, memory_space=pltpu.VMEM)
    o_shape = jax.ShapeDtypeStruct((tp, D), x.dtype)
    if save_hpre:
        out_specs = (o_spec, pl.BlockSpec((_BLOCK_T, H), row,
                                          memory_space=pltpu.VMEM))
        out_shape = (o_shape, jax.ShapeDtypeStruct((tp, H), x.dtype))
    else:
        out_specs, out_shape = o_spec, o_shape
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, gelu=gelu, save_hpre=save_hpre),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BLOCK_T, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * tp * D * H,
            bytes_accessed=(2 * tp * D + 2 * D * H) * x.dtype.itemsize
            + (tp * H * x.dtype.itemsize if save_hpre else 0),
            transcendentals=tp * H,
        ),
        compiler_params=_params(),
        interpret=_interpret(),
    )(xp, w1, b1, w2, b2)
    if save_hpre:
        return out[0][:T], out[1][:T]
    return out[:T]


def _bwd_call(x, w1, b1, w2, do, gelu):
    if os.environ.get("AVSIAM_MLP_BWD") == "split":
        return _bwd_call_split(x, w1, b1, w2, do, gelu)
    T, D = x.shape
    H = w1.shape[1]
    bt = int(os.environ.get("AVSIAM_MLP_BT", _BLOCK_T))
    tp = -(-T // bt) * bt
    xp = _pad_rows(x, tp)
    dop = _pad_rows(do, tp)
    grid = (tp // bt,)
    const = lambda i: (0, 0)
    row = lambda i: (i, 0)
    dxp, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, gelu=gelu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, D), row, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tp, D), x.dtype),
            jax.ShapeDtypeStruct((D, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((H, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * tp * D * H,
            bytes_accessed=(3 * tp * D + 2 * D * H) * x.dtype.itemsize
            + 2 * D * H * 4,
            transcendentals=2 * tp * H,
        ),
        compiler_params=_params(),
        interpret=_interpret(),
    )(xp, w1, b1, w2, dop)
    return dxp[:T], dw1, db1[0], dw2, db2[0]


def _bwd_call_split(x, w1, b1, w2, do, gelu):
    T, D = x.shape
    H = w1.shape[1]
    bt = 128
    tp = -(-T // bt) * bt
    xp = _pad_rows(x, tp)
    dop = _pad_rows(do, tp)
    grid = (tp // bt,)
    const = lambda i: (0, 0)
    row = lambda i: (i, 0)
    dxp, gh, act = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, gelu=gelu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, D), row, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, H), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, H), row, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tp, D), x.dtype),
            jax.ShapeDtypeStruct((tp, H), x.dtype),
            jax.ShapeDtypeStruct((tp, H), x.dtype),
        ),
        compiler_params=_params(),
        interpret=_interpret(),
    )(xp, w1, b1, w2, dop)

    def weight_grads(a, g):
        m, n = a.shape[1], g.shape[1]
        mt = math.gcd(m, 768)
        nt = math.gcd(n, 768)
        wgrid = (m // mt, n // nt, tp // bt)
        return pl.pallas_call(
            _dw_kernel,
            grid=wgrid,
            in_specs=[
                pl.BlockSpec((bt, mt), lambda jm, jn, i: (i, jm),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, nt), lambda jm, jn, i: (i, jn),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((mt, nt), lambda jm, jn, i: (jm, jn),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nt), lambda jm, jn, i: (0, jn),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(jax.ShapeDtypeStruct((m, n), jnp.float32),
                       jax.ShapeDtypeStruct((1, n), jnp.float32)),
            interpret=_interpret(),
        )(a, g)

    dw1, db1 = weight_grads(xp, gh)
    dw2, db2 = weight_grads(act, dop)
    return dxp[:T], dw1, db1[0], dw2, db2[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_mlp(x, w1, b1, w2, b2, gelu):
    return _fwd_call(x, w1, b1, w2, b2, gelu)


def _fused_mlp_fwd(x, w1, b1, w2, b2, gelu):
    return _fwd_call(x, w1, b1, w2, b2, gelu), (x, w1, b1, w2)


def _fused_mlp_bwd(gelu, res, do):
    x, w1, b1, w2 = res
    dx, dw1, db1, dw2, db2 = _bwd_call(x, w1, b1, w2, do, gelu)
    # cotangent dtypes must match the primals (the f32 master params receive
    # these through the outer astype's VJP)
    return (dx, dw1.astype(w1.dtype), db1.reshape(1, -1).astype(w1.dtype),
            dw2.astype(w2.dtype), db2.reshape(1, -1).astype(w2.dtype))


_fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fres_mlp(x, w1, b1, w2, b2, gelu):
    # 'fres': Pallas forward (hidden never round-trips HBM between the
    # GEMMs) that ALSO emits the pre-GELU hidden as a bf16 residual — the
    # backward is then plain XLA ops on the saved residual, exactly the
    # (measured-faster) backward structure of the 'dense' path.
    return _fwd_call(x, w1, b1, w2, b2, gelu)


def _fres_mlp_fwd(x, w1, b1, w2, b2, gelu):
    out, hpre = _fwd_call(x, w1, b1, w2, b2, gelu, save_hpre=True)
    return out, (x, w1, w2, hpre)


def _fres_mlp_bwd(gelu, res, do):
    x, w1, w2, hpre = res
    dt = x.dtype
    act_f32, grad = gelu_act_grad_f32(hpre.astype(jnp.float32),
                                      _kernel_impl(gelu))
    dh = jax.lax.dot_general(  # dout @ w2^T: contract the D axis
        do, w2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    gh = (dh * grad).astype(dt)
    dx = jax.lax.dot_general(  # gh @ w1^T: contract the H axis
        gh, w1, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)
    dw1 = jax.lax.dot_general(  # x^T @ gh
        x, gh, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw2 = jax.lax.dot_general(  # act^T @ dout
        act_f32.astype(dt), do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1 = jnp.sum(gh.astype(jnp.float32), axis=0, keepdims=True)
    db2 = jnp.sum(do.astype(jnp.float32), axis=0, keepdims=True)
    return (dx, dw1.astype(w1.dtype), db1.astype(w1.dtype),
            dw2.astype(w2.dtype), db2.astype(w2.dtype))


_fres_mlp.defvjp(_fres_mlp_fwd, _fres_mlp_bwd)


def _lnfwd_kernel(x_ref, g_ref, bln_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  o_ref, hpre_ref, *, gelu, eps):
    # LN (f32 stats, flax nn.LayerNorm's exact formula) -> fc1 -> GELU ->
    # fc2 -> +residual, all on the row block while it sits in VMEM. The
    # standalone LN fusion's [T, D] write + read and the residual-add
    # fusion's [T, D] read + write never touch HBM.
    xf = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    mu2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    mul = jax.lax.rsqrt(var + eps) * g_ref[:].astype(jnp.float32)
    n = ((xf - mu) * mul + bln_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    hpre = jnp.dot(n, w1_ref[:], preferred_element_type=jnp.float32)
    hpre = hpre + b1_ref[:].astype(jnp.float32)
    hpre_ref[:] = hpre.astype(hpre_ref.dtype)
    h = _gelu_f32(hpre, gelu).astype(x_ref.dtype)
    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    m = (y + b2_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    # residual add in the activation dtype, matching the unfused
    # ``x + mlp(n2(x))`` graph bit-for-bit
    o_ref[:] = x_ref[:] + m


def _lnfwd_call(x, g, bln, w1, b1, w2, b2, eps, gelu):
    T, D = x.shape
    H = w1.shape[1]
    tp = -(-T // _BLOCK_T) * _BLOCK_T
    xp = _pad_rows(x, tp)
    grid = (tp // _BLOCK_T,)
    const = lambda i: (0, 0)
    row = lambda i: (i, 0)
    o, hpre = pl.pallas_call(
        functools.partial(_lnfwd_kernel, gelu=gelu, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BLOCK_T, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_BLOCK_T, D), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_T, H), row, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tp, D), x.dtype),
            jax.ShapeDtypeStruct((tp, H), x.dtype),
        ),
        # advisory scheduler hint only: reuses the plain-MLP formula — the
        # LN's rsqrt transcendentals and the f32 scale/bias reads are
        # deliberately ignored (same convention as _fwd_call; both are <1%
        # of the GEMM traffic this estimate exists to convey)
        cost_estimate=pl.CostEstimate(
            flops=4 * tp * D * H,
            bytes_accessed=(2 * tp * D + 2 * D * H + tp * H)
            * x.dtype.itemsize,
            transcendentals=tp * H,
        ),
        compiler_params=_params(),
        interpret=_interpret(),
    )(xp, g, bln, w1, b1, w2, b2)
    return o[:T], hpre[:T]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _lnfres_mlp(x, g, bln, w1, b1, w2, b2, eps, gelu):
    # 'lnfres': the 'fres' forward with the pre-MLP LayerNorm AND the
    # residual add folded INTO the kernel (ops replaced inside an existing
    # kernel boundary — the round-3 rule). Backward is plain XLA: LN is
    # recomputed from x (which the LN backward reads anyway), then the same
    # saved-residual MLP backward as 'fres', then the analytic LN VJP.
    return _lnfwd_call(x, g, bln, w1, b1, w2, b2, eps, gelu)[0]


def _lnfres_mlp_fwd(x, g, bln, w1, b1, w2, b2, eps, gelu):
    out, hpre = _lnfwd_call(x, g, bln, w1, b1, w2, b2, eps, gelu)
    return out, (x, g, bln, w1, w2, hpre)


def _lnfres_mlp_bwd(eps, gelu, res, do):
    from avsiam_tpu.ops.layernorm import _ln_bwd_math, _ln_fwd_math
    x, g, bln, w1, w2, hpre = res
    dt = x.dtype
    n = _ln_fwd_math(x, g, bln, eps)  # recompute the bf16 LN output
    act_f32, grad = gelu_act_grad_f32(hpre.astype(jnp.float32),
                                      _kernel_impl(gelu))
    dh = jax.lax.dot_general(  # dout @ w2^T: contract the D axis
        do, w2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    gh = (dh * grad).astype(dt)
    dn = jax.lax.dot_general(  # gh @ w1^T: contract the H axis
        gh, w1, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)
    dw1 = jax.lax.dot_general(  # n^T @ gh
        n, gh, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw2 = jax.lax.dot_general(  # act^T @ dout
        act_f32.astype(dt), do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1 = jnp.sum(gh.astype(jnp.float32), axis=0, keepdims=True)
    db2 = jnp.sum(do.astype(jnp.float32), axis=0, keepdims=True)
    dx_ln, dgamma, dbeta = _ln_bwd_math(x, g, dn, eps)
    dx = do + dx_ln  # the residual branch's cotangent joins here
    return (dx, dgamma.reshape(1, -1).astype(g.dtype),
            dbeta.reshape(1, -1).astype(bln.dtype),
            dw1.astype(w1.dtype), db1.astype(w1.dtype),
            dw2.astype(w2.dtype), db2.astype(w2.dtype))


_lnfres_mlp.defvjp(_lnfres_mlp_fwd, _lnfres_mlp_bwd)


def fused_ln_mlp(x: jnp.ndarray, ln_scale, ln_bias, w1, b1, w2, b2,
                 eps: float = 1e-5, gelu: str = "erf") -> jnp.ndarray:
    """``x + fc2(gelu(fc1(LN(x))))`` — the transformer block's whole MLP
    sub-block (pre-LN, MLP, residual) as ONE Pallas forward kernel.

    x: [..., D]; ln_scale/ln_bias [D] f32; w1 [D, H], b1 [H], w2 [H, D],
    b2 [D]. Numerics identical to ``x + Mlp(impl='fres')(LayerNormFP32(x))``:
    f32 LN statistics, bf16 GEMM operands, f32 accumulation, f32 GELU.
    """
    shape = x.shape
    D = shape[-1]
    H = w1.shape[1]
    assert D % 128 == 0 and H % 128 == 0, (D, H)
    x2 = x.reshape(-1, D)
    dt = x.dtype
    out = _lnfres_mlp(
        x2, ln_scale.reshape(1, -1).astype(jnp.float32),
        ln_bias.reshape(1, -1).astype(jnp.float32),
        w1.astype(dt), b1.reshape(1, -1).astype(dt),
        w2.astype(dt), b2.reshape(1, -1).astype(dt), float(eps), gelu)
    return out.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fbwd_mlp(x, w1, b1, w2, b2, gelu):
    # forward = the 'dense' XLA path bit-for-bit (layers.Mlp dense impl)
    from avsiam_tpu.ops.gelu import gelu as _gelu_op
    h = jnp.dot(x, w1) + b1
    g = _gelu_op(h, impl=gelu)
    return jnp.dot(g, w2) + b2


def _fbwd_mlp_fwd(x, w1, b1, w2, b2, gelu):
    return _fbwd_mlp(x, w1, b1, w2, b2, gelu), (x, w1, b1, w2)


def _fbwd_mlp_bwd(gelu, res, do):
    x, w1, b1, w2 = res
    dx, dw1, db1, dw2, db2 = _bwd_call(x, w1, b1, w2, do, gelu)
    return (dx, dw1.astype(w1.dtype), db1.reshape(1, -1).astype(w1.dtype),
            dw2.astype(w2.dtype), db2.reshape(1, -1).astype(w2.dtype))


_fbwd_mlp.defvjp(_fbwd_mlp_fwd, _fbwd_mlp_bwd)


def fused_mlp(x: jnp.ndarray, w1, b1, w2, b2,
              gelu: str = "erf", impl: str = "fused") -> jnp.ndarray:
    """x: [..., D]; w1 [D, H], b1 [H], w2 [H, D], b2 [D] (any float dtype —
    cast to x.dtype for the GEMMs, f32 accumulation). Returns [..., D].

    impl='fused': Pallas forward + Pallas single-kernel backward.
    impl='fbwd': XLA dense forward (bit-identical to layers.Mlp 'dense'),
    Pallas single-kernel backward — the forward keeps XLA's GEMM+GELU
    fusion while the backward consolidates 4 GEMMs + GELU'/bias/weight
    grads into one kernel with VMEM-resident f32 accumulators."""
    shape = x.shape
    D = shape[-1]
    H = w1.shape[1]
    assert D % 128 == 0 and H % 128 == 0, (D, H)
    x2 = x.reshape(-1, D)
    dt = x.dtype
    assert impl in ("fused", "fbwd", "fres"), impl
    fn = {"fbwd": _fbwd_mlp, "fres": _fres_mlp}.get(impl, _fused_mlp)
    out = fn(x2, w1.astype(dt), b1.reshape(1, -1).astype(dt),
             w2.astype(dt), b2.reshape(1, -1).astype(dt), gelu)
    return out.reshape(shape)

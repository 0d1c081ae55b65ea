"""Multi-head attention ops: fused Pallas TPU kernels + XLA fallback.

The reference uses CUDA fused scaled-dot-product attention when available
(src/models/cav_mae_base.py:64-68, torch F.scaled_dot_product_attention) —
this module is its TPU-native equivalent.

Design notes (TPU-first, profile-driven on v5e — BENCH_NOTES.md round 2):

* AVSiam sequences are short — 196 (video), 512 (audio), up to 768 (fusion /
  MAE decoder) tokens. The whole K/V for one (batch, head) fits in VMEM, so
  the kernels are *fused* attention (one pass, full-row softmax) rather than
  streaming flash kernels: zero recomputation, no accumulator traffic.
* The primary kernel is TOKEN-MAJOR (``attention_qkv``): it reads the qkv
  projection's natural [B, N, 3C] GEMM output via three column-offset views
  of the same array and writes token-major [B, N, C] — zero layout copies.
  Per-head scores come from lane-masked full-width dots, which cost the
  same MXU time as D-deep dots (the 128-deep systolic array pads K < 128).
* A head-major kernel pair ([B, N, H, D] API, ``pallas_attention``) remains
  for generality and as the cross-check oracle.
* Softmax statistics are f32 regardless of input dtype; matmul operands stay
  in the input dtype (bf16 = 4x the f32 MXU rate) with f32 accumulation;
  normalization is deferred past the PV matmul (row reciprocals, no N^2
  division); the backward folds the 1/denom row factors into N*D scalings.
* Key-validity masking (padded mmixed encoder, decoder row padding) enters
  as an additive float bias on the scores; unmasked unpadded calls skip the
  bias entirely at compile time.
* 'auto' dispatch is size-based: XLA for N <= 256 (its fused softmax beats
  the Pallas kernels ~2.3x at the MAE-encoder shapes, where the materialized
  [B,H,N,N] f32 scores are small), Pallas above (1.8x faster at 512-768).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU builds too, but guard anyway
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_NEG_INF = -1e30
_LANE = 128
_HPP_OVERRIDE: Optional[int] = None  # benchmark knob; None = heuristic
_LOG2E = 1.4426950408889634
# softmax inner form (all mathematically identical, f32, reordered only):
#   'exp'    : e = exp(s*scale + bias - m)           [default]
#   'expfold': e = exp((s_raw - m) * scale) over UNSCALED scores (the
#              explicit scale pass folds into the exponential argument)
#   'exp2'   : expfold via exp2(x * log2e)
# Measured on v5e at B=64 (full step): exp 359.7 ms, expfold 362.4,
# exp2 369.7 — Mosaic already fuses the scale multiply into the softmax
# chain, and its exp lowering beats exp2, so the variants are kept only as
# A/B knobs (AVSIAM_SOFTMAX env).
_SOFTMAX_IMPL = os.environ.get("AVSIAM_SOFTMAX", "exp")


def _softmax_e(s_raw, bias_row, scale: float):
    """Unnormalized softmax numerator e from UNSCALED scores s_raw (f32).
    Returns e with e.sum(-1) = denom, identical to
    exp(s_raw*scale + bias - max(...)) in every form."""
    if _SOFTMAX_IMPL in ("exp2", "expfold"):
        s = s_raw if bias_row is None else s_raw + bias_row * (1.0 / scale)
        m = jnp.max(s, axis=-1, keepdims=True)
        if _SOFTMAX_IMPL == "exp2":
            return jnp.exp2((s - m) * (scale * _LOG2E))
        return jnp.exp((s - m) * scale)
    s = s_raw * scale
    if bias_row is not None:
        s = s + bias_row
    m = jnp.max(s, axis=-1, keepdims=True)
    return jnp.exp(s - m)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  key_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Reference XLA implementation. q,k,v: [B, N, H, D]; key_valid: [B, N] bool."""
    B, N, H, D = q.shape
    scale = D ** -0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if key_valid is not None:
        bias = jnp.where(key_valid, 0.0, _NEG_INF).astype(jnp.float32)
        s = s + bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas fused attention (forward)
# ---------------------------------------------------------------------------

def _attn_fwd_math(q, k, v, bias_row, scale: float, o_dtype):
    """One head's fused attention: [Nq, D] x [Nk, D] -> [Nq, D]."""
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Nq, Nk], unscaled — scale folds into the softmax exponential
    e = _softmax_e(s, bias_row, scale)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    # normalization deferred past the PV matmul: one reciprocal + one
    # multiply PER ROW instead of N^2 divisions (softmax is the VPU
    # bottleneck of this kernel — the matmuls are small at AVSiam D)
    o = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return (o * (1.0 / denom)).astype(o_dtype)


def _attn_bwd_math(q, k, v, do, bias_row, scale: float):
    """One head's fused attention backward: returns (dq, dk, dv) f32.

    Matmul operands stay in the INPUT dtype (bf16 on TPU: 4x the MXU rate of
    f32) with f32 accumulation; softmax statistics and the softmax VJP run
    in f32. This matches the precision of the XLA fallback's autodiff
    (einsums over bf16 operands with preferred_element_type=f32) — for f32
    inputs the casts are no-ops and the math is unchanged.
    """
    do = do.astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # unscaled — scale folds into the softmax exponential
    e = _softmax_e(s, bias_row, scale)  # p = e * r, r = 1/rowsum(e)
    r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)  # [Nq, 1]
    # With p = e*r and row factors pulled out of every N^2 term, the
    # softmax VJP needs only elementwise mults on [Nq, Nk] (the N^2
    # division of p = e/denom — the kernel's VPU hotspot — becomes
    # N*D-sized row scalings around the matmuls):
    #   dv = p^T do           = e^T (r*do)
    #   dp = do v^T
    #   c  = rowsum(dp * p)   = r * rowsum(dp * e)
    #   ds = p * (dp - c)     = r * [e * (dp - c)]
    #   dq = (ds k) * scale   = r * [(e*(dp-c)) k] * scale
    #   dk = ds^T q * scale   = [e*(dp-c)]^T (r*q) * scale
    dor = (r * do).astype(v.dtype)
    eb = e.astype(v.dtype)
    dv = jax.lax.dot_general(  # e^T @ (r do): contract rows
        eb, dor, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(  # do @ v^T: contract D
        do.astype(v.dtype), v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    c = r * jnp.sum(dp * e, axis=-1, keepdims=True)
    es = (e * (dp - c)).astype(q.dtype)  # ds = r * es
    dq = (jnp.dot(es, k, preferred_element_type=jnp.float32)
          * (scale * r))
    qr = (r * q.astype(jnp.float32)).astype(q.dtype)
    dk = jax.lax.dot_general(  # es^T @ (r q): contract rows
        es, qr, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    return dq, dk, dv


def _fwd_kernel(q_ref, k_ref, v_ref, *refs, scale: float, hpp: int):
    # q_ref: [1, hpp, BQ, D], k_ref/v_ref: [1, hpp, Np, D]; an optional bias
    # ref [1, 1, Np] precedes the output ref (compile-time: unmasked calls —
    # every hot path — skip the N^2 bias add and its DMA entirely)
    bias_ref, o_ref = refs if len(refs) == 2 else (None, refs[0])
    bias_row = None if bias_ref is None else bias_ref[0]
    for h in range(hpp):
        o_ref[0, h] = _attn_fwd_math(q_ref[0, h], k_ref[0, h], v_ref[0, h],
                                     bias_row, scale, o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, *refs, scale: float, hpp: int):
    # tensor refs: [1, hpp, Np, D] (full sequence per program); optional bias
    # [1,1,Np] precedes do/dq/dk/dv (see _fwd_kernel).
    if len(refs) == 5:
        bias_ref, do_ref, dq_ref, dk_ref, dv_ref = refs
    else:
        bias_ref = None
        do_ref, dq_ref, dk_ref, dv_ref = refs
    bias_row = None if bias_ref is None else bias_ref[0]
    for h in range(hpp):
        dq, dk, dv = _attn_bwd_math(q_ref[0, h], k_ref[0, h], v_ref[0, h],
                                    do_ref[0, h], bias_row, scale)
        dq_ref[0, h] = dq.astype(dq_ref.dtype)
        dk_ref[0, h] = dk.astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)


def _pad_tokens(x: jnp.ndarray, n_to: int) -> jnp.ndarray:
    n = x.shape[2]
    if n == n_to:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, n_to - n), (0, 0)))


def _bias_from_valid(key_valid: Optional[jnp.ndarray], B: int, N: int,
                     Np: int) -> jnp.ndarray:
    if key_valid is None:
        valid = jnp.ones((B, N), dtype=bool)
    else:
        valid = key_valid
    if Np != N:
        valid = jnp.pad(valid, ((0, 0), (0, Np - N)), constant_values=False)
    # [B, 1, Np]: keep a broadcastable middle dim so BlockSpec tiles align
    return jnp.where(valid, 0.0, _NEG_INF).astype(jnp.float32)[:, None, :]


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (enables CPU testing)."""
    return jax.default_backend() != "tpu"


def _params():
    """Raise the Mosaic scoped-VMEM cap (default 16 MB) so head-packed
    operand blocks fit; same practice as ops/mlp.py."""
    if pltpu is None:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _heads_per_program(H: int, Np: int, D: int, itemsize: int,
                       bwd: bool = False) -> int:
    """How many heads one grid program handles. Default 1: packing more
    heads per program measured SLOWER at every AVSiam shape on v5e
    (Np=768 D=64: 5.8 -> 6.8 ms; Np=768 D=32: 6.8 -> 7.4; Np=128: 3.2 ->
    5.6) — the sequential grid pipelines DMA against compute across
    programs, while a statically-unrolled in-program head loop serializes.
    ``_HPP_OVERRIDE`` remains as the experiment knob."""
    del Np, D, itemsize, bwd
    hpp = 1 if _HPP_OVERRIDE is None else int(min(_HPP_OVERRIDE, H))
    while H % hpp != 0:  # grid needs an even split
        hpp -= 1
    return max(hpp, 1)


def _pallas_fwd(q, k, v, bias, *, block_q: int):
    # q,k,v: [B, H, Np, D]; bias: [B, 1, Np] or None (no masking needed)
    B, H, Np, D = q.shape
    scale = D ** -0.5
    if block_q == Np:
        hpp = _heads_per_program(H, Np, D, q.dtype.itemsize, bwd=False)
    else:
        hpp = 1
    grid = (B, H // hpp, Np // block_q)
    kv_spec = pl.BlockSpec((1, hpp, Np, D), lambda b, h, i: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, hpp, block_q, D), lambda b, h, i: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
        kv_spec,
        kv_spec,
    ]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, 1, Np), lambda b, h, i: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, hpp=hpp),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hpp, block_q, D),
                               lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Np, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Np * Np * D,
            bytes_accessed=(3 * B * H * Np * D + B * H * Np * D) * q.dtype.itemsize,
            transcendentals=B * H * Np * Np,
        ),
        compiler_params=_params(),
        interpret=_interpret(),
    )(*args)


def _pallas_bwd(q, k, v, bias, do):
    B, H, Np, D = q.shape
    scale = D ** -0.5
    hpp = _heads_per_program(H, Np, D, q.dtype.itemsize, bwd=True)
    grid = (B, H // hpp)
    full = pl.BlockSpec((1, hpp, Np, D), lambda b, h: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [full, full, full]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, 1, Np), lambda b, h: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias)
    in_specs.append(full)
    args.append(do)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, hpp=hpp),
        grid=grid,
        in_specs=in_specs,
        out_specs=(full, full, full),
        out_shape=tuple(jax.ShapeDtypeStruct((B, H, Np, D), q.dtype)
                        for _ in range(3)),
        compiler_params=_params(),
        interpret=_interpret(),
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _pallas_attention(q, k, v, bias, block_q):
    return _pallas_fwd(q, k, v, bias, block_q=block_q)


def _pallas_attention_fwd(q, k, v, bias, block_q):
    out = _pallas_fwd(q, k, v, bias, block_q=block_q)
    return out, (q, k, v, bias)


def _pallas_attention_bwd(block_q, residuals, do):
    q, k, v, bias = residuals
    dq, dk, dv = _pallas_bwd(q, k, v, bias, do)
    return dq, dk, dv, None


_pallas_attention.defvjp(_pallas_attention_fwd, _pallas_attention_bwd)


def pallas_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     key_valid: Optional[jnp.ndarray] = None,
                     block_q: Optional[int] = None) -> jnp.ndarray:
    """Fused TPU attention. q,k,v: [B, N, H, D]; key_valid: [B, N] bool.

    block_q=None (default) processes the full padded sequence in one grid
    program per (batch, head) — measured ~40% faster than 128-row q tiles at
    AVSiam's sequence lengths (N <= 768: scores fit VMEM comfortably).
    """
    B, N, H, D = q.shape
    if block_q is None:
        block_q = _round_up(N, _LANE)
    Np = _round_up(N, block_q)
    qt = _pad_tokens(q.transpose(0, 2, 1, 3), Np)
    kt = _pad_tokens(k.transpose(0, 2, 1, 3), Np)
    vt = _pad_tokens(v.transpose(0, 2, 1, 3), Np)
    if key_valid is None and Np == N:
        bias = None  # nothing to mask: skip the N^2 bias add + its DMA
    else:
        bias = _bias_from_valid(key_valid, B, N, Np)
    out = _pallas_attention(qt, kt, vt, bias, block_q)
    return out[:, :, :N, :].transpose(0, 2, 1, 3)


_XLA_SMALL_N = 256  # measured crossover on v5e, see docstring


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              key_valid: Optional[jnp.ndarray] = None,
              impl: str = "auto",
              block_q: Optional[int] = None) -> jnp.ndarray:
    """Dispatch: 'pallas' | 'xla' | 'auto'.

    'auto' on TPU picks by padded sequence length (measured on v5e,
    scripts/dissect.py): short sequences (N <= 256 — the MAE encoder's 128/49
    kept tokens, the fusion layers' 177, small mmixed chunks) run ~2.3x
    faster through XLA's fused softmax-attention (the [B,H,N,N] f32 scores
    it materializes are small, and Pallas' per-program cost dominates at
    these sizes); long sequences (512-768: full audio, the MAE decoder) run
    ~1.8x faster in the Pallas kernel (XLA's HBM score round-trips grow with
    N^2). Off-TPU always XLA."""
    if impl == "auto":
        if _HAS_PLTPU and jax.default_backend() == "tpu":
            impl = "xla" if q.shape[1] <= _XLA_SMALL_N else "pallas"
        else:
            impl = "xla"
    if impl == "pallas":
        return pallas_attention(q, k, v, key_valid, block_q=block_q)
    return xla_attention(q, k, v, key_valid)


# ---------------------------------------------------------------------------
# Token-major (layout-native) fused attention: the kernel reads the qkv
# projection's natural [B, N, 3C] output and writes token-major [B, N, C]
# ---------------------------------------------------------------------------
#
# Profiling the full train step (BENCH_NOTES.md round 2) showed ~17 ms/step
# of pure layout copies — the [B,N,H,D] <-> [B,H,N,D] transposes around every
# attention call. This kernel eliminates them: each grid program (b, j) reads
# the j-th 128-lane column slab of q, k and v as three views of the SAME
# [B, N, 3C] array (three in_specs with column-offset index maps), covering
# hp = 128/D heads. Per-head scores come from LANE-MASKED full-width dots:
#
#     s_i = (q * mask_i) @ k^T     (contract all 128 lanes)
#
# which is exact (masked lanes contribute zero) and costs the same MXU time
# as a D-deep dot — the MXU pads contractions to its 128-deep systolic array
# anyway, so for D=32/64 the masked full-width form is free. Outputs land
# directly in [B, N, C]; the backward writes [3, B, N, C] (one transpose to
# the [B, N, 3C] cotangent, replacing the forward's three + backward's four
# layout ops of the head-major path).

def _lane_masks(D: int):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
    return [lane // D == i for i in range(_LANE // D)]


def _fwd_kernel_tm(qs_ref, ks_ref, vs_ref, *refs, scale: float, D: int,
                   save_stats: bool, sp: int = 1):
    # refs: [bias?], o, [stats_out]?  — stats are per-(row, head) softmax
    # max and 1/denom, packed on the LANE dim of a [1, 1, Np, 8] block
    # (head i's max at lane i, its 1/denom at lane hp+i: column stores, no
    # in-kernel transpose; trailing block dims (Np, 8) match the array so
    # Mosaic's (8,128)-divisibility rule is satisfied) and consumed by the
    # backward kernel, which then skips both N^2 reduces (rowmax, rowsum).
    # sp = samples per program (see pallas_attention_qkv): the per-sample
    # loop amortizes per-program cost at small N; each sample's dots and
    # softmax are computed independently (no cross-sample FLOPs or masking).
    refs = list(refs)
    bias_ref = refs.pop(0) if len(refs) == (3 if save_stats else 2) else None
    if save_stats:
        o_ref, st_ref = refs
    else:
        (o_ref,) = refs
    hp = _LANE // D
    for sb in range(sp):
        qs = qs_ref[sb]
        ks = ks_ref[sb]
        vs = vs_ref[sb]
        bias_row = None if bias_ref is None else bias_ref[sb]
        acc = None
        for i, m in enumerate(_lane_masks(D)):
            qi = jnp.where(m, qs, jnp.zeros_like(qs))
            s = jax.lax.dot_general(
                qi, ks, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if save_stats:
                s = s * scale
                if bias_row is not None:
                    s = s + bias_row
                mx = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - mx)
            else:
                e = _softmax_e(s, bias_row, scale)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            vi = jnp.where(m, vs, jnp.zeros_like(vs))
            oi = jnp.dot(e.astype(vs.dtype), vi,
                         preferred_element_type=jnp.float32)
            oi = oi * (1.0 / denom)
            acc = oi if acc is None else acc + oi
            if save_stats:
                st_ref[0, 0, :, i:i + 1] = mx
                st_ref[0, 0, :, hp + i:hp + i + 1] = 1.0 / denom
        o_ref[sb] = acc.astype(o_ref.dtype)


def _bwd_kernel_tm(qs_ref, ks_ref, vs_ref, *refs, scale: float, D: int,
                   with_stats: bool, sp: int = 1):
    # refs: [bias?], [stats_in]?, do, dqkv — with_stats skips the rowmax
    # and rowsum N^2 reduce passes using the forward's saved statistics
    # (packed [1, 1, Np, 8]: head i's max at lane i, 1/denom at lane hp+i).
    # sp: samples per program (sp > 1 excludes with_stats — small-N only).
    refs = list(refs)
    nbase = 2 + (1 if with_stats else 0)
    bias_ref = refs.pop(0) if len(refs) == nbase + 1 else None
    if with_stats:
        st_ref, do_ref, dqkv_ref = refs
    else:
        st_ref = None
        do_ref, dqkv_ref = refs
    for sb in range(sp):
        _bwd_tm_one(qs_ref[sb], ks_ref[sb], vs_ref[sb],
                    None if bias_ref is None else bias_ref[sb], st_ref,
                    do_ref[sb].astype(jnp.float32), dqkv_ref, sb,
                    scale=scale, D=D)


def _bwd_tm_one(qs, ks, vs, bias_row, st_ref, do, dqkv_ref, sb, *,
                scale: float, D: int):
    hp = _LANE // D
    dq_acc = dk_acc = dv_acc = None
    for i, m in enumerate(_lane_masks(D)):
        qi = jnp.where(m, qs, jnp.zeros_like(qs))
        s = jax.lax.dot_general(
            qi, ks, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if st_ref is not None:
            s = s * scale
            if bias_row is not None:
                s = s + bias_row
            e = jnp.exp(s - st_ref[0, 0, :, i:i + 1])
            r = st_ref[0, 0, :, hp + i:hp + i + 1]
        else:
            e = _softmax_e(s, bias_row, scale)
            r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        doi = jnp.where(m, do, jnp.zeros_like(do))
        dor = (r * doi).astype(vs.dtype)
        eb = e.astype(vs.dtype)
        dvi = jax.lax.dot_general(  # e^T @ (r do_i): contract rows
            eb, dor, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(  # do_i @ v^T: contract lanes (half-i only)
            doi.astype(vs.dtype), vs,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        c = r * jnp.sum(dp * e, axis=-1, keepdims=True)
        es = (e * (dp - c)).astype(qs.dtype)  # ds = r * es
        ki = jnp.where(m, ks, jnp.zeros_like(ks))
        dqi = (jnp.dot(es, ki, preferred_element_type=jnp.float32)
               * (scale * r))
        qir = (r * qi.astype(jnp.float32)).astype(qs.dtype)
        dki = jax.lax.dot_general(  # es^T @ (r q_i): contract rows
            es, qir, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dq_acc = dqi if dq_acc is None else dq_acc + dqi
        dk_acc = dki if dk_acc is None else dk_acc + dki
        dv_acc = dvi if dv_acc is None else dv_acc + dvi
    dqkv_ref[0, sb] = dq_acc.astype(dqkv_ref.dtype)
    dqkv_ref[1, sb] = dk_acc.astype(dqkv_ref.dtype)
    dqkv_ref[2, sb] = dv_acc.astype(dqkv_ref.dtype)


def _tm_specs(B, Np, C, with_bias, sp=1):
    lanes = C // _LANE
    qs = pl.BlockSpec((sp, Np, _LANE), lambda b, j: (b, 0, j),
                      memory_space=pltpu.VMEM)
    ks = pl.BlockSpec((sp, Np, _LANE), lambda b, j: (b, 0, lanes + j),
                      memory_space=pltpu.VMEM)
    vs = pl.BlockSpec((sp, Np, _LANE), lambda b, j: (b, 0, 2 * lanes + j),
                      memory_space=pltpu.VMEM)
    specs = [qs, ks, vs]
    if with_bias:
        specs.append(pl.BlockSpec((sp, 1, Np), lambda b, j: (b, 0, 0),
                                  memory_space=pltpu.VMEM))
    return specs


def _pallas_fwd_tm(xqkv, bias, *, num_heads: int, save_stats: bool = False,
                   sp: int = 1):
    B, Np, C3 = xqkv.shape
    C = C3 // 3
    D = C // num_heads
    scale = D ** -0.5
    assert B % sp == 0 and (sp == 1 or not save_stats), (B, sp, save_stats)
    grid = (B // sp, C // _LANE)
    in_specs = _tm_specs(B, Np, C, bias is not None, sp)
    args = [xqkv, xqkv, xqkv] + ([bias] if bias is not None else [])
    out_specs = pl.BlockSpec((sp, Np, _LANE), lambda b, j: (b, 0, j),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, Np, C), xqkv.dtype)
    if save_stats:
        # packed per-column-group stats [B, G, Np, 8]: trailing block dims
        # (Np, 8) equal the array's, satisfying Mosaic's divisibility rule
        stat_spec = pl.BlockSpec((1, 1, Np, 8), lambda b, j: (b, j, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_specs = (out_specs, stat_spec)
        stat_shape = jax.ShapeDtypeStruct((B, C // _LANE, Np, 8), jnp.float32)
        out_shape = (out_shape, stat_shape)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_tm, scale=scale, D=D,
                          save_stats=save_stats, sp=sp),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Np * Np * C,
            bytes_accessed=4 * B * Np * C * xqkv.dtype.itemsize,
            transcendentals=B * num_heads * Np * Np,
        ),
        compiler_params=_params(),
        interpret=_interpret(),
    )(*args)


def _pallas_bwd_tm(xqkv, bias, stats, do, *, num_heads: int, sp: int = 1):
    B, Np, C3 = xqkv.shape
    C = C3 // 3
    D = C // num_heads
    scale = D ** -0.5
    assert B % sp == 0 and (sp == 1 or stats is None), (B, sp)
    grid = (B // sp, C // _LANE)
    in_specs = _tm_specs(B, Np, C, bias is not None, sp)
    args = [xqkv, xqkv, xqkv] + ([bias] if bias is not None else [])
    if stats is not None:
        stat_spec = pl.BlockSpec((1, 1, Np, 8), lambda b, j: (b, j, 0, 0),
                                 memory_space=pltpu.VMEM)
        in_specs.append(stat_spec)
        args.append(stats)
    in_specs.append(pl.BlockSpec((sp, Np, _LANE), lambda b, j: (b, 0, j),
                                 memory_space=pltpu.VMEM))
    args.append(do)
    return pl.pallas_call(
        functools.partial(_bwd_kernel_tm, scale=scale, D=D,
                          with_stats=stats is not None, sp=sp),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3, sp, Np, _LANE), lambda b, j: (0, b, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, B, Np, C), xqkv.dtype),
        compiler_params=_params(),
        interpret=_interpret(),
    )(*args)


# AVSIAM_ATTN_STATS=N saves forward softmax statistics (rowmax + 1/denom,
# packed [B, G, Np, 8] f32) for sequences with Np >= N; the backward then
# skips both N^2 reduce passes. 0 = off (default), 1 = every sp=1 call.
# Round-3 (pre-packing, so EVERY call was sp=1) measured the global form
# negative at B=64: 168.1 clips/s / 380.6 ms vs 181.4 / 352.8 — the
# per-head [Np, 1] column stores into the narrow lane-8 stat block stall
# the forward kernel's pipeline for far more than the two skipped backward
# reduces are worth. Round 5 made it a min-Np threshold and re-tested the
# trade on the decoder alone, whose N=720 backward is the step's single
# largest op family (4.6 ms x 8 blocks, BENCH_NOTES round-5
# decomposition): AVSIAM_ATTN_STATS=720 measured 203.07/203.64 clips/s vs
# 202.55/202.45 baseline (2 runs each, same session) — confined to the
# decoder the saved stats win ~1.5 ms/step, so 720 is now the default
# (gradient-equivalence tested either way; env knob for A/B).
_STATS_MIN_NP = int(os.environ.get("AVSIAM_ATTN_STATS", "720"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _pallas_attention_tm(xqkv, bias, num_heads, sp=1):
    return _pallas_fwd_tm(xqkv, bias, num_heads=num_heads, sp=sp)


def _pallas_attention_tm_fwd(xqkv, bias, num_heads, sp=1):
    # stats packing puts head i's max at lane i and 1/denom at lane hp+i of
    # an 8-lane block, so it only fits 2*hp <= 8, i.e. head_dim >= 32
    # (ViT-B D=64, decoder D=32; D=16 would overflow the block)
    hp = _LANE // ((xqkv.shape[-1] // 3) // num_heads)
    if (_STATS_MIN_NP and xqkv.shape[1] >= _STATS_MIN_NP
            and _SOFTMAX_IMPL == "exp" and sp == 1 and 2 * hp <= 8):
        out, stats = _pallas_fwd_tm(xqkv, bias, num_heads=num_heads,
                                    save_stats=True)
        return out, (xqkv, bias, stats)
    return (_pallas_fwd_tm(xqkv, bias, num_heads=num_heads, sp=sp),
            (xqkv, bias, None))


def _pallas_attention_tm_bwd(num_heads, sp, residuals, do):
    xqkv, bias, stats = residuals
    dqkv3 = _pallas_bwd_tm(xqkv, bias, stats, do, num_heads=num_heads, sp=sp)
    # [3, B, Np, C] -> the [B, Np, 3C] cotangent: the ONE layout op of the
    # whole backward path
    B, Np = xqkv.shape[0], xqkv.shape[1]
    dqkv = dqkv3.transpose(1, 2, 0, 3).reshape(B, Np, -1)
    return dqkv, None


_pallas_attention_tm.defvjp(_pallas_attention_tm_fwd, _pallas_attention_tm_bwd)


def _sublane(dtype) -> int:
    return 16 if dtype == jnp.bfloat16 else 8


# max sp*Np rows per program (VMEM + unroll budget); env knob for A/B runs.
# Default 8192 = measured-best on v5e (row-cap sweep 1024/2048/4096/8192 ->
# 199.7/201.6/201.7/202.1 clips/s at B=64, BENCH_NOTES.md round 3: bigger
# programs amortize per-program cost).
_SP_ROW_CAP = int(os.environ.get("AVSIAM_SP_ROWS", "8192"))

# max Np eligible for sample packing. Default 511 keeps the round-2 kernel
# (sp=1) for every long sequence (decoder Np=720, full-audio Np=512) — at
# those sizes per-program cost is already amortized over Np^2 work. Knob for
# the VERDICT-r3 "re-sweep sp-packing at N=720" A/B (e.g. 1024 lets the
# decoder pack: _samples_per_program(64, 720) = 8, the largest divisor of
# B=64 with 8*720 <= the 8192-row cap — measured-negative, BENCH_NOTES.md).
_SP_MAX_NP = int(os.environ.get("AVSIAM_SP_MAXNP", "511"))


def _samples_per_program(B: int, Np: int) -> int:
    """Samples per grid program: 1 for long sequences (the decoder/full-
    audio hot path keeps its exact round-2 kernel); for short sequences as
    many samples as fit sp*Np <= _SP_ROW_CAP. Packing amortizes the
    per-program cost that made per-sample programs lose to XLA at small N
    (e.g. the MAE encoder's N=128 at sp=16 -> 2048-row programs, 16x fewer
    programs). Prefers an exact divisor of B (zero batch padding) when it
    reaches the same program count or is within 2x of the cap; otherwise
    returns a non-divisor sp and the caller pads the batch (the mmixed
    chunks' prime B=13 would otherwise never pack)."""
    if Np > _SP_MAX_NP:
        return 1
    cap_sp = max(1, min(B, _SP_ROW_CAP // Np))
    if cap_sp == 1:
        return 1
    best_div = max(d for d in range(1, cap_sp + 1) if B % d == 0)
    n_prog = -(-B // cap_sp)
    if B // best_div <= n_prog or best_div * 2 >= cap_sp:
        return best_div
    return -(-B // n_prog)  # evens programs out, minimal batch padding


def pallas_attention_qkv(xqkv: jnp.ndarray, num_heads: int,
                         key_valid: Optional[jnp.ndarray] = None,
                         sp: Optional[int] = None) -> jnp.ndarray:
    """Layout-native fused attention on the raw qkv projection [B, N, 3C]
    (channel order (3, H, D), i.e. ``Dense(3C)`` output). Returns [B, N, C].

    Requires C % 128 == 0 and head_dim dividing 128 (ViT-B: D=64; the MAE
    decoder: D=32). Rows are padded to the dtype's sublane tile (16 for bf16
    — e.g. 410 -> 416, not 512) with padding keys masked via the bias.
    sp=None auto-picks samples-per-program (see _samples_per_program)."""
    B, N, C3 = xqkv.shape
    C = C3 // 3
    assert C % _LANE == 0 and _LANE % (C // num_heads) == 0, (C, num_heads)
    Np = _round_up(N, _sublane(xqkv.dtype))
    if Np != N:
        xqkv = jnp.pad(xqkv, ((0, 0), (0, Np - N), (0, 0)))
    if key_valid is None and Np == N:
        bias = None
    else:
        bias = _bias_from_valid(key_valid, B, N, Np)
    if sp is None:
        sp = _samples_per_program(B, Np)
    Bp = -(-B // sp) * sp
    if Bp != B:
        # non-divisor sp: pad the batch. Padding samples see bias 0 (all
        # keys "valid"), so their softmax is a well-defined uniform over
        # zero scores — no NaN to leak into the (discarded) pad rows of
        # either the forward output or the backward's recomputed e.
        xqkv = jnp.pad(xqkv, ((0, Bp - B), (0, 0), (0, 0)))
        if bias is not None:
            bias = jnp.pad(bias, ((0, Bp - B), (0, 0), (0, 0)))
    out = _pallas_attention_tm(xqkv, bias, num_heads, sp)
    return out[:B, :N]


# Small-N (auto-dispatch) backend: 'pallas' (the sample-packed token-major
# kernel — sp>1 amortizes the per-program cost that made per-sample
# programs lose to XLA in round 2; on-chip A/B 2026-08-18: 202.1 clips/s
# vs 198.5 for 'xla' at B=64, BENCH_NOTES.md) | 'xla'.
_SMALLN_IMPL = os.environ.get("AVSIAM_SMALLN", "pallas")


def attention_qkv(xqkv: jnp.ndarray, num_heads: int,
                  key_valid: Optional[jnp.ndarray] = None,
                  impl: str = "auto") -> jnp.ndarray:
    """Attention on the packed qkv projection [B, N, 3C] -> [B, N, C].
    Same size-based dispatch as ``attention``; the pallas path is the
    token-major kernel (no transposes — see pallas_attention_qkv)."""
    B, N, C3 = xqkv.shape
    C = C3 // 3
    D = C // num_heads
    tm_ok = C % _LANE == 0 and _LANE % D == 0
    if impl == "auto":
        if _HAS_PLTPU and jax.default_backend() == "tpu" and tm_ok:
            impl = (_SMALLN_IMPL if N <= _XLA_SMALL_N else "pallas")
        else:
            impl = "xla"
    if impl == "pallas" and tm_ok:
        return pallas_attention_qkv(xqkv, num_heads, key_valid)
    qkv = xqkv.reshape(B, N, 3, num_heads, D)
    if impl == "pallas":
        out = pallas_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
                               key_valid)
    else:
        out = xla_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
                            key_valid)
    return out.reshape(B, N, C)

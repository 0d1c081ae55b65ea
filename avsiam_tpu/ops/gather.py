"""MXU-friendly gathers: one-hot matmul instead of gather/scatter.

On TPU, XLA lowers ``jnp.take_along_axis`` forward to a gather and — far
worse — its BACKWARD to a serialized scatter-add: measured 5.0 ms fwd+bwd for
a [32, 708, 512] token restore on v5e (scripts/dissect.py), vs ~0.1 ms as a
pair of batched GEMMs. Since every gather in this model indexes whole tokens
(rows), the gather is exactly a permutation-matrix product:

    y = P @ x,   P[n, k, l] = 1{ids[n, k] == l}

whose VJP is the transposed matmul P^T @ g — no scatter anywhere. The
product is EXACT (each output row has exactly one unit coefficient; values
pass through f32 accumulation unchanged), so this is a lowering choice, not
an approximation.

The reference hits the same semantics with torch.gather on CUDA
(src/models/cav_mae_base.py:383-389, 615-618); scatter is cheap there and
expensive on TPU, hence the different lowering. On CPU (tests, the virtual
mesh) the true gather is used — one-hot GEMMs would be slow there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _auto_impl() -> str:
    return "matmul" if jax.default_backend() == "tpu" else "gather"


def take_tokens(x: jnp.ndarray, ids: jnp.ndarray,
                impl: str = "auto") -> jnp.ndarray:
    """Batched token gather: x [N, L, D], ids [N, K] int -> [N, K, D] with
    out[n, k] = x[n, ids[n, k]]."""
    if impl == "auto":
        impl = _auto_impl()
    if impl == "gather":
        # mode="clip": out-of-range ids (used as inert padding rows by
        # random_masking(pad_to=...)) must clamp, not fill with NaN — NaN
        # keys would poison every masked softmax they appear in
        return jnp.take_along_axis(x, ids[:, :, None], axis=1, mode="clip")
    L = x.shape[1]
    p = jax.nn.one_hot(ids, L, dtype=x.dtype)  # [N, K, L]
    y = jnp.einsum("nkl,nld->nkd", p, x,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def take_batch(x: jnp.ndarray, ids: jnp.ndarray,
               impl: str = "auto") -> jnp.ndarray:
    """Batch-dim gather: x [B, ...], ids [S] int -> [S, ...] with
    out[s] = x[ids[s]]. Used by the exact mmixed encoder's chunk gathers
    (backward is otherwise a scatter-add over the full [B, L, D] batch)."""
    if impl == "auto":
        impl = _auto_impl()
    if impl == "gather":
        return jnp.take(x, ids, axis=0, mode="clip")
    B = x.shape[0]
    p = jax.nn.one_hot(ids, B, dtype=x.dtype)  # [S, B]
    flat = x.reshape(B, -1)
    y = jnp.dot(p, flat, preferred_element_type=jnp.float32).astype(x.dtype)
    return y.reshape((ids.shape[0],) + x.shape[1:])

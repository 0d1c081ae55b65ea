"""ToMe: bipartite soft matching token merging.

Parity surface: the bytecode-only ``yb_tome.yb_bipartite_soft_matching``
(src/models/__pycache__, imported at cav_mae_base.py:21; docstring: "Applies
ToMe with a balanced matching set (50%, 50%)") plus the vendored
``tome.merge`` API used in the commented ToMe path of Block.forward
(cav_mae_base.py:155-166): match on mean-head attention keys, merge the r
most similar tokens from set A into set B by weighted average.

TPU-first formulation: instead of the reference's dynamic-shape gather/concat
(output length N - r), merging is expressed with STATIC shapes as a sparse
assignment matrix applied with one matmul (scatter-free, MXU-friendly), and
the merged sequence keeps length N with a validity mask — dropped slots are
masked out of downstream attention/pooling (the same trick as the padded
masking encoder).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def bipartite_soft_matching(metric: jnp.ndarray, r: int,
                            balanced: bool = True
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute a ToMe merge plan.

    metric: [B, N, D] matching features (typically mean-head attention keys,
    cav_mae_base.py:81 ``k.mean(1)``). r: number of tokens to merge (static).

    Returns (assign [B, N, N], keep [B, N]):
      * ``assign[b, i, j]`` = 1 if source token i contributes to output slot j
        (identity for unmerged tokens; merged A-tokens point at their B match)
      * ``keep[b, i]`` = False for the r merged-away A slots.
    Apply with ``merge_wavg``.
    """
    B, N, D = metric.shape
    # balanced 50/50 split: even positions -> A, odd -> B (the yb_tome
    # "balanced matching set"); standard ToMe alternates identically
    a_idx = jnp.arange(0, N, 2)
    b_idx = jnp.arange(1, N, 2)
    Na, Nb = a_idx.shape[0], b_idx.shape[0]
    r = min(r, Na)

    m = metric / jnp.maximum(
        jnp.linalg.norm(metric, axis=-1, keepdims=True), 1e-6)
    sim = jnp.einsum("bad,bnd->ban", m[:, a_idx], m[:, b_idx])  # [B, Na, Nb]
    best_sim = jnp.max(sim, axis=-1)  # [B, Na]
    best_match = jnp.argmax(sim, axis=-1)  # [B, Na] -> index into b_idx

    # the r A-tokens with highest best-similarity get merged
    order = jnp.argsort(-best_sim, axis=-1)
    merged_rank = jnp.argsort(order, axis=-1)  # rank of each A token
    merge_flag = merged_rank < r  # [B, Na]

    # build the [B, N, N] assignment: start from identity, reroute merged A
    eye = jnp.broadcast_to(jnp.eye(N, dtype=metric.dtype), (B, N, N))
    src = a_idx[None, :].repeat(B, axis=0)  # [B, Na]
    dst = b_idx[best_match]  # [B, Na] absolute indices
    # one-hot of destination for each A token
    dst_onehot = jax.nn.one_hot(dst, N, dtype=metric.dtype)  # [B, Na, N]
    a_onehot = jax.nn.one_hot(src, N, dtype=metric.dtype)  # [B, Na, N]
    flag = merge_flag.astype(metric.dtype)[..., None]
    # rows for A tokens: identity when kept, dst when merged; gate each
    # A-token's contribution by its merge flag before summing over A
    a_gated = a_onehot * flag
    delta = (jnp.einsum("ban,bam->bnm", a_gated, dst_onehot)
             - jnp.einsum("ban,bam->bnm", a_gated, a_onehot))
    assign = eye + delta
    keep = jnp.ones((B, N), dtype=bool).at[:, a_idx].set(~merge_flag)
    return assign, keep


def merge_wavg(assign: jnp.ndarray, x: jnp.ndarray,
               size: jnp.ndarray | None = None
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted-average merge (tome.merge.merge_wavg semantics): tokens are
    combined proportionally to their accumulated sizes.

    x: [B, N, D]; size: [B, N, 1] token sizes (None = ones). Returns
    (x_merged [B, N, D], new_size [B, N, 1]); slots with keep=False hold
    stale values and must be masked downstream.
    """
    B, N, D = x.shape
    if size is None:
        size = jnp.ones((B, N, 1), dtype=x.dtype)
    weighted = jnp.einsum("bnm,bnd->bmd", assign, x * size)
    new_size = jnp.einsum("bnm,bnd->bmd", assign, size)
    return weighted / jnp.maximum(new_size, 1e-6), new_size

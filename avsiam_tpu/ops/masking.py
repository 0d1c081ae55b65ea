"""Random-masking primitives for MAE-style training, with static shapes.

Reference semantics (src/models/cav_mae_base.py:365-439): per-sample keep-set
selection by argsort of uniform noise. ``len_keep = int(L * (1 - ratio))`` is a
Python-level constant here, so every shape is static and XLA compiles a single
program (SURVEY.md section 7 "hard parts": no dynamic shapes).

Two consumption modes:

* ``random_masking`` — gather the kept tokens to the front (exact reference
  behavior, used by the MAE encoder where the 75% FLOP saving matters).
* ``keep_mask_*`` — return a boolean [N, L] keep mask without gathering. Kept
  tokens attend only to kept tokens via an attention bias and are mean-pooled
  with the mask; this is mathematically identical to dropping the tokens
  (LayerNorm/MLP are per-token, masked keys contribute zero attention weight)
  but keeps one static shape for all mask ratios — the TPU fast path for the
  multi-ratio contrastive encoder (cav_mae_base.py:533-594).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from avsiam_tpu.ops.gather import take_tokens


def len_keep_for(L: int, mask_ratio: float) -> int:
    """Parity: ``int(L * (1 - mask_ratio))`` (cav_mae_base.py:372)."""
    return int(L * (1.0 - mask_ratio))


def _mask_from_shuffle(ids_shuffle: jnp.ndarray, len_keep: int):
    N, L = ids_shuffle.shape
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    mask = jnp.ones((N, L), dtype=jnp.float32).at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return ids_restore, mask


def random_masking(rng: jax.Array, x: jnp.ndarray, len_keep: int,
                   noise: jnp.ndarray | None = None,
                   pad_to: int | None = None,
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Unstructured per-sample random masking with gather.

    Parity: cav_mae_base.py:365-390. Returns (x_masked [N,len_keep,D],
    mask [N,L] with 1=removed, ids_restore [N,L]).

    ``pad_to`` (>= len_keep) gathers into a [N, pad_to, D] array whose tail
    rows are inert (zeros on the TPU one-hot-GEMM path): lane-aligned pad_to
    means the attention kernels see an already-aligned sequence and no
    pad/slice copies appear around them. Tail rows must be excluded
    downstream via an attention key-validity mask + masked pooling — under
    which they are mathematically invisible (tests/test_attention.py:
    masked == dropped).
    """
    N, L, _ = x.shape
    if noise is None:
        noise = jax.random.uniform(rng, (N, L))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    if pad_to is not None and pad_to > len_keep:
        # out-of-range ids make zero one-hot rows (TPU) / clamped junk rows
        # (CPU gather) — either is masked out downstream
        ids_keep = jnp.concatenate(
            [ids_keep, jnp.full((N, pad_to - len_keep), L, ids_keep.dtype)],
            axis=1)
    x_masked = take_tokens(x, ids_keep)  # one-hot GEMM on TPU (no scatter bwd)
    ids_restore, mask = _mask_from_shuffle(ids_shuffle, len_keep)
    return x_masked, mask, ids_restore


def structured_noise(rng: jax.Array, N: int, f: int, t: int, mask_ratio: float,
                     mode: str = "tf") -> jnp.ndarray:
    """Noise field for structured audio masking over the (f, t) patch grid.

    Parity: cav_mae_base.py:392-423 — base uniform noise; a without-replacement
    sample of time columns and/or freq rows is boosted to 1.1 so argsort drops
    them first. The reference draws the column subset with per-sample Python
    ``random.sample``; we draw it with a vectorized rank trick (argsort of
    uniform noise), which has the identical distribution.
    """
    k_base, k_t, k_f = jax.random.split(rng, 3)
    noise = jax.random.uniform(k_base, (N, f, t))

    def _boost_sets(key, n, count):
        # per-sample random subset of `count` out of `n`, as a bool mask [N, n]
        r = jax.random.uniform(key, (N, n))
        ranks = jnp.argsort(jnp.argsort(r, axis=1), axis=1)
        return ranks < count

    if mode == "time":
        boost = _boost_sets(k_t, t, int(t * mask_ratio))[:, None, :]
    elif mode == "freq":
        boost = _boost_sets(k_f, f, int(f * mask_ratio))[:, :, None]
    elif mode == "tf":
        bt = _boost_sets(k_t, t, int(t * mask_ratio * 0.7))[:, None, :]
        bf = _boost_sets(k_f, f, int(f * mask_ratio * 0.7))[:, :, None]
        boost = jnp.logical_or(bt, bf)
    else:
        raise ValueError(f"unknown structured mask mode: {mode}")
    noise = jnp.where(boost, 1.1, noise)
    return noise.reshape(N, f * t)


def random_masking_structured(rng: jax.Array, x: jnp.ndarray, mask_ratio: float,
                              t: int = 64, f: int = 8, mode: str = "time",
                              pad_to: int | None = None,
                              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Structured masking with gather. Parity: cav_mae_base.py:392-439."""
    N, L, _ = x.shape
    assert L == f * t
    k_noise, k_sets = jax.random.split(rng)
    noise = structured_noise(k_sets, N, f, t, mask_ratio, mode)
    len_keep = len_keep_for(L, mask_ratio)
    return random_masking(k_noise, x, len_keep, noise=noise, pad_to=pad_to)


def keep_mask_unstructured(rng: jax.Array, N: int, L: int, len_keep: int) -> jnp.ndarray:
    """Boolean keep mask (True = kept), no gather. Same keep-set distribution
    as ``random_masking``: the len_keep smallest noise values are kept."""
    noise = jax.random.uniform(rng, (N, L))
    ranks = jnp.argsort(jnp.argsort(noise, axis=1), axis=1)
    return ranks < len_keep


def keep_mask_structured(rng: jax.Array, N: int, f: int, t: int,
                         mask_ratio: float, mode: str = "tf") -> jnp.ndarray:
    """Boolean keep mask for structured masking, no gather."""
    L = f * t
    noise = structured_noise(rng, N, f, t, mask_ratio, mode)
    ranks = jnp.argsort(jnp.argsort(noise, axis=1), axis=1)
    return ranks < len_keep_for(L, mask_ratio)


def masked_mean(x: jnp.ndarray, keep: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Mean over kept tokens only. keep: bool broadcastable to x[..., axis].

    The keep count is summed in float32 regardless of activation dtype:
    bf16 tree-reduction of counts >256 rounds, which would make the pooled
    mean deviate slightly from the exact path's static-divisor mean.
    """
    keep_f = keep.astype(x.dtype)[..., None]
    total = jnp.sum(x * keep_f, axis=axis)
    count = jnp.maximum(
        jnp.sum(keep.astype(jnp.float32)[..., None], axis=axis), 1.0)
    return (total.astype(jnp.float32) / count).astype(x.dtype)

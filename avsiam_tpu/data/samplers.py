"""Sampling strategies (index generators).

Parity targets:
* ``eval_shard_indices`` — SequentialDistributedSampler
  (src/seq_dataloader.py:28-37): pad the dataset to a world-divisible size by
  repeating the LAST index, then contiguous per-rank slabs, enabling ordered
  gather + truncate evaluation.
* ``weighted_indices`` — torch WeightedRandomSampler under
  DistributedProxySampler (src/yb_sampler.py; weights CSV loaded at
  run_cavmae_ft_base.py:184-200): sampling WITH replacement proportional to
  per-sample weights.
* ``shuffled_epoch_indices`` — torch DistributedSampler semantics: permutation
  seeded by (seed + epoch), padded by wrap-around to a world-divisible size.
"""

from __future__ import annotations

import numpy as np


def shuffled_epoch_indices(n: int, epoch: int, seed: int = 0,
                           world: int = 1) -> np.ndarray:
    rng = np.random.RandomState(seed + epoch)
    idx = rng.permutation(n)
    total = -(-n // world) * world
    if total > n:
        idx = np.concatenate([idx, idx[: total - n]])
    return idx


def weighted_indices(weights: np.ndarray, num_samples: int,
                     epoch: int, seed: int = 0) -> np.ndarray:
    rng = np.random.RandomState(seed + epoch)
    p = np.asarray(weights, dtype=np.float64)
    p = p / p.sum()
    return rng.choice(len(p), size=num_samples, replace=True, p=p)


def eval_shard_indices(n: int, world: int = 1, rank: int = 0) -> np.ndarray:
    """Contiguous padded slab for `rank`. After gathering rank outputs in rank
    order, truncate to n (src/traintest_ft_base.py:22-27 distributed_concat)."""
    per_rank = -(-n // world)
    total = per_rank * world
    idx = np.arange(n)
    if total > n:
        idx = np.concatenate([idx, np.full(total - n, n - 1)])
    return idx[rank * per_rank: (rank + 1) * per_rank]


def batched(indices: np.ndarray, batch_size: int,
            drop_last: bool = True) -> list:
    nb = len(indices) // batch_size if drop_last else -(-len(indices) // batch_size)
    return [indices[i * batch_size: (i + 1) * batch_size] for i in range(nb)]

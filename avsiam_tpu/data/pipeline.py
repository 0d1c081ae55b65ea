"""Input pipeline: background-thread host loading + sharded device feeding.

Replaces the reference's fork-per-worker torch DataLoader
(traintest_cavmae_base.py:93-95, num_workers=6). Host batches are assembled on
a thread pool, ``jax.device_put`` with the mesh 'data' sharding overlaps the
H2D copy with device compute, and a small queue keeps the device fed
(prefetch-to-device, per the scaling-book input-pipeline recipe).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax
import numpy as np


def _put_batch(x, sharding):
    """Place one host array onto the mesh.

    Single-process: plain ``device_put`` (H2D overlap with compute).
    Multi-process: each host holds only ITS rows of the global batch, so the
    global array must be assembled from process-local shards —
    ``jax.make_array_from_process_local_data`` (the torchrun-DDP feeding
    pattern of run_pretrain_base.sh:3-5,75, where every rank loads a disjoint
    per-rank slice; a plain device_put cannot build a cross-process array).
    """
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            sharding, np.ascontiguousarray(x))
    return jax.device_put(x, sharding)


class Prefetcher:
    """Wrap a host-batch iterator; decode ahead on a thread and device_put."""

    _DONE = object()

    def __init__(self, it: Iterable, sharding=None, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._sharding = sharding
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()

        def worker():
            try:
                for item in it:
                    if self._stop.is_set():
                        return
                    if self._sharding is not None:
                        item = jax.tree_util.tree_map(
                            lambda x: _put_batch(x, self._sharding), item)
                    # bounded put that notices close(): a consumer that
                    # stops early (max_steps_per_epoch, divergence abort)
                    # would otherwise leave this thread blocked forever,
                    # pinning ~depth decoded/device batches
                    while not self._stop.is_set():
                        try:
                            self._q.put(item, timeout=0.5)
                            break
                        except queue.Full:
                            continue
            except BaseException as e:  # propagate to consumer
                self._err = e
            finally:
                # the DONE sentinel must reach the consumer even when the
                # queue is full (it still holds undrained items) — keep
                # trying unless close() told us nobody is listening
                while not self._stop.is_set():
                    try:
                        self._q.put(self._DONE, timeout=0.5)
                        break
                    except queue.Full:
                        continue

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def close(self):
        """Unblock and stop the worker; drop any queued batches."""
        self._stop.set()
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                break

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def host_batches(dataset, index_batches, seed: int,
                 frames_per_sample: int = 1,
                 position_batches=None) -> Iterator:
    """Generator of host numpy batches from an AVDataset + list of index
    arrays. Passes the int seed through so the dataset derives a per-sample
    stream from (seed, epoch position) — batches are then independent of
    rank sharding and assembly order, and repeated weighted-sampling draws
    of the same index get independent streams (AVDataset._sample_rng)."""
    if position_batches is None:
        for idx in index_batches:
            yield dataset.batch(idx, seed,
                                frames_per_sample=frames_per_sample)
    else:
        for idx, pos in zip(index_batches, position_batches):
            yield dataset.batch(idx, seed,
                                frames_per_sample=frames_per_sample,
                                positions=pos)


def device_loader(dataset, index_batches, transform: Callable,
                  rng_key: jax.Array, seed: int = 0,
                  frames_per_sample: int = 1, sharding=None,
                  train: bool = True, position_batches=None) -> Iterator:
    """Full pipeline: host batches -> prefetch/H2D -> fused device transform.

    Yields (fbank, image, labels) device arrays.
    """
    it = Prefetcher(host_batches(dataset, index_batches, seed,
                                 frames_per_sample, position_batches),
                    sharding=sharding)
    try:
        for i, batch in enumerate(it):
            if train:
                k = jax.random.fold_in(rng_key, i)
                yield transform(k, *batch)
            else:
                yield transform(*batch)
    finally:
        # reached on normal exhaustion AND on GeneratorExit when the
        # consumer breaks early (max_steps_per_epoch, divergence abort) —
        # stops the prefetch thread instead of leaking it blocked on a
        # full queue with device batches pinned
        it.close()

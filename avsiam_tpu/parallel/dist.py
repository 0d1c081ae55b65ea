"""Multi-host distributed runtime helpers.

TPU-native replacement for the reference's NCCL plumbing
(src/utils.py:250-299 ``init_distributed_mode`` env-var rendezvous +
rank-0-only printing; src/traintest_ft_base.py:22-27 ``distributed_concat``).

On TPU pods: ``jax.distributed.initialize()`` discovers the topology from the
TPU environment (no MASTER_ADDR/RANK env protocol needed); per-host input
pipelines feed globally-sharded arrays; ordered eval gather is
``multihost_utils.process_allgather`` + trim.
"""

from __future__ import annotations

import builtins
import os
from typing import Optional

import jax
import numpy as np


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> dict:
    """Initialize JAX multi-process runtime when running on >1 host.

    Parity surface: utils.py:283-297 (NCCL init_process_group + barrier).
    On single-host (or when already initialized) this is a no-op.
    """
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if coordinator_address is None:
        # torchrun-style env rendezvous (utils.py:283-290 reads RANK /
        # WORLD_SIZE / MASTER_ADDR); on TPU pods jax.distributed discovers
        # the topology itself and none of these are needed.
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    return {"process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "local_devices": jax.local_device_count(),
            "global_devices": jax.device_count()}


def is_main_process() -> bool:
    return jax.process_index() == 0


def setup_rank0_printing(force: bool = False):
    """Rank-0-only printing via a builtins.print wrap (utils.py:206-218).

    The wrap is installed on EVERY rank (as the reference does), so
    ``print(..., force=True)`` is valid everywhere: the main process prints
    everything, other ranks print only forced messages."""
    # idempotent: a second call must not nest wrappers — the outer wrap
    # would pop force=True and forward force=False to the inner one,
    # silencing forced messages on non-main ranks
    builtin_print = getattr(builtins.print, "_avsiam_inner", builtins.print)
    main = is_main_process()

    def print_rank0(*args, **kwargs):
        if kwargs.pop("force", False) or force or main:
            builtin_print(*args, **kwargs)

    print_rank0._avsiam_inner = builtin_print
    builtins.print = print_rank0


def gather_eval_outputs(local_array: np.ndarray, total: int) -> np.ndarray:
    """Ordered cross-host gather + trim for evaluation.

    Parity: SequentialDistributedSampler (seq_dataloader.py:28-37) feeds each
    rank a contiguous padded slab; ``distributed_concat``
    (traintest_ft_base.py:22-27) all-gathers and truncates to the true
    dataset size. Ranks are concatenated in process order, so the contiguous
    slabs restore dataset order.
    """
    if jax.process_count() == 1:
        return np.asarray(local_array)[:total]
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(np.asarray(local_array))
    return gathered.reshape((-1,) + gathered.shape[2:])[:total]


def average_across_processes(values: dict) -> dict:
    """Cross-process mean of a dict of scalar metrics (the reference's meter
    all_reduce helper, utils.py:40-51). Beyond parity this is load-bearing:
    checkpoint decisions keyed on eval metrics must be IDENTICAL on every
    process, because orbax saves are collective — rank-divergent values would
    desynchronize the save barriers."""
    if jax.process_count() == 1:
        return dict(values)
    from jax.experimental import multihost_utils
    keys = sorted(values)
    vec = np.array([float(values[k]) for k in keys], np.float32)
    gathered = np.asarray(multihost_utils.process_allgather(vec))
    mean = gathered.reshape(jax.process_count(), -1).mean(axis=0)
    return {k: float(mean[i]) for i, k in enumerate(keys)}


def barrier(name: str = "barrier"):
    """Cross-host sync point (utils.py barrier parity)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)

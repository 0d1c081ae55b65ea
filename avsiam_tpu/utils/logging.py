"""Experiment logging: stdout + JSONL metrics + optional wandb.

Replaces the reference's rank-0 wandb logging (run_cavmae_pretrain_base.py:
116-118, traintest_cavmae_base.py:213-220) and pickle/CSV dumps with a
structured JSONL stream under the experiment dir; wandb attaches when the
package is importable and WANDB_PROJECT is set (zero-egress environments just
get the JSONL).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, exp_dir: str, project: str = "avsiam-tpu",
                 enable_wandb: Optional[bool] = None,
                 main_process: Optional[bool] = None):
        # rank-0-only logging, like the reference's rank-gated wandb init
        # (run_cavmae_pretrain_base.py:116-118); non-main processes become
        # no-op loggers so multi-host runs don't race on metrics.jsonl.
        if main_process is None:
            try:
                import jax
                main_process = jax.process_index() == 0
            except Exception:
                main_process = True
        self._main = main_process
        self._f = None
        self._t0 = time.time()
        self._wandb = None
        if not self._main:
            return
        os.makedirs(exp_dir, exist_ok=True)
        self._f = open(os.path.join(exp_dir, "metrics.jsonl"), "a")
        if enable_wandb is None:
            enable_wandb = bool(os.environ.get("WANDB_PROJECT"))
        if enable_wandb:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project=os.environ.get("WANDB_PROJECT", project))
            except ImportError:
                self._wandb = None

    def log(self, metrics: Dict, step: Optional[int] = None):
        if not self._main:
            return
        row = {"t": round(time.time() - self._t0, 3), **metrics}
        if step is not None:
            row["step"] = step
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        if self._f is not None:
            self._f.close()
        if self._wandb is not None:
            self._wandb.finish()

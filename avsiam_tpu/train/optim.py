"""Optimizers and LR schedules with torch parity.

* ``torch_adam`` — torch.optim.Adam semantics: L2-style weight decay added to
  the gradient BEFORE the moment updates (optax add_decayed_weights followed
  by scale_by_adam reproduces this exactly), betas (0.95, 0.999), eps 1e-8,
  weight_decay 5e-7 (traintest_cavmae_base.py:64-66, traintest_ft_base.py:78-83).
  The learning rate is injected per-step by the train step (so epoch-schedule
  changes never trigger recompilation).
* ``multistep_lr_factor`` — torch MultiStepLR(milestones=range(start, 1000,
  step), gamma) parity: the factor in effect DURING 1-indexed epoch e is
  gamma^|{m in milestones : m <= e-1}| (scheduler.step() runs after each
  epoch's validation, traintest_cavmae_base.py:239-240).
"""

from __future__ import annotations

import optax

from avsiam_tpu.configs import OptimizerConfig


def torch_adam(cfg: OptimizerConfig) -> optax.GradientTransformation:
    """Adam producing UNSCALED (lr=1) update directions; negate+scale by lr
    in the step. Matches torch Adam update ordering."""
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(b1=cfg.b1, b2=cfg.b2, eps=cfg.eps),
    )


def masked_torch_adam(cfg: OptimizerConfig, mask) -> optax.GradientTransformation:
    """Adam restricted to a touched-parameter subset — the JAX equivalent of
    DDP(find_unused_parameters=True) skipping untouched params: masked-out
    leaves get no moment updates, no weight decay, and zero update."""
    return optax.masked(torch_adam(cfg), mask)


def multistep_lr_factor(epoch_1indexed: int, start: int, step: int,
                        gamma: float) -> float:
    milestones_passed = 0
    m = start
    while m <= epoch_1indexed - 1 and m < 1000:
        milestones_passed += 1
        m += step
    return gamma ** milestones_passed

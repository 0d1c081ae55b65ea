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

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

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


class FlatAdamState(NamedTuple):
    """Adam moments over the flattened parameter vector."""

    count: jnp.ndarray  # int32 scalar
    mu: jnp.ndarray  # [P] f32
    nu: jnp.ndarray  # [P] f32


class FlatMaskedAdam(NamedTuple):
    init: Callable[[Any], FlatAdamState]
    # step(grads, state, params, lr) -> (new_params, new_state)
    step: Callable[..., Any]


def flat_masked_torch_adam(cfg: OptimizerConfig, mask) -> FlatMaskedAdam:
    """torch-Adam over ONE flattened [P] vector instead of per-leaf trees.

    Identical math to ``optax.masked(torch_adam(cfg), mask)`` followed by
    ``params - lr * update`` (verified update-for-update in
    tests/test_train_steps.py): weight decay is added to the gradient of
    MASKED leaves only; untouched leaves carry exact-zero gradients in the
    two-pass step, so their flat moments stay 0 and their update is
    0/(sqrt(0)+eps) = 0 — the same frozen-moment semantics as optax.masked.

    MEASURED NEGATIVE on v5e and NOT used by the train steps: the full
    pretrain step ran 264 -> 308 ms with this optimizer — the per-step
    ravel/unravel copies (~3 GB extra HBM traffic) and the loss of XLA's
    donation aliasing on the param tree cost more than the per-leaf kernel
    count saved. Kept (with its equivalence test) as the documented record
    of that experiment; the in-step cost of the per-leaf masked Adams is
    ~12 ms, already near the HBM bound.

    ``mask`` maps the param tree to a tree of PYTHON bools (static — leaf
    routing happens at trace time, no runtime select).
    """

    def init(params) -> FlatAdamState:
        flat, _ = ravel_pytree(params)
        return FlatAdamState(count=jnp.zeros((), jnp.int32),
                             mu=jnp.zeros_like(flat),
                             nu=jnp.zeros_like(flat))

    def step(grads, state: FlatAdamState, params, lr):
        keep = mask(params)
        gp = jax.tree_util.tree_map(
            lambda g, p, m: g + cfg.weight_decay * p if m
            else jnp.zeros_like(g),
            grads, params, keep)
        gflat, _ = ravel_pytree(gp)
        pflat, unravel = ravel_pytree(params)
        count = state.count + 1
        mu = cfg.b1 * state.mu + (1.0 - cfg.b1) * gflat
        nu = cfg.b2 * state.nu + (1.0 - cfg.b2) * (gflat * gflat)
        cf = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - cfg.b1 ** cf)
        nu_hat = nu / (1.0 - cfg.b2 ** cf)
        pnew = pflat - lr * (mu_hat / (jnp.sqrt(nu_hat) + cfg.eps))
        return unravel(pnew), FlatAdamState(count=count, mu=mu, nu=nu)

    return FlatMaskedAdam(init=init, step=step)


class PlateauScheduler:
    """torch.optim.lr_scheduler.ReduceLROnPlateau parity (the reference's
    ``lr_adapt`` path, traintest_ft_base.py:99-100 /
    traintest_cavmae_base.py:69-71: mode='max', factor=0.5,
    patience=args.lr_patience, everything else torch defaults).

    Host-side state machine; the current ``lr`` is fed to the jitted step as
    a runtime scalar (like the MultiStepLR factor), so adaptation never
    recompiles. ``step(metric)`` runs once per epoch after validation —
    the finetune loop feeds mAP/acc (traintest_ft_base.py:266-270), the
    pretrain loop feeds ``-eval_loss`` (traintest_cavmae_base.py:236-237).
    Verified update-for-update against torch in tests/test_plateau.py.
    """

    def __init__(self, init_lr: float, mode: str = "max", factor: float = 0.5,
                 patience: int = 1, threshold: float = 1e-4,
                 threshold_mode: str = "rel", cooldown: int = 0,
                 min_lr: float = 0.0, eps: float = 1e-8):
        assert mode in ("min", "max") and threshold_mode in ("rel", "abs")
        self.lr = float(init_lr)
        self.mode, self.factor, self.patience = mode, factor, patience
        self.threshold, self.threshold_mode = threshold, threshold_mode
        self.cooldown, self.min_lr, self.eps = cooldown, min_lr, eps
        self.best = float("-inf") if mode == "max" else float("inf")
        self.cooldown_counter = 0
        self.num_bad_epochs = 0

    def _is_better(self, a: float, best: float) -> bool:
        if self.mode == "min" and self.threshold_mode == "rel":
            return a < best * (1.0 - self.threshold)
        if self.mode == "min":
            return a < best - self.threshold
        if self.threshold_mode == "rel":
            return a > best * (self.threshold + 1.0)
        return a > best + self.threshold

    def step(self, metric) -> float:
        current = float(metric)
        if self._is_better(current, self.best):
            self.best = current
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0  # torch: cooldown suppresses bad epochs
        if self.num_bad_epochs > self.patience:
            new_lr = max(self.lr * self.factor, self.min_lr)
            if self.lr - new_lr > self.eps:
                self.lr = new_lr
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.lr


def plateau_scheduler(cfg: OptimizerConfig) -> PlateauScheduler:
    """The exact scheduler both reference loops construct under lr_adapt."""
    return PlateauScheduler(cfg.lr, mode="max", factor=0.5,
                            patience=cfg.lr_patience)


def multistep_lr_factor(epoch_1indexed: int, start: int, step: int,
                        gamma: float) -> float:
    milestones_passed = 0
    m = start
    while m <= epoch_1indexed - 1 and m < 1000:
        milestones_passed += 1
        m += step
    return gamma ** milestones_passed

"""Pretraining step: the reference's two-pass / two-optimizer scheme, as one
jitted SPMD program.

Parity (traintest_cavmae_base.py:64-66,131-152): per batch,
  pass 1 — forward with (mae=0, contrast=1), backward, Adam #1 step;
  pass 2 — forward the UPDATED params with (mae=1, contrast=0), backward,
           Adam #2 step.
Each Adam is masked to that pass's touched parameter set (the
find_unused_parameters=True equivalent, see train/param_groups.py). bf16
compute replaces CUDA AMP+GradScaler (TPU bf16 needs no loss scaling,
SURVEY.md section 2.5).

Distribution: the step is written on the logically-global batch. Under jit
with the batch sharded over the mesh 'data' axis, XLA turns the contrastive
logit matrix into an all-gather over ICI and the gradient reduction into
psums (GSPMD) — the NCCL DDP + GatherLayer equivalent.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from avsiam_tpu.configs import PretrainConfig
from avsiam_tpu.models.cavmae import CAVMAEPretrain
from avsiam_tpu.train import param_groups as pg
from avsiam_tpu.train.optim import masked_torch_adam, multistep_lr_factor


class PretrainState(NamedTuple):
    params: Any
    opt1: Any  # contrastive-pass Adam state
    opt2: Any  # MAE-pass Adam state
    step: jnp.ndarray


def make_optimizers(cfg: PretrainConfig):
    """Two per-leaf masked Adams — the find_unused_parameters=True equivalent
    of the reference's two optimizers (traintest_cavmae_base.py:64-66).
    A single flat-[P]-vector variant (optim.flat_masked_torch_adam) was
    measured SLOWER end-to-end (step 264 -> 308 ms: the ravel/unravel copies
    and lost donation aliasing outweigh the kernel-count savings), so the
    per-leaf form stays."""
    tx1 = masked_torch_adam(cfg.opt, lambda p: pg.mask_tree(p, pg.touched_contrastive))
    tx2 = masked_torch_adam(cfg.opt, lambda p: pg.mask_tree(p, pg.touched_mae))
    return tx1, tx2


def _apply(tx, grads, opt_state, params, lr):
    updates, opt_state = tx.update(grads, opt_state, params)
    updates = jax.tree_util.tree_map(lambda u: (-lr * u).astype(u.dtype), updates)
    params = optax.apply_updates(params, updates)
    return params, opt_state


def init_state(rng: jax.Array, model: CAVMAEPretrain, cfg: PretrainConfig,
               sample_batch) -> PretrainState:
    a, v = sample_batch
    init_fn = jax.jit(functools.partial(
        model.init, mae_loss_weight=1.0, contrast_loss_weight=1.0))
    variables = init_fn({"params": rng, "mask": rng, "perm": rng}, a, v,
                        cfg.masking_ratio_a, cfg.masking_ratio)
    params = variables["params"]
    tx1, tx2 = make_optimizers(cfg)
    return PretrainState(params=params, opt1=tx1.init(params),
                         opt2=tx2.init(params), step=jnp.zeros((), jnp.int32))


def make_pretrain_step(model: CAVMAEPretrain, cfg: PretrainConfig):
    """Returns jitted step(state, batch, rng, lr) -> (state, metrics)."""
    tx1, tx2 = make_optimizers(cfg)

    def step(state: PretrainState, batch, rng, lr):
        a, v = batch
        r = jax.random.fold_in(rng, state.step)
        k_mask1, k_perm1, k_mask2, k_perm2 = jax.random.split(r, 4)

        # ---- pass 1: contrastive only (traintest_cavmae_base.py:131-140) ----
        def loss_contrast(params):
            out = model.apply(
                {"params": params}, a, v, cfg.masking_ratio_a,
                cfg.masking_ratio, mae_loss_weight=0.0,
                contrast_loss_weight=1.0, mask_mode=cfg.mask_mode,
                rngs={"mask": k_mask1, "perm": k_perm1})
            return out[0], out

        (loss1, out1), grads1 = jax.value_and_grad(
            loss_contrast, has_aux=True)(state.params)
        params, opt1 = _apply(tx1, grads1, state.opt1, state.params, lr)

        # ---- pass 2: MAE only (traintest_cavmae_base.py:146-152) ----
        def loss_mae(params):
            out = model.apply(
                {"params": params}, a, v, cfg.masking_ratio_a,
                cfg.masking_ratio, mae_loss_weight=1.0,
                contrast_loss_weight=0.0, mask_mode=cfg.mask_mode,
                rngs={"mask": k_mask2, "perm": k_perm2})
            return out[0], out

        (loss2, out2), grads2 = jax.value_and_grad(
            loss_mae, has_aux=True)(params)
        params, opt2 = _apply(tx2, grads2, state.opt2, params, lr)

        new_state = PretrainState(params=params, opt1=opt1, opt2=opt2,
                                  step=state.step + 1)
        metrics = {
            "loss": loss2,  # reference meters track the pass-2 loss value
            "loss_c": out1[4],
            "c_acc": out1[7],
            "loss_mae": out2[1],
            "loss_mae_a": out2[2],
            "loss_mae_v": out2[3],
        }
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(model: CAVMAEPretrain, cfg: PretrainConfig):
    """Validation forward (traintest_cavmae_base.py:381-424): args-weighted
    losses, no grad."""

    def eval_step(params, batch, rng):
        a, v = batch
        k_mask, k_perm = jax.random.split(rng)
        out = model.apply(
            {"params": params}, a, v, cfg.masking_ratio_a, cfg.masking_ratio,
            mae_loss_weight=cfg.mae_loss_weight,
            contrast_loss_weight=cfg.contrast_loss_weight,
            mask_mode=cfg.mask_mode,
            rngs={"mask": k_mask, "perm": k_perm})
        return {"loss": out[0], "loss_mae": out[1], "loss_mae_a": out[2],
                "loss_mae_v": out[3], "loss_c": out[4], "c_acc": out[7]}

    return jax.jit(eval_step)


def lr_for_epoch(cfg: PretrainConfig, epoch_1indexed: int) -> float:
    return cfg.opt.lr * multistep_lr_factor(
        epoch_1indexed, cfg.opt.lrscheduler_start, cfg.opt.lrscheduler_step,
        cfg.opt.lrscheduler_decay)

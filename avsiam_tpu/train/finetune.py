"""Finetuning step: 3-group Adam with stochastic loss routing.

Parity (traintest_ft_base.py:78-83,106-157):
* one Adam over three param groups — base lr, mlp_head* at lr*head_lr,
  mm_layer* at lr*mm_lr;
* 'mm_grad' mode: one forward returns (fused, audio, video) logits; a uniform
  draw picks the loss — prob > 0.5 -> fused, prob < 0.25 -> audio, else video;
* BCE-with-logits or CE loss;
* optional freeze_base (linear probing): base group gets zero lr.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from avsiam_tpu.configs import FinetuneConfig
from avsiam_tpu.models.cavmae_ft import CAVMAEFinetune
from avsiam_tpu.train import param_groups as pg
from avsiam_tpu.train.optim import multistep_lr_factor, torch_adam


class FinetuneState(NamedTuple):
    params: Any
    opt: Any
    step: jnp.ndarray


def bce_with_logits(logits, targets):
    """torch nn.BCEWithLogitsLoss parity (mean reduction)."""
    logits = logits.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -jnp.mean(targets * log_p + (1.0 - targets) * log_not_p)


def ce_with_soft_targets(logits, targets):
    """torch nn.CrossEntropyLoss parity with probability targets
    (mean over batch of -sum_k target_k * log_softmax_k)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(targets * logp, axis=-1))


def loss_fn_for(cfg: FinetuneConfig):
    return bce_with_logits if cfg.loss == "BCE" else ce_with_soft_targets


def make_optimizer(cfg: FinetuneConfig):
    return torch_adam(cfg.opt)


def group_lr_multipliers(cfg: FinetuneConfig):
    base = 0.0 if cfg.freeze_base else 1.0
    return {"base": base, "mlp": cfg.head_lr, "mm": cfg.mm_lr}


def init_state(rng: jax.Array, model: CAVMAEFinetune, cfg: FinetuneConfig,
               sample_batch) -> FinetuneState:
    a, v, _ = sample_batch
    variables = jax.jit(
        lambda r, a, v: model.init(r, a, v, cfg.ftmode, False))(rng, a, v)
    params = variables["params"]
    # gated Adam is needed (and used by the step) only under mm_grad's
    # stochastic routing: every other ftmode touches a STATIC param set each
    # step, where plain Adam already matches torch for every touched param
    # (the permanently-untouched heads decay under optax wd but are never
    # read by that mode's forward/eval — unobservable)
    if cfg.parity_optimizer and cfg.ftmode == "mm_grad":
        from avsiam_tpu.train import gated_adam
        opt = gated_adam.init(params)
    else:
        opt = make_optimizer(cfg).init(params)
    return FinetuneState(params=params, opt=opt,
                         step=jnp.zeros((), jnp.int32))


def make_finetune_step(model: CAVMAEFinetune, cfg: FinetuneConfig):
    tx = make_optimizer(cfg)
    loss_fn = loss_fn_for(cfg)
    mults = group_lr_multipliers(cfg)

    def step(state: FinetuneState, batch, rng, lr):
        a, v, labels = batch
        r = jax.random.fold_in(rng, state.step)
        prob = jax.random.uniform(r)  # traintest_ft_base.py:135

        def compute_loss(params):
            if cfg.ftmode == "mm_grad":
                out, out_a, out_v = model.apply(
                    {"params": params}, a, v, cfg.ftmode, False)
                # stochastic routing (traintest_ft_base.py:149-157); one-hot
                # weights zero the unselected branches' gradients
                w_av = (prob > 0.5).astype(jnp.float32)
                w_a = (prob < 0.25).astype(jnp.float32)
                w_v = 1.0 - w_av - w_a
                loss = (w_av * loss_fn(out, labels)
                        + w_a * loss_fn(out_a, labels)
                        + w_v * loss_fn(out_v, labels))
            else:
                out = model.apply({"params": params}, a, v, cfg.ftmode, False)
                loss = loss_fn(out, labels)
            return loss

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        lr_tree = pg.label_tree(
            state.params, lambda p: lr * mults[pg.ft_group(p)])
        if cfg.parity_optimizer and cfg.ftmode == "mm_grad":
            from avsiam_tpu.train import gated_adam
            sel_av = prob > 0.5
            sel_a = prob < 0.25
            sel_v = jnp.logical_not(jnp.logical_or(sel_av, sel_a))
            masks = {b: pg.mask_tree(state.params,
                                     lambda p, b=b: pg.ft_touched(p, b))
                     for b in ("av", "a", "v")}
            gates = jax.tree_util.tree_map(
                lambda m_av, m_a, m_v: ((sel_av & m_av) | (sel_a & m_a)
                                        | (sel_v & m_v)),
                masks["av"], masks["a"], masks["v"])
            params, opt = gated_adam.update(cfg.opt, grads, state.opt,
                                            state.params, gates, lr_tree)
        else:
            updates, opt = tx.update(grads, state.opt, state.params)
            updates = jax.tree_util.tree_map(
                lambda u, l: (-l * u).astype(u.dtype), updates, lr_tree)
            params = optax.apply_updates(state.params, updates)
        new_state = FinetuneState(params=params, opt=opt, step=state.step + 1)
        return new_state, {"loss": loss}

    return jax.jit(step, donate_argnums=(0,))


def make_ft_eval_step(model: CAVMAEFinetune, cfg: FinetuneConfig):
    """Eval forward (traintest_ft_base.py:292-352): logits for the eval-mode
    multi-frame forward; sigmoid + frame-mean happen host-side on gathered
    outputs. Uses ftmode_test when set (the reference's separate eval mode)."""
    mode = cfg.ftmode_test or cfg.ftmode

    def eval_step(params, batch):
        a, v, _ = batch
        return model.apply({"params": params}, a, v, mode, True)

    return jax.jit(eval_step)


def lr_for_epoch(cfg: FinetuneConfig, epoch_1indexed: int) -> float:
    return cfg.opt.lr * multistep_lr_factor(
        epoch_1indexed, cfg.opt.lrscheduler_start, cfg.opt.lrscheduler_step,
        cfg.opt.lrscheduler_decay)

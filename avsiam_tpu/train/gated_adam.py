"""Per-leaf gated torch-Adam: runtime-conditional parameter updates.

The reference's finetune step picks ONE of three losses per step (fused /
audio / video, traintest_ft_base.py:149-157) under
DDP(find_unused_parameters=True): parameters outside the selected loss's
graph receive NO update that step — no moment decay, no weight decay, and no
per-param step-count increment (torch Adam keeps a per-parameter ``step``).

Zero gradients in JAX would still advance Adam moments, so this module
implements torch-Adam with a PER-LEAF step count and a traced boolean gate
tree: gated-off leaves keep their entire optimizer state and parameters
frozen for the step. Used by the finetune step's parity mode
(FinetuneConfig.parity_optimizer).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from avsiam_tpu.configs import OptimizerConfig


class GatedAdamState(NamedTuple):
    count: Any  # per-leaf int32 step counts
    mu: Any
    nu: Any


def init(params) -> GatedAdamState:
    zeros_like = lambda p: jnp.zeros_like(p)
    return GatedAdamState(
        count=jax.tree_util.tree_map(
            lambda p: jnp.zeros((), jnp.int32), params),
        mu=jax.tree_util.tree_map(zeros_like, params),
        nu=jax.tree_util.tree_map(zeros_like, params),
    )


def update(cfg: OptimizerConfig, grads, state: GatedAdamState, params,
           gates, lr_tree):
    """One gated torch-Adam step.

    gates: pytree of traced booleans (same structure as params; True = apply).
    lr_tree: pytree of per-leaf learning rates (traced or static).
    Returns (new_params, new_state).
    """

    def leaf(g, p, cnt, mu, nu, gate, lr):
        gate = jnp.asarray(gate)
        new_cnt = cnt + gate.astype(jnp.int32)
        # torch Adam: grad += wd * p, then moments, then bias-corrected step
        g32 = g.astype(jnp.float32) + cfg.weight_decay * p.astype(jnp.float32)
        cand_mu = cfg.b1 * mu + (1 - cfg.b1) * g32
        cand_nu = cfg.b2 * nu + (1 - cfg.b2) * (g32 * g32)
        t = jnp.maximum(new_cnt, 1).astype(jnp.float32)
        mu_hat = cand_mu / (1 - cfg.b1 ** t)
        nu_hat = cand_nu / (1 - cfg.b2 ** t)
        step = lr * mu_hat / (jnp.sqrt(nu_hat) + cfg.eps)
        new_p = jnp.where(gate, p - step.astype(p.dtype), p)
        return (new_p, new_cnt,
                jnp.where(gate, cand_mu, mu), jnp.where(gate, cand_nu, nu))

    out = jax.tree_util.tree_map(
        leaf, grads, params, state.count, state.mu, state.nu, gates, lr_tree)
    new_params = jax.tree_util.tree_map(lambda t: t[0], out,
                                        is_leaf=lambda t: isinstance(t, tuple))
    new_count = jax.tree_util.tree_map(lambda t: t[1], out,
                                       is_leaf=lambda t: isinstance(t, tuple))
    new_mu = jax.tree_util.tree_map(lambda t: t[2], out,
                                    is_leaf=lambda t: isinstance(t, tuple))
    new_nu = jax.tree_util.tree_map(lambda t: t[3], out,
                                    is_leaf=lambda t: isinstance(t, tuple))
    return new_params, GatedAdamState(new_count, new_mu, new_nu)

"""Gated-Adam parity tests: ft_touched masks vs auto-derived per-branch
gradients; gated step freezes untouched leaves; gated==plain when all on."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from avsiam_tpu.configs import (CAVMAEFTConfig, FinetuneConfig,
                                OptimizerConfig, ViTConfig)
from avsiam_tpu.models import CAVMAEFinetune
from avsiam_tpu.train import gated_adam
from avsiam_tpu.train import param_groups as pg
from avsiam_tpu.train.finetune import bce_with_logits, init_state, \
    make_finetune_step

TINY = ViTConfig(dim=16, depth=2, num_heads=2, patch_size=16, img_size=32,
                 audio_length=64, mel_bins=32)


def _model_and_params():
    cfg = CAVMAEFTConfig(vit=TINY, label_dim=3)
    model = CAVMAEFinetune(cfg)
    rng = jax.random.PRNGKey(0)
    a = jax.random.normal(rng, (3, TINY.audio_length, TINY.mel_bins))
    v = jax.random.normal(rng, (3, 1, 3, TINY.img_size, TINY.img_size))
    y = jnp.zeros((3, 3)).at[:, 0].set(1.0)
    params = jax.jit(lambda r, a, v: model.init(r, a, v, "mm_grad", False))(
        rng, a, v)["params"]
    return model, params, a, v, y


def test_ft_touched_matches_autoderived():
    model, params, a, v, y = _model_and_params()

    def grad_for(branch):
        def loss(p):
            out, out_a, out_v = model.apply({"params": p}, a, v, "mm_grad",
                                            False)
            sel = {"av": out, "a": out_a, "v": out_v}[branch]
            return bce_with_logits(sel, y)
        return jax.grad(loss)(params)

    for branch in ("av", "a", "v"):
        grads = grad_for(branch)
        auto = traverse_util.flatten_dict(pg.derive_touched_mask(grads),
                                          sep="/")
        manual = traverse_util.flatten_dict(
            pg.mask_tree(params, lambda p: pg.ft_touched(p, branch)), sep="/")
        mism = {k: (auto[k], manual[k]) for k in auto if auto[k] != manual[k]}
        assert not mism, f"branch {branch}: {dict(list(mism.items())[:6])}"


def test_gated_adam_freezes_and_counts():
    cfg = OptimizerConfig(lr=1e-2)
    params = {"a": jnp.ones(4), "b": jnp.ones(4)}
    grads = {"a": jnp.full(4, 0.5), "b": jnp.full(4, 0.5)}
    lr = {"a": 1e-2, "b": 1e-2}
    st = gated_adam.init(params)
    gates = {"a": jnp.asarray(True), "b": jnp.asarray(False)}
    p1, st1 = gated_adam.update(cfg, grads, st, params, gates, lr)
    assert not np.allclose(p1["a"], params["a"])  # updated
    np.testing.assert_array_equal(np.asarray(p1["b"]), np.asarray(params["b"]))
    assert int(st1.count["a"]) == 1 and int(st1.count["b"]) == 0
    assert float(jnp.abs(st1.mu["b"]).max()) == 0.0

    # second step: now gate b on; its bias correction uses ITS OWN count=1
    gates2 = {"a": jnp.asarray(True), "b": jnp.asarray(True)}
    p2, st2 = gated_adam.update(cfg, grads, st1, p1, gates2, lr)
    assert int(st2.count["b"]) == 1 and int(st2.count["a"]) == 2
    # b's first update must equal a's first update (same grad/fresh state)
    da1 = np.asarray(params["a"] - p1["a"])
    db = np.asarray(p1["b"] - p2["b"])
    np.testing.assert_allclose(db, da1, rtol=1e-6)


def test_parity_finetune_step_runs():
    ft_cfg = FinetuneConfig(
        model=CAVMAEFTConfig(vit=TINY, label_dim=3),
        opt=OptimizerConfig(lr=1e-4), batch_size=3,
        parity_optimizer=True)
    model = CAVMAEFinetune(ft_cfg.model)
    rng = jax.random.PRNGKey(0)
    a = jax.random.normal(rng, (3, TINY.audio_length, TINY.mel_bins))
    v = jax.random.normal(rng, (3, 1, 3, TINY.img_size, TINY.img_size))
    y = jnp.zeros((3, 3)).at[:, 0].set(1.0)
    state = init_state(rng, model, ft_cfg, (a, v, y))
    step = make_finetune_step(model, ft_cfg)
    state, m = step(state, (a, v, y), rng, jnp.float32(1e-4))
    assert np.isfinite(float(m["loss"]))
    # dead head never updates
    flat = traverse_util.flatten_dict(state.opt.count, sep="/")
    assert int(flat["mlp_head_mm_v2/ln/ln/scale"]) == 0
    # exactly one of the three branch-exclusive heads got its count bumped
    bumped = [int(flat[k]) for k in ("mlp_head_mm/linear/kernel",
                                     "mlp_head_a/linear/kernel",
                                     "mlp_head/linear/kernel")]
    assert sum(bumped) == 1

"""Train-step tests: two-pass pretrain update, finetune routing, multichip
dryrun on the virtual CPU mesh, and the touched-param mask derivation."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from avsiam_tpu.configs import (CAVMAEConfig, CAVMAEFTConfig, DecoderConfig,
                                FinetuneConfig, MeshConfig, OptimizerConfig,
                                PretrainConfig, ViTConfig)
from avsiam_tpu.models import CAVMAEFinetune, CAVMAEPretrain
from avsiam_tpu.train import param_groups as pg
from avsiam_tpu.train.finetune import (FinetuneState, init_state as ft_init,
                                       make_finetune_step)
from avsiam_tpu.train.optim import multistep_lr_factor
from avsiam_tpu.train.pretrain import init_state, make_pretrain_step

TINY_VIT = ViTConfig(dim=32, depth=2, num_heads=2, patch_size=16,
                     img_size=64, audio_length=128, mel_bins=32)
TINY_DEC = DecoderConfig(dim=16, depth=1, num_heads=2)


def _pretrain_cfg(**kw):
    return PretrainConfig(
        model=CAVMAEConfig(vit=TINY_VIT, decoder=TINY_DEC),
        opt=OptimizerConfig(lr=1e-3), batch_size=6, **kw)


def test_pretrain_step_updates_params():
    cfg = _pretrain_cfg()
    model = CAVMAEPretrain(cfg.model)
    rng = jax.random.PRNGKey(0)
    B = cfg.batch_size
    a = jax.random.normal(rng, (B, TINY_VIT.audio_length, TINY_VIT.mel_bins))
    v = jax.random.normal(rng, (B, 3, TINY_VIT.img_size, TINY_VIT.img_size))
    state = init_state(rng, model, cfg, (a, v))
    before = jax.device_get(state.params["vit"]["blocks_0"]["attn"]["qkv"]["kernel"])
    dec_before = jax.device_get(state.params["decoder"]["pred_a"]["kernel"])
    step_fn = make_pretrain_step(model, cfg)
    state, metrics = step_fn(state, (a, v), rng, jnp.float32(1e-3))
    after = jax.device_get(state.params["vit"]["blocks_0"]["attn"]["qkv"]["kernel"])
    dec_after = jax.device_get(state.params["decoder"]["pred_a"]["kernel"])
    assert np.isfinite(metrics["loss"])
    assert not np.allclose(before, after)  # trunk moved (both passes)
    assert not np.allclose(dec_before, dec_after)  # decoder moved (MAE pass)
    # second step runs from donated state
    state, metrics = step_fn(state, (a, v), rng, jnp.float32(1e-3))
    assert np.isfinite(metrics["loss_c"])


def test_touched_masks_match_autoderived():
    """The hand-written path predicates must agree with the actual nonzero-
    gradient pattern of each pass (tiny model, full depth for name parity)."""
    vit = ViTConfig(dim=16, depth=3, num_heads=2, patch_size=16,
                    img_size=48, audio_length=64, mel_bins=32)
    cfg = CAVMAEConfig(vit=vit, decoder=DecoderConfig(dim=16, depth=2,
                                                      num_heads=2))
    model = CAVMAEPretrain(cfg)
    rng = jax.random.PRNGKey(0)
    B = 6
    a = jax.random.normal(rng, (B, vit.audio_length, vit.mel_bins))
    v = jax.random.normal(rng, (B, 3, vit.img_size, vit.img_size))
    params = model.init({"params": rng, "mask": rng, "perm": rng}, a, v)["params"]

    def run(mae_w, con_w):
        def loss(p):
            out = model.apply({"params": p}, a, v, 0.25, 0.25,
                              mae_loss_weight=mae_w, contrast_loss_weight=con_w,
                              rngs={"mask": jax.random.PRNGKey(1),
                                    "perm": jax.random.PRNGKey(2)})
            return out[0]
        return jax.grad(loss)(params)

    for (mae_w, con_w), predicate in [
        ((0.0, 1.0), pg.touched_contrastive),
        ((1.0, 0.0), pg.touched_mae),
    ]:
        grads = run(mae_w, con_w)
        auto = traverse_util.flatten_dict(
            pg.derive_touched_mask(grads), sep="/")
        manual = traverse_util.flatten_dict(
            pg.mask_tree(params, predicate), sep="/")
        mismatches = {k: (auto[k], manual[k]) for k in auto
                      if auto[k] != manual[k]}
        assert not mismatches, f"pass {(mae_w, con_w)}: {mismatches}"


def test_finetune_step_and_groups():
    cfg = FinetuneConfig(
        model=CAVMAEFTConfig(vit=TINY_VIT, label_dim=5),
        opt=OptimizerConfig(lr=1e-4), head_lr=10.0, mm_lr=10.0, batch_size=2)
    model = CAVMAEFinetune(cfg.model)
    rng = jax.random.PRNGKey(0)
    a = jax.random.normal(rng, (2, TINY_VIT.audio_length, TINY_VIT.mel_bins))
    v = jax.random.normal(rng, (2, 1, 3, TINY_VIT.img_size, TINY_VIT.img_size))
    y = jnp.zeros((2, 5)).at[:, 0].set(1.0)
    state = ft_init(rng, model, cfg, (a, v, y))
    step_fn = make_finetune_step(model, cfg)
    state, metrics = step_fn(state, (a, v, y), rng, jnp.float32(1e-4))
    assert np.isfinite(metrics["loss"])


def test_multistep_lr_factor():
    # start=10, step=5, gamma=0.5: epochs 1..10 full lr; 11..15 half; 16.. quarter
    for e, expected in [(1, 1.0), (10, 1.0), (11, 0.5), (15, 0.5),
                        (16, 0.25), (21, 0.125)]:
        assert multistep_lr_factor(e, 10, 5, 0.5) == expected


def test_dryrun_multichip_8dev():
    import __graft_entry__
    assert len(jax.devices()) == 8
    __graft_entry__.dryrun_multichip(8)


def test_flat_masked_adam_matches_optax_masked():
    """flat_masked_torch_adam (one [P]-vector Adam, train/optim.py) must be
    update-for-update identical to optax.masked(torch_adam) + apply, for
    several steps, including frozen moments on masked-out leaves."""
    import numpy as np
    import optax

    from avsiam_tpu.configs import OptimizerConfig
    from avsiam_tpu.train.optim import (flat_masked_torch_adam, torch_adam)

    cfg = OptimizerConfig(lr=1e-3, weight_decay=1e-2)
    rng = jax.random.PRNGKey(0)
    params = {
        "a": jax.random.normal(rng, (5, 4)),
        "b": {"w": jax.random.normal(jax.random.fold_in(rng, 1), (3,)),
              "frozen": jax.random.normal(jax.random.fold_in(rng, 2), (2, 2))},
    }
    mask = lambda p: {"a": True, "b": {"w": True, "frozen": False}}

    flat = flat_masked_torch_adam(cfg, mask)
    ref_tx = optax.masked(torch_adam(cfg), mask)

    p_flat, s_flat = params, flat.init(params)
    p_ref, s_ref = params, ref_tx.init(params)
    lr = 1e-3
    for i in range(5):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.sin(p + i), params)
        # masked-out leaves carry zero grads in the real step
        grads["b"]["frozen"] = jnp.zeros_like(grads["b"]["frozen"])
        p_flat, s_flat = flat.step(grads, s_flat, p_flat, lr)
        updates, s_ref = ref_tx.update(grads, s_ref, p_ref)
        p_ref = optax.apply_updates(
            p_ref, jax.tree_util.tree_map(lambda u: -lr * u, updates))
        for path in (("a",), ("b", "w"), ("b", "frozen")):
            a, b = p_flat, p_ref
            for k in path:
                a, b = a[k], b[k]
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-6,
                                       err_msg=f"step {i} {path}")
    # frozen leaf must be bit-unchanged from init
    np.testing.assert_array_equal(np.asarray(p_flat["b"]["frozen"]),
                                  np.asarray(params["b"]["frozen"]))

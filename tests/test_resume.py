"""Checkpoint/resume tests: train-state round-trip and loop resume."""

import json
import os

import jax
import numpy as np
import pytest

from avsiam_tpu.configs import (AudioConfig, CAVMAEConfig, DecoderConfig,
                                OptimizerConfig, PretrainConfig, ViTConfig)

TINY_VIT = ViTConfig(dim=32, depth=2, num_heads=2, patch_size=16,
                     img_size=32, audio_length=128, mel_bins=32)
TINY_AUDIO = AudioConfig(target_length=128, num_mel_bins=32)


@pytest.fixture
def index_json(tmp_path):
    data = {"data": [{"wav": f"/fake/{i}.wav", "labels": ""}
                     for i in range(8)]}
    p = tmp_path / "idx.json"
    p.write_text(json.dumps(data))
    return str(p)


def _cfg(tmp_path):
    return PretrainConfig(
        model=CAVMAEConfig(vit=TINY_VIT,
                           decoder=DecoderConfig(dim=16, depth=1,
                                                 num_heads=2)),
        audio=TINY_AUDIO, opt=OptimizerConfig(lr=1e-4), batch_size=4,
        n_epochs=2, n_print_steps=1, exp_dir=str(tmp_path / "exp"))


def test_train_state_roundtrip(tmp_path, index_json):
    import jax.numpy as jnp
    from avsiam_tpu.data.dataset import AVDataset
    from avsiam_tpu.models import CAVMAEPretrain
    from avsiam_tpu.train.pretrain import init_state
    from avsiam_tpu.utils.checkpoint import (restore_train_state,
                                             save_train_state)
    cfg = _cfg(tmp_path)
    model = CAVMAEPretrain(cfg.model)
    rng = jax.random.PRNGKey(0)
    a = jnp.zeros((2, TINY_VIT.audio_length, TINY_VIT.mel_bins))
    v = jnp.zeros((2, 3, TINY_VIT.img_size, TINY_VIT.img_size))
    state = init_state(rng, model, cfg, (a, v))
    state = state._replace(step=state.step + 7)
    save_train_state(cfg.exp_dir, "train_state.3", state)
    restored = restore_train_state(cfg.exp_dir, "train_state.3", state)
    assert int(restored.step) == 7
    np.testing.assert_allclose(
        np.asarray(restored.params["vit"]["pos_embed_a"]),
        np.asarray(state.params["vit"]["pos_embed_a"]))
    # optimizer moments restored too
    flat_a = jax.tree_util.tree_leaves(restored.opt1)
    flat_b = jax.tree_util.tree_leaves(state.opt1)
    assert len(flat_a) == len(flat_b)


def test_pretrain_resume_continues(tmp_path, index_json):
    from avsiam_tpu.data.dataset import AVDataset
    from avsiam_tpu.train.loops import run_pretrain
    cfg = _cfg(tmp_path)
    ds = AVDataset(index_json, TINY_AUDIO, n_class=3, mode="train",
                   frame_source="synthetic", im_res=32)
    # run epochs 1-2
    out1 = run_pretrain(cfg, ds, max_steps_per_epoch=1, log=lambda *a: None)
    assert os.path.exists(tmp_path / "exp" / "models" / "train_state.2")
    # default keep_train_states=1: epoch 1's resume state was pruned after
    # epoch 2's save (resume only reads the newest; ~2.9 GB each at ViT-B)
    assert not os.path.exists(tmp_path / "exp" / "models" / "train_state.1")
    # resume: no epochs left -> returns immediately with restored state AND
    # the restored history (a resumed run must append to result.csv, never
    # rewrite it from empty — that would erase the pre-crash epochs)
    out2 = run_pretrain(cfg, ds, max_steps_per_epoch=1, resume=True,
                        log=lambda *a: None)
    assert int(out2["state"].step) == int(out1["state"].step)
    assert [int(r["epoch"]) for r in out2["rows"]] == [1, 2]
    for got, ref in zip(out2["rows"], out1["rows"]):
        assert abs(got["loss"] - ref["loss"]) < 1e-4


def test_train_state_every_skips_intermediate_saves(tmp_path, index_json):
    from avsiam_tpu.configs import replace
    from avsiam_tpu.data.dataset import AVDataset
    from avsiam_tpu.train.loops import run_pretrain
    cfg = replace(_cfg(tmp_path), n_epochs=3, train_state_every=2,
                  keep_train_states=0)
    ds = AVDataset(index_json, TINY_AUDIO, n_class=3, mode="train",
                   frame_source="synthetic", im_res=32)
    run_pretrain(cfg, ds, max_steps_per_epoch=1, log=lambda *a: None)
    mdir = tmp_path / "exp" / "models"
    # epoch 2 matches the interval; the final epoch (3) is always saved so
    # --resume can restart from the end of the run; epoch 1 was skipped
    assert os.path.exists(mdir / "train_state.2")
    assert os.path.exists(mdir / "train_state.3")
    assert not os.path.exists(mdir / "train_state.1")


def test_prune_train_states(tmp_path):
    from avsiam_tpu.utils.checkpoint import prune_train_states
    mdir = tmp_path / "models"
    for e in (1, 2, 3, 10):
        (mdir / f"train_state.{e}").mkdir(parents=True)
    (mdir / "audio_model.3").mkdir()  # params saves are never pruned
    prune_train_states(str(tmp_path), keep=2)
    kept = sorted(os.listdir(mdir))
    assert kept == ["audio_model.3", "train_state.10", "train_state.3"]
    # keep <= 0 disables pruning; keep larger than available is a no-op
    prune_train_states(str(tmp_path), keep=0)
    prune_train_states(str(tmp_path), keep=5)
    assert sorted(os.listdir(mdir)) == kept

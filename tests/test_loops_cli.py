"""Smoke tests for the training loops and CLI runners on tiny synthetic data.

These drive the same code paths as the recipe scripts: pretrain 1 epoch with
checkpointing + validation, finetune 1 epoch with mAP eval + best checkpoint,
retrieval CLI, and a linear probe pass.
"""

import json
import os

import numpy as np
import pytest

from avsiam_tpu.configs import (AudioConfig, CAVMAEConfig, CAVMAEFTConfig,
                                DecoderConfig, FinetuneConfig,
                                OptimizerConfig, PretrainConfig, ViTConfig)

TINY_VIT = ViTConfig(dim=32, depth=2, num_heads=2, patch_size=16,
                     img_size=32, audio_length=128, mel_bins=32)
TINY_DEC = DecoderConfig(dim=16, depth=1, num_heads=2)
TINY_AUDIO = AudioConfig(target_length=8, sample_rate=1600,
                         frame_length_ms=25.0, frame_shift_ms=10.0)
# audio_length tokens: fbank target 8 frames is too small for the model's
# 128-frame expectation -> use target_length matching vit.audio_length
TINY_AUDIO = AudioConfig(target_length=TINY_VIT.audio_length,
                         num_mel_bins=TINY_VIT.mel_bins, sample_rate=16000)


@pytest.fixture
def index_json(tmp_path):
    data = {"data": [{"wav": f"/fake/{i}.wav", "labels": "/m/0" if i % 2 else "/m/1"}
                     for i in range(8)]}
    p = tmp_path / "idx.json"
    p.write_text(json.dumps(data))
    csvp = tmp_path / "labels.csv"
    csvp.write_text("index,mid,display_name\n0,/m/0,a\n1,/m/1,b\n2,/m/2,c\n")
    return str(p), str(csvp)


def _ds(index_json, train=True, audio=TINY_AUDIO):
    from avsiam_tpu.data.dataset import AVDataset
    path, csvp = index_json
    return AVDataset(path, audio, label_csv=csvp, mode="train" if train
                     else "eval", frame_source="synthetic",
                     im_res=TINY_VIT.img_size, num_frames=3)


def test_run_pretrain_epoch(tmp_path, index_json):
    from avsiam_tpu.train.loops import run_pretrain
    cfg = PretrainConfig(
        model=CAVMAEConfig(vit=TINY_VIT, decoder=TINY_DEC),
        audio=TINY_AUDIO, opt=OptimizerConfig(lr=1e-4), batch_size=4,
        n_epochs=2, n_print_steps=1, exp_dir=str(tmp_path / "exp"))
    out = run_pretrain(cfg, _ds(index_json), _ds(index_json, train=False),
                       max_steps_per_epoch=2, log=lambda *a: None)
    assert not out.get("diverged")
    assert os.path.exists(tmp_path / "exp" / "models" / "audio_model.1")
    assert os.path.exists(tmp_path / "exp" / "models" / "best_audio_model")
    assert os.path.exists(tmp_path / "exp" / "result.csv")
    assert len(out["rows"]) == 2
    assert "eval_loss" in out["rows"][0]


def test_run_finetune_epoch_and_probe(tmp_path, index_json):
    from avsiam_tpu.train.loops import linear_probe, run_finetune
    cfg = FinetuneConfig(
        model=CAVMAEFTConfig(vit=TINY_VIT, label_dim=3, num_eval_frames=3),
        audio=TINY_AUDIO, opt=OptimizerConfig(lr=1e-4), batch_size=4,
        n_epochs=1, n_print_steps=1, exp_dir=str(tmp_path / "ft"))
    out = run_finetune(cfg, _ds(index_json), _ds(index_json, train=False),
                       max_steps_per_epoch=2, log=lambda *a: None)
    assert not out.get("diverged")
    assert "mAP" in out["rows"][0]
    assert os.path.exists(tmp_path / "ft" / "stats_1.pickle")

    # linear probe from a pretrain state
    pre_cfg = PretrainConfig(
        model=CAVMAEConfig(vit=TINY_VIT, decoder=TINY_DEC),
        audio=TINY_AUDIO, opt=OptimizerConfig(lr=1e-4), batch_size=4,
        n_epochs=1, exp_dir=str(tmp_path / "pre"))
    import jax
    import jax.numpy as jnp
    from avsiam_tpu.models import CAVMAEPretrain
    model = CAVMAEPretrain(pre_cfg.model)
    rng = jax.random.PRNGKey(0)
    a = jnp.zeros((2, TINY_VIT.audio_length, TINY_VIT.mel_bins))
    v = jnp.zeros((2, 3, TINY_VIT.img_size, TINY_VIT.img_size))
    pre_params = jax.jit(model.init)(
        {"params": rng, "mask": rng, "perm": rng}, a, v)["params"]
    res = linear_probe(pre_params, pre_cfg, _ds(index_json),
                       _ds(index_json, train=False), n_class=3, epochs=1,
                       max_steps_per_epoch=1, log=lambda *a: None)
    assert "mm_grad_mAP" in res and np.isfinite(res["mm_grad_mAP"])


def test_cli_pretrain_smoke(tmp_path, index_json):
    from avsiam_tpu.cli.pretrain import main
    path, csvp = index_json
    out = main([
        "--data-train", path, "--data-val", path, "--label-csv", csvp,
        "--n_class", "3", "--model", "tiny",
        "--n-epochs", "1", "--batch-size", "4", "--frame_source", "synthetic",
        "--max_steps_per_epoch", "1", "--exp-dir", str(tmp_path / "exp"),
        "--dtype", "float32", "--target_length", "128"])
    assert os.path.exists(tmp_path / "exp" / "args.json")
    assert os.path.exists(tmp_path / "exp" / "result.csv")
    assert os.path.exists(tmp_path / "exp" / "models" / "audio_model.1")


def test_cli_finetune_smoke(tmp_path, index_json):
    from avsiam_tpu.cli.finetune import main
    path, csvp = index_json
    out = main([
        "--data_train", path, "--data_val", path, "--label_csv", csvp,
        "--n_class", "3", "--model", "tiny",
        "--n_epochs", "1", "--batch_size", "4", "--frame_source", "synthetic",
        "--max_steps_per_epoch", "1", "--exp_dir", str(tmp_path / "ft"),
        "--dtype", "float32", "--target_length", "128"])
    assert os.path.exists(tmp_path / "ft" / "result.csv")
    assert out["rows"] and "mAP" in out["rows"][0]


def test_cli_retrieval_smoke(tmp_path, index_json):
    from avsiam_tpu.cli.retrieval import main
    path, csvp = index_json
    rows = main([
        "--data-eval", path, "--label-csv", csvp, "--n_class", "3",
        "--model", "tiny", "--batch-size", "4", "--frame_source", "synthetic",
        "--exp-dir", str(tmp_path / "ret"), "--dtype", "float32",
        "--target_length", "128", "--directions", "audio,video"])
    assert os.path.exists(tmp_path / "ret" / "retrieval_result.csv")
    assert {r["direction"] for r in rows} == {"audio", "video"}


@pytest.mark.parametrize("direction", ["audio"])
def test_retrieval_metrics_pipeline(tmp_path, index_json, direction):
    from avsiam_tpu.eval.retrieval import retrieval_metrics
    rng = np.random.RandomState(0)
    f = rng.randn(6, 16)
    m = retrieval_metrics(f, f, direction)
    assert m["R1"] == 1.0

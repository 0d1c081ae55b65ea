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
# target_length must match vit.audio_length (the fbank frame count feeds
# the model's audio token grid)
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


def test_run_pretrain_val_interval(tmp_path, index_json):
    """--val_interval N: eval/best-tracking only on epochs N, 2N, ... and
    the final epoch; skipped epochs still log train meters (result.csv rows
    without eval_* columns) and the CSV survives a read-back round trip."""
    from avsiam_tpu.train.loops import _read_csv, run_pretrain
    cfg = PretrainConfig(
        model=CAVMAEConfig(vit=TINY_VIT, decoder=TINY_DEC),
        audio=TINY_AUDIO, opt=OptimizerConfig(lr=1e-4), batch_size=4,
        n_epochs=3, n_print_steps=1, exp_dir=str(tmp_path / "exp"),
        save_model=False, val_interval=2)
    out = run_pretrain(cfg, _ds(index_json), _ds(index_json, train=False),
                       max_steps_per_epoch=1, log=lambda *a: None)
    rows = out["rows"]
    assert [("eval_loss" in r) for r in rows] == [False, True, True]
    # epoch 3 validated because it is the final epoch, not a multiple of 2
    assert os.path.exists(tmp_path / "exp" / "models" / "best_audio_model")
    disk = _read_csv(str(tmp_path / "exp" / "result.csv"))
    assert [("eval_loss" in r) for r in disk] == [False, True, True]
    assert [r["epoch"] for r in disk] == [1, 2, 3]


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
    # reference probe evaluates joint_av (traintest_cavmae_base.py:343-354)
    assert "joint_av_mAP" in res and np.isfinite(res["joint_av_mAP"])
    assert "audioonly_mAP" in res and "videoonly_mAP" in res


def test_cli_pretrain_smoke(tmp_path, index_json):
    # batch 8: the CLI now builds a mesh over all (8 virtual) devices by
    # default, and the global batch must divide the mesh 'data' axis
    from avsiam_tpu.cli.pretrain import main
    path, csvp = index_json
    out = main([
        "--data-train", path, "--data-val", path, "--label-csv", csvp,
        "--n_class", "3", "--model", "tiny",
        "--n-epochs", "1", "--batch-size", "8", "--frame_source", "synthetic",
        "--max_steps_per_epoch", "1", "--exp-dir", str(tmp_path / "exp"),
        "--dtype", "float32", "--target_length", "128"])
    assert os.path.exists(tmp_path / "exp" / "args.json")
    assert os.path.exists(tmp_path / "exp" / "result.csv")
    assert os.path.exists(tmp_path / "exp" / "models" / "audio_model.1")


def test_cli_pretrain_sharded_matches_unsharded(tmp_path, index_json):
    """The default-sharded CLI run (mesh data=8) must reproduce the
    single-device run's losses: GSPMD sharding is a layout choice, not a
    numerics change (reference DP parity, traintest_cavmae_base.py:59)."""
    from avsiam_tpu.cli.pretrain import main
    path, csvp = index_json
    common = [
        "--data-train", path, "--data-val", path, "--label-csv", csvp,
        "--n_class", "3", "--model", "tiny",
        "--n-epochs", "1", "--batch-size", "8", "--frame_source", "synthetic",
        "--max_steps_per_epoch", "2",
        "--dtype", "float32", "--target_length", "128", "--n-print-steps", "1"]
    out8 = main(common + ["--exp-dir", str(tmp_path / "d8"),
                          "--mesh_data", "8"])
    out1 = main(common + ["--exp-dir", str(tmp_path / "d1"),
                          "--mesh_data", "1", "--mesh_model", "1"])
    r8, r1 = out8["rows"][0], out1["rows"][0]
    for k in ("loss", "loss_c", "eval_loss"):
        np.testing.assert_allclose(r8[k], r1[k], rtol=2e-4, err_msg=k)


def test_cli_pretrain_timm_init(tmp_path, index_json):
    """--pretrain_path with a torch timm-format trunk must start training
    from the surgery output (cav_mae_base.py:236-303): with lr=0, the saved
    epoch-1 audio patch embed equals the RGB-channel mean of the checkpoint's
    video patch embed."""
    import torch

    from avsiam_tpu.cli.pretrain import main
    path, csvp = index_json
    D = TINY_VIT.dim
    torch.manual_seed(0)
    sd = {"patch_embed.proj.weight": torch.randn(D, 3, 16, 16),
          "patch_embed.proj.bias": torch.randn(D),
          "pos_embed": torch.randn(1, 1 + TINY_VIT.num_video_tokens, D),
          "cls_token": torch.randn(1, 1, D),
          "norm.weight": torch.randn(D), "norm.bias": torch.randn(D)}
    for i in range(TINY_VIT.depth):
        p = f"blocks.{i}"
        for n in ("norm1", "norm2"):
            sd[f"{p}.{n}.weight"] = torch.randn(D)
            sd[f"{p}.{n}.bias"] = torch.randn(D)
        sd[f"{p}.attn.qkv.weight"] = torch.randn(3 * D, D)
        sd[f"{p}.attn.qkv.bias"] = torch.randn(3 * D)
        sd[f"{p}.attn.proj.weight"] = torch.randn(D, D)
        sd[f"{p}.attn.proj.bias"] = torch.randn(D)
        sd[f"{p}.mlp.fc1.weight"] = torch.randn(4 * D, D)
        sd[f"{p}.mlp.fc1.bias"] = torch.randn(4 * D)
        sd[f"{p}.mlp.fc2.weight"] = torch.randn(D, 4 * D)
        sd[f"{p}.mlp.fc2.bias"] = torch.randn(D)
    ckpt = str(tmp_path / "timm_tiny.pth")
    torch.save(sd, ckpt)

    out = main([
        "--data-train", path, "--label-csv", csvp, "--n_class", "3",
        "--model", "tiny", "--n-epochs", "1", "--batch-size", "8",
        "--frame_source", "synthetic", "--max_steps_per_epoch", "1",
        "--exp-dir", str(tmp_path / "exp"), "--dtype", "float32",
        "--target_length", "128", "--lr", "0.0", "--pretrain_path", ckpt])
    params = jax_device_get_params(out["state"].params)
    w = sd["patch_embed.proj.weight"].numpy()
    expected = w.mean(axis=1).transpose(1, 2, 0).reshape(-1, D)
    np.testing.assert_allclose(
        np.asarray(params["vit"]["patch_embed_a"]["proj"]["kernel"]),
        expected, atol=1e-6)
    # ast trunk is the deepcopy of the surgically-initialized vit trunk
    np.testing.assert_allclose(
        np.asarray(params["ast"]["patch_embed"]["proj"]["kernel"]),
        np.asarray(params["vit"]["patch_embed"]["proj"]["kernel"]), atol=1e-6)


def jax_device_get_params(params):
    import jax
    return jax.device_get(params)


def test_nan_divergence_abort(tmp_path, index_json, monkeypatch):
    """A NaN loss must abort within one print window (reference checks the
    meter every step, traintest_cavmae_base.py:184-186; here the NaN poisons
    the on-device window sum)."""
    import jax.numpy as jnp

    from avsiam_tpu.train import pretrain as pt
    from avsiam_tpu.train.loops import run_pretrain
    real = pt.make_pretrain_step

    def nan_step(model, cfg):
        fn = real(model, cfg)

        def wrapped(state, batch, rng, lr):
            state, metrics = fn(state, batch, rng, lr)
            metrics = dict(metrics)
            metrics["loss"] = metrics["loss"] * jnp.nan
            return state, metrics

        return wrapped

    monkeypatch.setattr(pt, "make_pretrain_step", nan_step)
    cfg = PretrainConfig(model=CAVMAEConfig(vit=TINY_VIT, decoder=TINY_DEC),
                         audio=TINY_AUDIO, opt=OptimizerConfig(lr=1e-4),
                         batch_size=4, n_epochs=1, n_print_steps=2,
                         exp_dir=str(tmp_path / "exp"))
    out = run_pretrain(cfg, _ds(index_json), max_steps_per_epoch=2,
                       log=lambda *a: None)
    assert out.get("diverged") is True


def test_meters_cover_every_step(tmp_path, index_json, monkeypatch):
    """result.csv epoch averages must cover EVERY step, not just print
    steps: with loss forced to the step counter (0, 1, 2) and a print cadence
    longer than the epoch, the epoch average is exactly 1.0."""
    import jax.numpy as jnp

    from avsiam_tpu.train import pretrain as pt
    from avsiam_tpu.train.loops import run_pretrain
    real = pt.make_pretrain_step

    def counting_step(model, cfg):
        fn = real(model, cfg)

        def wrapped(state, batch, rng, lr):
            # input state is donated by the jitted step; recover the step
            # counter from the returned state (new step = old step + 1)
            state, metrics = fn(state, batch, rng, lr)
            metrics = dict(metrics)
            metrics["loss"] = (state.step - 1).astype(jnp.float32)
            return state, metrics

        return wrapped

    monkeypatch.setattr(pt, "make_pretrain_step", counting_step)
    cfg = PretrainConfig(model=CAVMAEConfig(vit=TINY_VIT, decoder=TINY_DEC),
                         audio=TINY_AUDIO, opt=OptimizerConfig(lr=1e-4),
                         batch_size=2, n_epochs=1, n_print_steps=1000,
                         exp_dir=str(tmp_path / "exp"))
    out = run_pretrain(cfg, _ds(index_json), max_steps_per_epoch=3,
                       log=lambda *a: None)
    np.testing.assert_allclose(out["rows"][0]["loss"], 1.0, atol=1e-6)


def test_ft_meters_cover_every_step(tmp_path, index_json, monkeypatch):
    """FT result.csv epoch averages must cover EVERY step and carry the
    per-sample total/data/DNN timing columns (traintest_ft_base.py:117-147
    meters the same split as the pretrain loop)."""
    import jax.numpy as jnp

    from avsiam_tpu.train import finetune as ftmod
    from avsiam_tpu.train.loops import run_finetune
    real = ftmod.make_finetune_step

    def counting_step(model, cfg):
        fn = real(model, cfg)

        def wrapped(state, batch, rng, lr):
            state, metrics = fn(state, batch, rng, lr)
            metrics = dict(metrics)
            metrics["loss"] = (state.step - 1).astype(jnp.float32)
            return state, metrics

        return wrapped

    monkeypatch.setattr(ftmod, "make_finetune_step", counting_step)
    cfg = FinetuneConfig(
        model=CAVMAEFTConfig(vit=TINY_VIT, label_dim=3, num_eval_frames=1),
        audio=TINY_AUDIO, opt=OptimizerConfig(lr=1e-4), batch_size=2,
        n_epochs=1, n_print_steps=1000, exp_dir=str(tmp_path / "ft"))
    out = run_finetune(cfg, _ds(index_json), max_steps_per_epoch=3,
                       log=lambda *a: None)
    row = out["rows"][0]
    np.testing.assert_allclose(row["train_loss"], 1.0, atol=1e-6)
    for k in ("per_sample_time", "per_sample_data_time",
              "per_sample_dnn_time"):
        assert k in row and row[k] >= 0.0
    assert row["per_sample_time"] >= row["per_sample_dnn_time"]


def test_cli_finetune_smoke(tmp_path, index_json):
    from avsiam_tpu.cli.finetune import main
    path, csvp = index_json
    out = main([
        "--data_train", path, "--data_val", path, "--label_csv", csvp,
        "--n_class", "3", "--model", "tiny",
        "--n_epochs", "1", "--batch_size", "8", "--frame_source", "synthetic",
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


def test_run_pretrain_balanced_sampling(tmp_path, index_json):
    """The pretrain loop accepts per-sample balance weights (the reference
    pretrain runner's DistributedProxySampler path when bal=='bal',
    run_cavmae_pretrain_base.py:128): heavily weighting a subset must still
    produce a finite, checkpointed run."""
    import numpy as np
    from avsiam_tpu.train.loops import run_pretrain
    cfg = PretrainConfig(
        model=CAVMAEConfig(vit=TINY_VIT, decoder=TINY_DEC),
        audio=TINY_AUDIO, opt=OptimizerConfig(lr=1e-4), batch_size=4,
        n_epochs=1, n_print_steps=1, exp_dir=str(tmp_path / "bal"))
    w = np.ones(8); w[:2] = 100.0
    out = run_pretrain(cfg, _ds(index_json), balance_weights=w,
                       max_steps_per_epoch=2, log=lambda *a: None)
    assert not out.get("diverged")
    assert os.path.exists(tmp_path / "bal" / "models" / "audio_model.1")


def test_balance_weights_from_args_validates_length(tmp_path):
    """--bal bal weight files must cover the train index exactly: short
    files silently zero the tail's sampling probability, long ones draw
    out-of-range indices mid-epoch (run_cavmae_ft_base.py:184-200 loads the
    CSV unconditionally whenever bal is set)."""
    import argparse
    from avsiam_tpu.cli.common import balance_weights_from_args
    wf = tmp_path / "w.csv"
    wf.write_text("\n".join(["1.0"] * 8))
    ns = argparse.Namespace(bal="bal", weight_file=str(wf))
    w = balance_weights_from_args(ns, 8)
    assert w is not None and len(w) == 8
    with pytest.raises(SystemExit):
        balance_weights_from_args(ns, 6)   # file longer than the index
    with pytest.raises(SystemExit):
        balance_weights_from_args(ns, 10)  # file shorter than the index
    with pytest.raises(SystemExit):
        balance_weights_from_args(
            argparse.Namespace(bal="bal", weight_file=None), 8)
    # the recipes' literal "None" string must NOT activate weighting
    assert balance_weights_from_args(
        argparse.Namespace(bal="None", weight_file=None), 8) is None


def test_wa_without_save_model_fails_fast(tmp_path, index_json):
    """--wa averages the per-epoch audio_model.{e} checkpoints that
    --save_model False never writes; that contradiction must fail before
    training, not after n_epochs of compute."""
    from avsiam_tpu.train.loops import run_finetune
    cfg = FinetuneConfig(
        model=CAVMAEFTConfig(vit=TINY_VIT, label_dim=3, num_eval_frames=3),
        audio=TINY_AUDIO, opt=OptimizerConfig(lr=1e-4), batch_size=4,
        n_epochs=1, save_model=False, exp_dir=str(tmp_path / "wa"))
    with pytest.raises(ValueError, match="save_model"):
        run_finetune(cfg, _ds(index_json), wa=True, log=lambda *a: None)


def test_early_stop_saves_final_train_state(tmp_path, index_json,
                                            monkeypatch):
    """Early stop must uphold the '--train_state_every: final epoch always
    saved' resume guarantee even when the stop epoch isn't on the periodic
    schedule (a later --resume would otherwise silently redo epochs)."""
    import avsiam_tpu.train.loops as loops
    # constant metric -> epoch 1 improves from -inf, 2-4 don't -> stop at 4
    monkeypatch.setattr(
        loops, "validate_ft",
        lambda *a, **k: ([{"AP": 0.5, "auc": 0.5, "acc": 0.5}], 0.1))
    cfg = FinetuneConfig(
        model=CAVMAEFTConfig(vit=TINY_VIT, label_dim=3, num_eval_frames=3),
        audio=TINY_AUDIO, opt=OptimizerConfig(lr=1e-4), batch_size=4,
        n_epochs=8, train_state_every=10, n_print_steps=100,
        exp_dir=str(tmp_path / "es"))
    out = loops.run_finetune(cfg, _ds(index_json),
                             _ds(index_json, train=False),
                             max_steps_per_epoch=1, log=lambda *a: None)
    assert max(int(r["epoch"]) for r in out["rows"]) == 4  # early-stopped
    assert os.path.exists(tmp_path / "es" / "models" / "train_state.4")

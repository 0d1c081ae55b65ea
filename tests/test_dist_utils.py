"""Tests for distributed helpers, logging, profiling utils."""

import json
import os

import jax
import numpy as np

from avsiam_tpu.parallel.dist import (barrier, gather_eval_outputs,
                                      initialize_multihost, is_main_process)
from avsiam_tpu.utils.logging import MetricsLogger
from avsiam_tpu.utils.profiling import StepTimer, device_memory_stats


def test_singlehost_dist_helpers():
    info = initialize_multihost()
    assert info["process_count"] == 1
    assert is_main_process()
    barrier()  # no-op single host
    x = np.arange(12).reshape(6, 2)
    out = gather_eval_outputs(x, total=5)
    np.testing.assert_array_equal(out, x[:5])


def test_metrics_logger(tmp_path):
    lg = MetricsLogger(str(tmp_path), enable_wandb=False)
    lg.log({"loss": 1.5}, step=1)
    lg.log({"loss": 1.2}, step=2)
    lg.close()
    rows = [json.loads(l) for l in
            open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert rows[0]["loss"] == 1.5 and rows[1]["step"] == 2


def test_step_timer():
    t = StepTimer()
    t.data_ready(4)
    t.step_done(4)
    s = t.summary()
    assert s["per_sample_time"] >= s["per_sample_dnn_time"] >= 0


def test_memory_stats_shape():
    stats = device_memory_stats()
    assert stats is None or "bytes_in_use" in stats


def test_memory_probe_cli_tiny():
    from avsiam_tpu.cli.memory_probe import main
    out = main(["--model", "tiny", "--batch-size", "2", "--steps", "1",
                "--dtype", "float32"])
    assert out["params_million"] > 0
    assert out["optimizer_state_million"] > 0


def test_loops_write_metrics_jsonl(tmp_path):
    """run_pretrain emits a metrics.jsonl stream via MetricsLogger."""
    import json as _json
    from avsiam_tpu.configs import (AudioConfig, CAVMAEConfig, DecoderConfig,
                                    OptimizerConfig, PretrainConfig, ViTConfig)
    from avsiam_tpu.data.dataset import AVDataset
    from avsiam_tpu.train.loops import run_pretrain
    vit = ViTConfig(dim=32, depth=2, num_heads=2, patch_size=16, img_size=32,
                    audio_length=128, mel_bins=32)
    audio = AudioConfig(target_length=128, num_mel_bins=32)
    cfg = PretrainConfig(
        model=CAVMAEConfig(vit=vit, decoder=DecoderConfig(dim=16, depth=1,
                                                          num_heads=2)),
        audio=audio, opt=OptimizerConfig(lr=1e-4), batch_size=4, n_epochs=1,
        n_print_steps=1, exp_dir=str(tmp_path / "exp"))
    idx = tmp_path / "idx.json"
    idx.write_text(_json.dumps(
        {"data": [{"wav": f"/s/{i}.wav", "labels": ""} for i in range(4)]}))
    ds = AVDataset(str(idx), audio, n_class=3, mode="train",
                   frame_source="synthetic", im_res=32)
    run_pretrain(cfg, ds, max_steps_per_epoch=1, log=lambda *a: None)
    lines = open(tmp_path / "exp" / "metrics.jsonl").read().splitlines()
    rows = [_json.loads(l) for l in lines]
    assert any("loss" in r for r in rows)
    assert any("epoch" in r for r in rows)

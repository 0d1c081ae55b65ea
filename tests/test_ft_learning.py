"""End-to-end LEARNING test for the finetune system.

The contrastive-overfit soak covers pretrain numerics; this covers finetune
as a SYSTEM: a tiny synthetic but perfectly separable AV dataset (class k <->
pure audio tone at a class frequency + solid class-colored frames) must be
driven to high mAP by the real ``run_finetune`` loop — stochastic mm_grad
loss routing (traintest_ft_base.py:149-157), 3-group Adam, multi-frame eval
gather, best-checkpoint selection — within a few CPU epochs.
"""

import json
import os

import numpy as np
import pytest

from avsiam_tpu.configs import (AudioConfig, CAVMAEFTConfig, FinetuneConfig,
                                OptimizerConfig, ViTConfig)
from avsiam_tpu.data.dataset import AVDataset

VIT = ViTConfig(dim=32, depth=2, num_heads=2, patch_size=16, img_size=32,
                audio_length=128, mel_bins=32)
AUDIO = AudioConfig(target_length=VIT.audio_length, num_mel_bins=VIT.mel_bins,
                    sample_rate=16000)
N_CLASS = 3
COLORS = np.array([[255, 40, 40], [40, 255, 40], [40, 40, 255]],
                  dtype=np.uint8)


class SeparableAVDataset(AVDataset):
    """Class k: audio = sine at 300*(k+1) Hz, frames = solid COLORS[k]."""

    def _class_of(self, rec) -> int:
        return int(rec.labels.rsplit("/m/", 1)[1])

    def _load_waveform(self, rec):
        k = self._class_of(rec)
        t = np.arange(self.num_samples_audio, dtype=np.float32)
        w = 0.5 * np.sin(2.0 * np.pi * 300.0 * (k + 1) * t
                         / self.audio_conf.sample_rate)
        return w.astype(np.float32), self.num_samples_audio

    def _load_frames(self, rec, rng):
        k = self._class_of(rec)
        return np.tile(COLORS[k],
                       (self.num_frames, self.im_res, self.im_res, 1))


@pytest.fixture
def separable(tmp_path):
    n = 24
    data = {"data": [{"wav": f"/synth/{i}.wav", "labels": f"/m/{i % N_CLASS}"}
                     for i in range(n)]}
    p = tmp_path / "idx.json"
    p.write_text(json.dumps(data))
    csvp = tmp_path / "labels.csv"
    csvp.write_text("index,mid,display_name\n" + "".join(
        f"{k},/m/{k},c{k}\n" for k in range(N_CLASS)))

    def make(mode):
        return SeparableAVDataset(str(p), AUDIO, label_csv=str(csvp),
                                  mode=mode, frame_source="synthetic",
                                  im_res=VIT.img_size, num_frames=3)

    return make("train"), make("eval")


def test_finetune_learns_separable_av(tmp_path, separable):
    train_ds, val_ds = separable
    from avsiam_tpu.train.loops import run_finetune
    cfg = FinetuneConfig(
        model=CAVMAEFTConfig(vit=VIT, label_dim=N_CLASS, num_eval_frames=3),
        audio=AUDIO, opt=OptimizerConfig(lr=2e-3), head_lr=5.0, mm_lr=5.0,
        batch_size=8, n_epochs=6, n_print_steps=100,
        exp_dir=str(tmp_path / "ft"), loss="BCE", metrics="mAP", seed=87)
    out = run_finetune(cfg, train_ds, val_ds, log=lambda *a: None)
    assert not out.get("diverged")
    assert out["best"] >= 0.95, (
        f"finetune failed to learn a separable AV task: best mAP "
        f"{out['best']:.3f}; rows={out['rows']}")
    # best checkpoint was written by the best-epoch tracking
    assert os.path.isdir(tmp_path / "ft" / "models" / "best_audio_model")

"""End-to-end pipeline over REAL on-disk media: PCM16 WAVs + JPEG frame
directories in the reference layout (frame_{i}/{video_id}.jpg), through the
native WAV parser, PIL, the device transform, and a finetune step."""

import json
import os
import wave

import jax
import numpy as np
import pytest
from PIL import Image

from avsiam_tpu.configs import (AudioConfig, CAVMAEFTConfig, FinetuneConfig,
                                OptimizerConfig, ViTConfig)

TINY = ViTConfig(dim=32, depth=2, num_heads=2, patch_size=16, img_size=32,
                 audio_length=128, mel_bins=32)
AUDIO = AudioConfig(target_length=128, num_mel_bins=32)


@pytest.fixture
def media_dataset(tmp_path):
    frames_root = tmp_path / "frames"
    records = []
    rng = np.random.RandomState(0)
    # target 128 frames at 16 kHz -> dataset wants ~20,800 samples; make one
    # clip longer (crop path) and one shorter (zero-row pad path)
    for i, n_samples in enumerate([30000, 9000, 30000, 9000]):
        wav_path = tmp_path / f"clip{i}.wav"
        x = (0.3 * np.sin(2 * np.pi * (200 + 100 * i)
                          * np.arange(n_samples) / 16000)).astype(np.float32)
        with wave.open(str(wav_path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((x * 32767).astype("<i2").tobytes())
        # frames 0..2 exist; 3..9 missing -> walk-down retry must kick in
        for t in range(3):
            d = frames_root / f"frame_{t}"
            d.mkdir(parents=True, exist_ok=True)
            img = rng.randint(0, 255, (48, 48, 3), dtype=np.uint8)
            Image.fromarray(img).save(d / f"v{i}.jpg")
        records.append({"wav": str(wav_path), "labels": "/m/0" if i % 2
                        else "/m/1", "video_id": f"v{i}",
                        "video_path": str(frames_root)})
    idx = tmp_path / "idx.json"
    idx.write_text(json.dumps({"data": records}))
    csvp = tmp_path / "labels.csv"
    csvp.write_text("index,mid,display_name\n0,/m/0,a\n1,/m/1,b\n")
    return str(idx), str(csvp)


def test_audio_from_mp4(tmp_path):
    """FT audio-from-video-container path (dataloader_ft.py:272-278): the
    waveform is extracted from the .mp4 itself, resampled to 16 kHz, mono.
    Gated on ffmpeg (used for both generation and decode)."""
    import json
    import subprocess

    from avsiam_tpu.data import media
    if not media.have_ffmpeg():
        pytest.skip("ffmpeg not available on this host")
    mp4 = str(tmp_path / "clip.mp4")
    subprocess.run(
        ["ffmpeg", "-v", "error", "-f", "lavfi",
         "-i", "sine=frequency=440:sample_rate=44100:duration=1",
         "-f", "lavfi", "-i", "color=c=red:s=64x64:d=1:r=10",
         "-shortest", mp4], check=True)
    w = media.decode_audio(mp4, 16000)
    assert 15000 < len(w) < 17000  # ~1 s at 16 kHz after resample
    assert np.abs(w).max() > 0.1  # a real sine, not silence

    # and the dataset routes .mp4 records through it
    from avsiam_tpu.data.dataset import AVDataset
    idx = tmp_path / "idx.json"
    idx.write_text(json.dumps({"data": [{"wav": mp4, "labels": "/m/0",
                                         "video_id": "clip",
                                         "video_path": mp4}]}))
    csvp = tmp_path / "labels.csv"
    csvp.write_text("index,mid,display_name\n0,/m/0,a\n")
    ds = AVDataset(str(idx), AUDIO, label_csv=csvp, mode="train",
                   frame_source="video", im_res=TINY.img_size, num_frames=10)
    wav, wav_len = ds._load_waveform(ds.index[0])
    assert wav_len == min(len(w), ds.num_samples_audio)
    assert np.isfinite(wav).all() and np.abs(wav).max() > 0.1


def test_real_media_to_finetune_step(media_dataset):
    from avsiam_tpu.data import native_dsp
    from avsiam_tpu.data.dataset import AVDataset, make_train_transform
    from avsiam_tpu.models import CAVMAEFinetune
    from avsiam_tpu.train.finetune import init_state, make_finetune_step

    native_dsp.build()  # exercise the native WAV parser when it builds
    idx, csvp = media_dataset
    ds = AVDataset(idx, AUDIO, label_csv=csvp, mode="train",
                   frame_source="frames", im_res=TINY.img_size, num_frames=10)
    rng = np.random.RandomState(0)
    wav, frames, labels, wav_len = ds.batch([0, 1, 2, 3], rng)
    # long clip filled the buffer; short clip kept its true length
    assert wav_len[0] == ds.num_samples_audio
    assert wav_len[1] == 9000
    # frames beyond frame_2 resolved via walk-down (all frames exist & valid)
    assert frames.shape == (4, 1, TINY.img_size, TINY.img_size, 3)
    assert frames.max() > 0

    transform = make_train_transform(AUDIO, im_res=TINY.img_size)
    fb, img, y = transform(jax.random.PRNGKey(0), wav, frames, labels,
                           wav_len)
    fb = np.asarray(fb)
    assert np.isfinite(fb).all()
    # short clip: rows past its true frame count are the normalized-zero
    # constant (0 - mean)/std
    from avsiam_tpu.ops.fbank import num_frames_for
    n_valid = num_frames_for(9000, 16000)
    pad_val = (0.0 - AUDIO.norm_mean) / AUDIO.norm_std
    assert np.allclose(fb[1, n_valid:], pad_val, atol=1e-5)

    cfg = FinetuneConfig(model=CAVMAEFTConfig(vit=TINY, label_dim=2),
                         audio=AUDIO, opt=OptimizerConfig(lr=1e-4),
                         batch_size=4)
    model = CAVMAEFinetune(cfg.model)
    state = init_state(jax.random.PRNGKey(0), model, cfg,
                       (fb, np.asarray(img)[:, None], y))
    step = make_finetune_step(model, cfg)
    import jax.numpy as jnp
    state, m = step(state, (fb, jnp.asarray(img)[:, None], y),
                    jax.random.PRNGKey(1), jnp.float32(1e-4))
    assert np.isfinite(float(m["loss"]))

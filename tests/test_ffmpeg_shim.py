"""ffmpeg subprocess-plumbing tests against a fake ffmpeg/ffprobe shim.

The real binary is absent on this host, so the suite's only coverage of
``media.decode_audio`` / ``media.decode_video_frames`` was the (skipped)
real-media test — the decode plumbing was correct-by-inspection only.
These tests exercise everything on OUR side of the subprocess boundary
with a deterministic Python stand-in that emits exactly what ffmpeg's
documented output contract specifies: the argv contract (-vn/-ac 1/-ar,
-pix_fmt rgb24, the scale filter's w:h order), f32le and rawvideo byte
parsing, the [T, h, w, 3] reshape ORIENTATION (w != h in every fixture so
a swapped reshape cannot pass), linspace frame sampling with start
jitter, ffprobe's width,height CSV parse, the dataset's .mp4 routing, and
the 0.01-substitution fault tolerance on decode failure.

Parity targets: src/dataloader_ft.py:272-278 (audio straight from the
container), src/dataloader.py:392-419 (full decode -> linspace sample),
src/dataloader.py:330,385 (error fallbacks).
"""

import json
import os
import stat
import subprocess

import numpy as np
import pytest

from avsiam_tpu.configs import AudioConfig
from avsiam_tpu.data import media

# native (unscaled) geometry the shim pretends the video has; w != h so an
# h/w mixup in the reshape or the scale filter cannot cancel out
NATIVE_W, NATIVE_H = 48, 32
N_FRAMES = 25

_FFMPEG_SHIM = f'''#!/usr/bin/env python3
"""Deterministic ffmpeg stand-in emitting the documented raw contracts."""
import sys

import numpy as np

args = sys.argv[1:]


def val(flag):
    return args[args.index(flag) + 1]


path = val("-i")
if "broken" in path:
    sys.stderr.write("shim: simulated decode failure\\n")
    sys.exit(1)
if "f32le" in args:
    # audio contract: -vn -f f32le -ac 1 -ar N -  (media.decode_audio)
    assert "-vn" in args and val("-ac") == "1", args
    assert args[-1] == "-", args
    sr = int(val("-ar"))
    t = np.arange(sr, dtype=np.float32)  # exactly 1 s at the requested rate
    w = (0.5 * np.sin(2 * np.pi * 440.0 * t / sr)).astype("<f4")
    sys.stdout.buffer.write(w.tobytes())
elif "rawvideo" in args:
    # video contract: [-vf scale=W:H] -f rawvideo -pix_fmt rgb24 -
    assert val("-pix_fmt") == "rgb24", args
    w, h = {NATIVE_W}, {NATIVE_H}
    if "-vf" in args:
        s = val("-vf")
        assert s.startswith("scale="), s
        w, h = (int(x) for x in s[len("scale="):].split(":"))
    n = {N_FRAMES}
    # pixel (f, y, x) = (frame idx, row, column): any orientation mixup in
    # the caller's reshape shows up as swapped G/B channels
    f = np.broadcast_to(np.arange(n, dtype=np.uint8)[:, None, None], (n, h, w))
    y = np.broadcast_to((np.arange(h) % 256).astype(np.uint8)[None, :, None],
                        (n, h, w))
    x = np.broadcast_to((np.arange(w) % 256).astype(np.uint8)[None, None, :],
                        (n, h, w))
    frames = np.stack([f, y, x], axis=-1)
    sys.stdout.buffer.write(np.ascontiguousarray(frames).tobytes())
else:
    sys.stderr.write("shim: unrecognized mode\\n")
    sys.exit(2)
'''

_FFPROBE_SHIM = f'''#!/usr/bin/env python3
import sys

args = sys.argv[1:]
assert "-select_streams" in args and "v:0" in args, args
print("{NATIVE_W},{NATIVE_H}")
'''


@pytest.fixture
def ffmpeg_shim(tmp_path, monkeypatch):
    """Install the shims and point media's resolved binary path at them."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    for name, src in (("ffmpeg", _FFMPEG_SHIM), ("ffprobe", _FFPROBE_SHIM)):
        p = bindir / name
        p.write_text(src)
        p.chmod(p.stat().st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
    monkeypatch.setattr(media, "_FFMPEG", str(bindir / "ffmpeg"))
    return str(bindir / "ffmpeg")


def test_decode_audio_contract(ffmpeg_shim):
    w = media.decode_audio("clip.mp4", 16000)
    assert w.dtype == np.float32 and w.shape == (16000,)
    t = np.arange(16000, dtype=np.float32)
    expect = 0.5 * np.sin(2 * np.pi * 440.0 * t / 16000.0)
    np.testing.assert_allclose(w, expect, atol=1e-6)
    # the requested rate is forwarded verbatim
    assert media.decode_audio("clip.mp4", 8000).shape == (8000,)


def test_decode_video_native_geometry(ffmpeg_shim):
    # no size -> geometry comes from the ffprobe CSV parse
    fr = media.decode_video_frames("clip.mp4", num_frames=5, start_jitter=2)
    assert fr.shape == (5, NATIVE_H, NATIVE_W, 3) and fr.dtype == np.uint8
    # linspace(2, 24, 5) truncated to int = [2, 7, 13, 18, 24] in channel R
    np.testing.assert_array_equal(fr[:, 0, 0, 0], [2, 7, 13, 18, 24])
    # orientation: G encodes the row, B the column
    ys, xs = np.arange(NATIVE_H), np.arange(NATIVE_W)
    np.testing.assert_array_equal(fr[0, :, 5, 1], ys)
    np.testing.assert_array_equal(fr[0, 5, :, 2], xs)


def test_decode_video_scaled(ffmpeg_shim):
    # size is (h, w); the scale filter must be emitted as w:h
    fr = media.decode_video_frames("clip.mp4", num_frames=3, size=(24, 40))
    assert fr.shape == (3, 24, 40, 3)
    np.testing.assert_array_equal(fr[0, :, 0, 1], np.arange(24))
    np.testing.assert_array_equal(fr[0, 0, :, 2], np.arange(40))
    # first/last frames of the linspace with no jitter
    np.testing.assert_array_equal(fr[:, 0, 0, 0], [0, 12, 24])


def _mp4_index(tmp_path, wav_name):
    idx = tmp_path / "idx.json"
    idx.write_text(json.dumps({"data": [{
        "wav": wav_name, "labels": "/m/0", "video_id": "clip",
        "video_path": wav_name}]}))
    csvp = tmp_path / "labels.csv"
    csvp.write_text("index,mid,display_name\n0,/m/0,a\n")
    return str(idx), str(csvp)


def test_dataset_mp4_routing(tmp_path, ffmpeg_shim):
    """A .mp4 record routes audio through decode_audio and frames through
    decode_video_frames (scaled to im_res) end to end."""
    from avsiam_tpu.data.dataset import AVDataset

    idx, csvp = _mp4_index(tmp_path, "clip.mp4")
    conf = AudioConfig(target_length=128, num_mel_bins=32)
    ds = AVDataset(idx, conf, label_csv=csvp, mode="train",
                   frame_source="video", im_res=32, num_frames=4)
    s = ds.get(0, np.random.RandomState(0))
    # 1 s of shim audio at 16 kHz, mean-centered then fit to the buffer
    assert s.wav_len == min(16000, ds.num_samples_audio)
    assert np.isfinite(s.waveform).all() and np.abs(s.waveform).max() > 0.3
    assert s.frames.shape == (4, 32, 32, 3)
    # frame identities survive the pipeline: linspace over 25 shim frames
    assert list(s.frames[:, 0, 0, 0]) == [0, 8, 16, 24] or \
        int(s.frames[0, 0, 0, 0]) <= 5  # start_jitter in [0, 5]


def test_dataset_broken_mp4_fallback(tmp_path, ffmpeg_shim, capsys):
    """A failing decode must not raise: the reference substitutes constant
    tensors (src/dataloader.py:330,385) and the run continues."""
    from avsiam_tpu.data.dataset import AVDataset

    idx, csvp = _mp4_index(tmp_path, "broken.mp4")
    conf = AudioConfig(target_length=128, num_mel_bins=32)
    ds = AVDataset(idx, conf, label_csv=csvp, mode="train",
                   frame_source="video", im_res=32, num_frames=4)
    s = ds.get(0, np.random.RandomState(0))
    np.testing.assert_allclose(s.waveform, 0.01)
    assert s.wav_len == ds.num_samples_audio
    np.testing.assert_array_equal(
        s.frames, np.full((4, 32, 32, 3), 3, dtype=np.uint8))
    out = capsys.readouterr().out
    assert "error in loading audio" in out and "error in loading image" in out


def test_shim_subprocess_error_propagates(ffmpeg_shim):
    """check=True surfaces a nonzero ffmpeg exit as CalledProcessError (what
    the dataset's fault-tolerance layer catches)."""
    with pytest.raises(subprocess.CalledProcessError):
        media.decode_audio("broken.mp4", 16000)


def test_have_ffmpeg_reflects_patched_path(ffmpeg_shim):
    assert media.have_ffmpeg()
    assert media.is_video_container("x.mp4")
    assert not media.is_video_container("x.wav")

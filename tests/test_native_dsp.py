"""Native C++ DSP library tests: builds the .so, then cross-checks the native
fbank and WAV parser against the NumPy oracle / stdlib reader."""

import wave

import numpy as np
import pytest

from avsiam_tpu.data import native_dsp
from avsiam_tpu.data.media import read_wav
from avsiam_tpu.ops.fbank import kaldi_fbank_np


@pytest.fixture(scope="module", autouse=True)
def built():
    assert native_dsp.build(), "native build failed (g++/make missing?)"
    assert native_dsp.available()


def test_native_fbank_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    wav = (rng.randn(32000) * 0.1).astype(np.float32)
    ref = kaldi_fbank_np(wav)
    out = native_dsp.fbank(wav)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_native_wav_parse_matches_stdlib(tmp_path):
    sr = 16000
    x = (0.4 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
    # [x, -x] would downmix to ~0 and test nothing; unequal channels make
    # the mono average a real check
    stereo = np.stack([x, x * 0.5], axis=1)
    p = tmp_path / "s.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((stereo * 32767).astype("<i2").tobytes())
    mono, sr2 = native_dsp.read_wav_mono(str(p))
    assert sr2 == sr and mono.shape == (sr,)
    ref, _ = read_wav(str(p))
    np.testing.assert_allclose(mono, ref.mean(axis=0), atol=1e-4)


def test_native_mean_center():
    x = np.ones(100, np.float32) * 3.0
    out = native_dsp.mean_center(x.copy())
    assert abs(out.sum()) < 1e-4


def test_native_fbank_10s_shape():
    wav = np.zeros(160000, np.float32)
    out = native_dsp.fbank(wav)
    assert out.shape == (998, 128)
    assert np.allclose(out, np.log(np.finfo(np.float32).eps))

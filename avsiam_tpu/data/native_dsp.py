"""ctypes bindings for the native host DSP library (native/dsp.cpp).

The library accelerates the host data plane (WAV parse + fbank) — the
reference's torchaudio/Kaldi C++ surface. Everything degrades gracefully to
the NumPy/stdlib implementations when the .so hasn't been built
(``make -C native``).
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_NAME = "libavsiam_dsp.so"


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def build(quiet: bool = True) -> bool:
    """Build the library with make; returns True on success."""
    try:
        subprocess.run(["make", "-C", _native_dir()],
                       capture_output=quiet, check=True)
        # an earlier available() may have cached a None handle from before
        # the library existed — drop it so the fresh build is picked up
        _load.cache_clear()
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


@functools.lru_cache(maxsize=1)
def _load() -> Optional[ctypes.CDLL]:
    path = os.path.join(_native_dir(), _LIB_NAME)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.wav_read_pcm16.restype = ctypes.c_int
    lib.wav_read_pcm16.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    lib.mean_center.restype = None
    lib.mean_center.argtypes = [np.ctypeslib.ndpointer(np.float32),
                                ctypes.c_int64]
    lib.fbank_num_frames.restype = ctypes.c_int
    lib.fbank_num_frames.argtypes = [ctypes.c_int64, ctypes.c_double,
                                     ctypes.c_double, ctypes.c_double]
    lib.fbank.restype = ctypes.c_int
    lib.fbank.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_double, ctypes.c_int, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]
    return lib


def available() -> bool:
    return _load() is not None


def read_wav_mono(path: str) -> Tuple[np.ndarray, int]:
    """PCM16 WAV -> (mono float32 [-1, 1], sample_rate) via native parse."""
    lib = _load()
    assert lib is not None, "native DSP library not built (make -C native)"
    data = open(path, "rb").read()
    n = ctypes.c_int64()
    ch = ctypes.c_int32()
    sr = ctypes.c_int32()
    rc = lib.wav_read_pcm16(data, len(data), None, ctypes.byref(n),
                            ctypes.byref(ch), ctypes.byref(sr))
    if rc != 0:
        raise ValueError(f"native WAV parse failed ({rc}) for {path}")
    out = np.empty(n.value, dtype=np.float32)
    lib.wav_read_pcm16(data, len(data),
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                       ctypes.byref(n), ctypes.byref(ch), ctypes.byref(sr))
    return out, int(sr.value)


def mean_center(x: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None, "libavsiam_dsp.so not built (make -C native)"
    # always copy: the C function centers in place, and the pure
    # media.mean_center this replaces returns a NEW array
    x = np.array(x, dtype=np.float32, order="C", copy=True)
    lib.mean_center(x, x.size)
    return x


def fbank(waveform: np.ndarray, sample_freq: float = 16000.0,
          num_mel_bins: int = 128, frame_length_ms: float = 25.0,
          frame_shift_ms: float = 10.0, preemph: float = 0.97,
          remove_dc: bool = True) -> np.ndarray:
    """Native Kaldi-compatible fbank; same numerics as ops/fbank.py."""
    lib = _load()
    assert lib is not None, "native DSP library not built (make -C native)"
    w = np.ascontiguousarray(waveform, dtype=np.float32)
    m = lib.fbank_num_frames(w.size, sample_freq, frame_length_ms,
                             frame_shift_ms)
    out = np.empty((max(m, 0), num_mel_bins), dtype=np.float32)
    rc = lib.fbank(w, w.size, sample_freq, num_mel_bins, frame_length_ms,
                   frame_shift_ms, preemph, int(remove_dc), out)
    if rc < 0:
        raise ValueError("fbank failed (waveform too short?)")
    return out

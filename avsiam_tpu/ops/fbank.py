"""Kaldi-compatible log-mel filterbank, as a jittable on-device op.

The reference computes features on the CPU per dataloader worker via
``torchaudio.compliance.kaldi.fbank(waveform, htk_compat=True,
sample_frequency=sr, use_energy=False, window_type='hanning',
num_mel_bins=128, dither=0.0, frame_shift=10)`` (src/dataloader.py:328) —
a C++ Kaldi DSP surface. Here the whole pipeline (framing -> DC removal ->
pre-emphasis -> Hann window -> zero-pad to 512 -> rFFT power spectrum -> mel
filterbank matmul -> log) runs inside jit: the mel projection is one
[frames, 257] x [257, 128] matmul on the MXU and XLA fuses the elementwise
stages around the FFT.

Numerics follow the Kaldi/torchaudio definition exactly:
* window_size = int(sr * 0.025), shift = int(sr * 0.010), snip_edges=True:
  num_frames = 1 + (n - window_size) // shift
* remove_dc_offset=True (per-frame mean subtraction)
* pre-emphasis 0.97 with replicated first sample
* 'hanning' window = 0.5 - 0.5 cos(2 pi n / (N-1))  (periodic=False)
* round_to_power_of_two=True (zero-pad frames to 512 for 16 kHz)
* power spectrum |rfft|^2, mel scale 1127 ln(1 + f/700), low_freq=20,
  high_freq=0 (-> Nyquist), triangular banks over the first 256 FFT bins with
  a zeroed Nyquist column
* log(max(x, float32_eps)); htk_compat only affects energy placement and is a
  no-op with use_energy=False

A pure-NumPy mirror (``kaldi_fbank_np``) provides an independent execution
path for testing.
"""

from __future__ import annotations

import functools
import math
import jax
import jax.numpy as jnp
import numpy as np

_EPSILON = float(np.finfo(np.float32).eps)  # 1.1920929e-07
_MEL_HIGH_FREQ_Q = 1127.0
_MEL_BREAK_FREQ = 700.0


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def mel_scale(freq):
    return _MEL_HIGH_FREQ_Q * np.log(1.0 + freq / _MEL_BREAK_FREQ)


def mel_banks(num_bins: int, padded_window_size: int, sample_freq: float,
              low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    """Kaldi triangular mel filterbank matrix [num_bins, padded/2 + 1].

    The final (Nyquist) column is zero, matching torchaudio's pad of the
    [num_bins, padded/2] Kaldi matrix.
    """
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    assert 0.0 <= low_freq < high_freq <= nyquist
    num_fft_bins = padded_window_size // 2
    fft_bin_width = sample_freq / padded_window_size
    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bin_idx = np.arange(num_fft_bins, dtype=np.float64)
    mel = mel_scale(fft_bin_width * bin_idx)[None, :]  # [1, F]
    left = (mel_low + np.arange(num_bins, dtype=np.float64) * mel_delta)[:, None]
    center = left + mel_delta
    right = center + mel_delta
    up = (mel - left) / (center - left)
    down = (right - mel) / (right - center)
    weights = np.maximum(0.0, np.minimum(up, down))
    out = np.zeros((num_bins, num_fft_bins + 1), dtype=np.float32)
    out[:, :num_fft_bins] = weights
    return out


def _hann_window(n: int) -> np.ndarray:
    # torch.hann_window(n, periodic=False)
    i = np.arange(n, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * math.pi * i / (n - 1))).astype(np.float32)


def num_frames_for(num_samples: int, sample_freq: float,
                   frame_length_ms: float = 25.0,
                   frame_shift_ms: float = 10.0) -> int:
    ws = int(sample_freq * frame_length_ms / 1000.0)
    sh = int(sample_freq * frame_shift_ms / 1000.0)
    return max(0, 1 + (num_samples - ws) // sh)


@functools.partial(jax.jit, static_argnames=(
    "sample_freq", "num_mel_bins", "frame_length_ms", "frame_shift_ms",
    "preemph", "remove_dc"))
def kaldi_fbank(waveform: jnp.ndarray, sample_freq: float = 16000.0,
                num_mel_bins: int = 128, frame_length_ms: float = 25.0,
                frame_shift_ms: float = 10.0, preemph: float = 0.97,
                remove_dc: bool = True) -> jnp.ndarray:
    """[B, n] (or [n]) waveform -> [B, num_frames, num_mel_bins] log-mel.

    Parity surface: torchaudio.compliance.kaldi.fbank with the reference's
    arguments (src/dataloader.py:328).
    """
    squeeze = waveform.ndim == 1
    if squeeze:
        waveform = waveform[None]
    waveform = waveform.astype(jnp.float32)
    n = waveform.shape[-1]
    ws = int(sample_freq * frame_length_ms / 1000.0)
    sh = int(sample_freq * frame_shift_ms / 1000.0)
    padded = _next_pow2(ws)
    m = 1 + (n - ws) // sh

    idx = jnp.arange(m)[:, None] * sh + jnp.arange(ws)[None, :]
    frames = waveform[:, idx]  # [B, m, ws]
    if remove_dc:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemph != 0.0:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - preemph * prev
    frames = frames * jnp.asarray(_hann_window(ws))
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, padded - ws)))
    spec = jnp.fft.rfft(frames, axis=-1)
    power = jnp.square(jnp.real(spec)) + jnp.square(jnp.imag(spec))
    banks = jnp.asarray(mel_banks(num_mel_bins, padded, sample_freq))
    mel = jnp.einsum("bmf,kf->bmk", power, banks)
    out = jnp.log(jnp.maximum(mel, _EPSILON))
    return out[0] if squeeze else out


def kaldi_fbank_np(waveform: np.ndarray, sample_freq: float = 16000.0,
                   num_mel_bins: int = 128, frame_length_ms: float = 25.0,
                   frame_shift_ms: float = 10.0, preemph: float = 0.97,
                   remove_dc: bool = True) -> np.ndarray:
    """Independent NumPy mirror of ``kaldi_fbank`` (test oracle)."""
    x = np.asarray(waveform, dtype=np.float64)
    ws = int(sample_freq * frame_length_ms / 1000.0)
    sh = int(sample_freq * frame_shift_ms / 1000.0)
    padded = _next_pow2(ws)
    m = 1 + (len(x) - ws) // sh
    window = _hann_window(ws).astype(np.float64)
    banks = mel_banks(num_mel_bins, padded, sample_freq).astype(np.float64)
    out = np.empty((m, num_mel_bins), dtype=np.float64)
    for i in range(m):
        f = x[i * sh: i * sh + ws].copy()
        if remove_dc:
            f -= f.mean()
        if preemph != 0.0:
            f_prev = np.concatenate([[f[0]], f[:-1]])
            f = f - preemph * f_prev
        f = f * window
        fp = np.zeros(padded)
        fp[:ws] = f
        spec = np.fft.rfft(fp)
        power = spec.real ** 2 + spec.imag ** 2
        out[i] = banks @ power
    return np.log(np.maximum(out, _EPSILON)).astype(np.float32)


def pad_or_crop_frames(fbank: jnp.ndarray, target_length: int) -> jnp.ndarray:
    """Pad (zeros at the end) or crop to target frame count.
    Parity: src/dataloader.py:333-343 (ZeroPad2d / head slice)."""
    m = fbank.shape[-2]
    if m < target_length:
        pad = [(0, 0)] * (fbank.ndim - 2) + [(0, target_length - m), (0, 0)]
        return jnp.pad(fbank, pad)
    if m > target_length:
        return fbank[..., :target_length, :]
    return fbank

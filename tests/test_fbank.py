"""Fbank and augmentation tests: JAX vs independent NumPy oracle + spectral
sanity properties."""

import jax
import jax.numpy as jnp
import numpy as np

from avsiam_tpu.ops.augment import (noise_and_roll, normalize_fbank,
                                    spec_augment)
from avsiam_tpu.ops.fbank import (kaldi_fbank, kaldi_fbank_np, mel_banks,
                                  num_frames_for, pad_or_crop_frames)


def test_fbank_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    wav = rng.randn(16000).astype(np.float32) * 0.1
    ref = kaldi_fbank_np(wav)
    out = np.asarray(kaldi_fbank(jnp.asarray(wav)))
    assert out.shape == ref.shape == (98, 128)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_fbank_frame_count_10s():
    # 10 s at 16 kHz -> 998 frames; reference pads to 1024
    assert num_frames_for(160000, 16000.0) == 998
    wav = jnp.zeros((2, 160000))
    fb = kaldi_fbank(wav)
    assert fb.shape == (2, 998, 128)
    padded = pad_or_crop_frames(fb, 1024)
    assert padded.shape == (2, 1024, 128)
    assert float(jnp.abs(padded[:, 998:]).max()) == 0.0
    cropped = pad_or_crop_frames(fb, 512)
    assert cropped.shape == (2, 512, 128)


def test_fbank_pure_tone_peak():
    """A 1 kHz tone must peak at the mel bin whose center is nearest 1 kHz."""
    sr = 16000
    t = np.arange(sr * 2) / sr
    wav = (0.5 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)
    fb = np.asarray(kaldi_fbank(jnp.asarray(wav)))
    mean_spec = fb.mean(axis=0)
    peak_bin = int(np.argmax(mean_spec))
    # locate the expected bin from the filterbank matrix itself
    banks = mel_banks(128, 512, sr)
    freq_of_fft_bin = np.arange(257) * sr / 512
    centers = (banks * freq_of_fft_bin).sum(1) / np.maximum(banks.sum(1), 1e-9)
    expected = int(np.argmin(np.abs(centers - 1000.0)))
    assert abs(peak_bin - expected) <= 1


def test_fbank_silence_is_log_eps():
    fb = np.asarray(kaldi_fbank(jnp.zeros(16000)))
    assert np.allclose(fb, np.log(np.finfo(np.float32).eps))


def test_spec_augment_masks_and_bounds():
    rng = jax.random.PRNGKey(0)
    fb = jnp.ones((4, 100, 32))
    out = np.asarray(spec_augment(rng, fb, freqm=8, timem=20))
    assert out.shape == (4, 100, 32)
    # masked entries are exactly 0, others exactly 1
    assert set(np.unique(out)).issubset({0.0, 1.0})
    # mask width ~ U[0, param): an interval of length < p covers at most p
    # integer positions
    for b in range(4):
        zero_rows = (out[b] == 0).all(axis=1).sum()
        assert zero_rows <= 20
        zero_cols = (out[b] == 0).all(axis=0).sum()
        assert zero_cols <= 8
    # zero params = no-op
    out2 = np.asarray(spec_augment(rng, fb, freqm=0, timem=0))
    assert (out2 == 1.0).all()


def test_noise_roll_preserves_shape_and_content():
    rng = jax.random.PRNGKey(1)
    fb = jnp.tile(jnp.arange(16.0)[None, :, None], (2, 1, 4))
    out = np.asarray(noise_and_roll(rng, fb, target_length=16))
    assert out.shape == (2, 16, 4)
    # roll is a permutation of rows modulo the small additive noise (< 0.1)
    orig = np.asarray(fb[0, :, 0])
    rolled_vals = np.sort(np.round(out[0, :, 0] - 0.05).clip(0, 15))
    np.testing.assert_array_equal(rolled_vals, np.sort(orig))


def test_normalize_fbank():
    fb = jnp.full((1, 4, 4), -5.081 + 4.4849)
    out = normalize_fbank(fb, -5.081, 4.4849)
    assert np.allclose(np.asarray(out), 1.0)


def test_spec_augment_integer_mask_widths():
    """torchaudio mask_along_axis parity: masked strips start at integer
    positions and have width exactly floor(value) — never a fractional-
    boundary strip (the continuous form masks wider on average and halves
    P(empty mask))."""
    import jax
    from avsiam_tpu.ops.augment import _axis_mask

    masks = np.asarray(_axis_mask(jax.random.PRNGKey(3), 512, 128, 48))
    widths = masks.sum(axis=1)
    # width distribution: floor(U[0,48)) -> every value in [0, 48), and
    # ~1/48 of draws empty (the continuous form gives ~half that)
    assert widths.max() < 48 and (widths == 0).sum() > 0
    for row, w in zip(masks, widths):
        if w == 0:
            continue
        idx = np.flatnonzero(row)
        assert idx[-1] - idx[0] + 1 == w, "mask must be one contiguous strip"

"""Device-side audio/image augmentations, jit-friendly.

These replace the reference's per-worker CPU torch transforms with fused
on-device ops (BASELINE.json north star: fused transform kernels feeding an
HBM-resident token stream):

* SpecAug frequency/time masking — torchaudio.transforms.{Frequency,Time}
  Masking semantics (src/dataloader.py:493-502): mask width ~ U[0, param),
  start ~ U[0, dim - width), masked region set to 0. Applied to the log-mel
  fbank BEFORE dataset normalization.
* Dataset normalization (fbank - mean) / std (src/dataloader.py:505-506).
* Noise + time-roll aug (src/dataloader.py:511-513): add U[0,1) noise scaled
  by a per-sample U[0,1)/10 factor, then roll the time axis by a random
  offset in [-target_length, target_length).
* Waveform / image mixup (src/dataloader.py:373-437): lam ~ Beta(10, 10).
* ImageNet image normalization (src/dataloader.py:152-155).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _axis_mask(rng: jax.Array, B: int, size: int, mask_param: int):
    """torchaudio masking parity (functional.mask_along_axis): draw
    value ~ U[0, param) and min ~ U[0, size - value), then mask the INTEGER
    interval [int(min), int(min) + int(value)) — start and width are floored
    separately, so the masked width is exactly floor(value) (the continuous
    form masks a measurably wider strip on average and halves the
    probability of an empty mask). Returns bool [B, size] (True = masked)."""
    k1, k2 = jax.random.split(rng)
    value = jax.random.uniform(k1, (B, 1)) * mask_param
    # start range uses the CONTINUOUS value (torchaudio order), then both
    # start and width floor independently
    start = jnp.floor(jax.random.uniform(k2, (B, 1)) * (size - value))
    width = jnp.floor(value)
    pos = jnp.arange(size, dtype=jnp.float32)[None, :]
    return (pos >= start) & (pos < start + width)


def spec_augment(rng: jax.Array, fbank: jnp.ndarray, freqm: int,
                 timem: int) -> jnp.ndarray:
    """fbank: [B, T, F] log-mel. Applies one freq mask then one time mask
    (each only if its param > 0), filling with 0."""
    B, T, F = fbank.shape
    kf, kt = jax.random.split(rng)
    if freqm > 0:
        fmask = _axis_mask(kf, B, F, freqm)[:, None, :]  # [B, 1, F]
        fbank = jnp.where(fmask, 0.0, fbank)
    if timem > 0:
        tmask = _axis_mask(kt, B, T, timem)[:, :, None]  # [B, T, 1]
        fbank = jnp.where(tmask, 0.0, fbank)
    return fbank


def normalize_fbank(fbank: jnp.ndarray, mean: float, std: float) -> jnp.ndarray:
    """Parity: (fbank - norm_mean) / norm_std (src/dataloader.py:505-506;
    note the reference divides by std, not 2*std)."""
    return (fbank - mean) / std


def noise_and_roll(rng: jax.Array, fbank: jnp.ndarray,
                   target_length: int) -> jnp.ndarray:
    """Additive uniform noise + random time roll (src/dataloader.py:511-513).
    fbank: [B, T, F]."""
    B, T, F = fbank.shape
    k1, k2, k3 = jax.random.split(rng, 3)
    scale = jax.random.uniform(k2, (B, 1, 1)) / 10.0
    fbank = fbank + jax.random.uniform(k1, (B, T, F)) * scale
    shift = jax.random.randint(k3, (B,), -target_length, target_length)
    idx = (jnp.arange(T)[None, :] - shift[:, None]) % T
    return jnp.take_along_axis(fbank, idx[:, :, None], axis=1)


def mixup_lambda(rng: jax.Array, batch: int, alpha: float = 10.0) -> jnp.ndarray:
    """lam ~ Beta(alpha, alpha) per sample (src/dataloader.py:380 np.random.beta)."""
    return jax.random.beta(rng, alpha, alpha, (batch,))


def mixup_waveform(lam: jnp.ndarray, w1: jnp.ndarray, w2: jnp.ndarray) -> jnp.ndarray:
    """Waveform mixup with re-centering (src/dataloader.py:316-326):
    mix = lam*w1 + (1-lam)*w2; mix -= mix.mean(). Inputs [B, n] mean-removed."""
    lam = lam[:, None]
    mix = lam * w1 + (1.0 - lam) * w2
    return mix - jnp.mean(mix, axis=-1, keepdims=True)


def normalize_image(img: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, H, W] in [0, 1] -> ImageNet-normalized."""
    mean = jnp.asarray(IMAGENET_MEAN).reshape((3, 1, 1))
    std = jnp.asarray(IMAGENET_STD).reshape((3, 1, 1))
    return (img - mean) / std

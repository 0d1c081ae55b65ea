"""Patchify / unpatchify as pure reshapes (TPU-friendly: no conv needed).

The reference patchifies with a Conv2d k=16 s=16 (cuDNN path,
src/models/cav_mae_base.py:85-100) and builds MAE targets with an einsum
patchify (cav_mae_base.py:343-363). On TPU the idiomatic form is
reshape+transpose followed by one big [L, p*p*c] x [p*p*c, D] matmul that maps
straight onto the MXU; XLA fuses the layout change into the matmul operand.

Patch layout parity: tokens are ordered row-major over the (H/p, W/p) grid and
each patch is flattened in (p_h, p_w, c) order — exactly the reference's
``einsum('nchpwq->nhwpqc')`` (cav_mae_base.py:349).
"""

from __future__ import annotations

import jax.numpy as jnp


def patchify(imgs: jnp.ndarray, patch_size: int = 16) -> jnp.ndarray:
    """[B, C, H, W] -> [B, (H/p)*(W/p), p*p*C] with (p_h, p_w, c) patch order.

    Parity: cav_mae_base.py:343-351.
    """
    B, C, H, W = imgs.shape
    p = patch_size
    h, w = H // p, W // p
    x = imgs.reshape(B, C, h, p, w, p)
    x = x.transpose(0, 2, 4, 3, 5, 1)  # nchpwq -> nhwpqc
    return x.reshape(B, h * w, p * p * C)


def unpatchify(x: jnp.ndarray, channels: int, grid_h: int, grid_w: int,
               patch_size: int = 16) -> jnp.ndarray:
    """[B, L, p*p*C] -> [B, C, H, W]. Parity: cav_mae_base.py:353-363."""
    B, L, _ = x.shape
    p = patch_size
    assert L == grid_h * grid_w
    x = x.reshape(B, grid_h, grid_w, p, p, channels)
    x = x.transpose(0, 5, 1, 3, 2, 4)  # nhwpqc -> nchpwq
    return x.reshape(B, channels, grid_h * p, grid_w * p)


def audio_to_image(fbank: jnp.ndarray) -> jnp.ndarray:
    """[B, T, F] fbank -> [B, 1, F, T] 1-channel image.

    Parity: ``a.unsqueeze(1); a.transpose(2, 3)`` (cav_mae_base.py:444-445).
    """
    return fbank[:, None, :, :].transpose(0, 1, 3, 2)

"""Positional embedding utilities.

Parity targets:
* ``get_2d_sincos_pos_embed`` — src/models/pos_embed.py:37-89 (MAE-style
  rectangular-grid 2D sin-cos embedding, used by the audio-only FT model).
* ``interp_pos_embed_tokens`` — the audio pos-embed derivation
  ``F.interpolate(pos_embed[:, 1:].permute(0,2,1), size=[512])``
  (src/models/cav_mae_base.py:298). torch F.interpolate on a 3D tensor
  defaults to mode='nearest', so this is nearest-neighbor resampling along the
  token axis: out[i] = in[floor(i * n_in / n_out)].
* ``interpolate_pos_embed_2d`` — checkpoint pos-embed grid resize
  (src/models/pos_embed.py:92-111, bicubic in the reference; we use jax.image
  bicubic which matches torch's align_corners=False convention).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000 ** omega
    pos = pos.reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_h_size: int, grid_w_size: int,
                            cls_token: bool = False) -> np.ndarray:
    """2D sin-cos embedding over a (possibly rectangular) grid.

    Parity: src/models/pos_embed.py:37-64 (grid built with meshgrid(w, h),
    half the channels encode h, half encode w).
    """
    grid_h = np.arange(grid_h_size, dtype=np.float32)
    grid_w = np.arange(grid_w_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w goes first (reference convention)
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_h_size, grid_w_size])
    emb_h = _get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = _get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    pos_embed = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        pos_embed = np.concatenate([np.zeros([1, embed_dim]), pos_embed], axis=0)
    return pos_embed.astype(np.float32)


def interp_pos_embed_tokens(pos_embed: jnp.ndarray, num_out: int) -> jnp.ndarray:
    """Nearest-neighbor resample [1, N_in, D] -> [1, num_out, D] along tokens.

    Parity: cav_mae_base.py:298 — torch F.interpolate default (nearest) maps
    out[i] = in[floor(i * N_in / num_out)].
    """
    n_in = pos_embed.shape[1]
    idx = (np.arange(num_out) * n_in // num_out).astype(np.int32)
    return pos_embed[:, idx, :]


def interpolate_pos_embed_2d(pos_embed: jnp.ndarray, new_grid: tuple[int, int],
                             num_prefix_tokens: int = 1) -> jnp.ndarray:
    """Bicubic grid resize of a [1, prefix + gh*gw, D] pos embed.

    Parity: src/models/pos_embed.py:92-111 (used when importing checkpoints at
    a different input resolution).
    """
    prefix = pos_embed[:, :num_prefix_tokens]
    grid_tokens = pos_embed[:, num_prefix_tokens:]
    n = grid_tokens.shape[1]
    old = int(round(float(np.sqrt(n))))
    D = grid_tokens.shape[-1]
    grid = grid_tokens.reshape(1, old, old, D)
    resized = jax.image.resize(grid, (1, new_grid[0], new_grid[1], D),
                               method="bicubic")
    resized = resized.reshape(1, new_grid[0] * new_grid[1], D)
    return jnp.concatenate([prefix, resized], axis=1)

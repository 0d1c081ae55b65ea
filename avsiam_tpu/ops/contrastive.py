"""Global-batch InfoNCE contrastive loss.

Parity: src/models/cav_mae_base.py:641-661 (``forward_contrastive``) combined
with the differentiable cross-process gather of embeddings
(src/models/gather_layer.py:21-37 + cav_mae_base.py:724-725).

TPU-native design: instead of an explicit NCCL all_gather autograd Function,
the embeddings are gathered with ``jax.lax.all_gather`` over the 'data' mesh
axis inside the sharded step (the transpose rule of all_gather is a
reduce-scatter, which reproduces GatherLayer's backward for free), or — under
GSPMD jit — the loss is simply written on the logically-global batch and XLA
inserts the collectives. Both entry points are provided.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize parity: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def info_nce(audio_rep: jnp.ndarray, video_rep: jnp.ndarray,
             temperature: float = 0.05, bidirect: bool = True
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bidirectional InfoNCE on (already global) [B, D] embeddings.

    Returns (nce_loss, contrastive_accuracy). Parity: cav_mae_base.py:641-661 —
    log-softmax over dim 0 of ``a @ v.T / temp``, diagonal mean, both
    directions averaged; accuracy = fraction of columns whose argmax row is the
    diagonal.
    """
    a = l2_normalize(audio_rep.astype(jnp.float32))
    v = l2_normalize(video_rep.astype(jnp.float32))
    total = (a @ v.T) / temperature  # [B, B]
    B = total.shape[0]
    diag_ids = jnp.arange(B)

    def _one_direction(logits):
        logp = jax.nn.log_softmax(logits, axis=0)
        nce = -jnp.mean(jnp.diagonal(logp))
        acc = jnp.mean(jnp.argmax(logits, axis=0) == diag_ids)
        return nce, acc

    nce_1, acc_1 = _one_direction(total)
    if not bidirect:
        return nce_1, acc_1
    nce_2, acc_2 = _one_direction(total.T)
    return (nce_1 + nce_2) / 2.0, (acc_1 + acc_2) / 2.0


def info_nce_gathered(audio_rep: jnp.ndarray, video_rep: jnp.ndarray,
                      temperature: float = 0.05, bidirect: bool = True,
                      axis_name: Optional[str] = None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """InfoNCE over the global batch from per-shard [B_local, D] embeddings.

    When ``axis_name`` is set (inside shard_map/pmap over the data axis), the
    embeddings are all-gathered over ICI first — the GatherLayer equivalent.
    """
    if axis_name is not None:
        audio_rep = jax.lax.all_gather(audio_rep, axis_name, axis=0, tiled=True)
        video_rep = jax.lax.all_gather(video_rep, axis_name, axis=0, tiled=True)
    return info_nce(audio_rep, video_rep, temperature, bidirect)

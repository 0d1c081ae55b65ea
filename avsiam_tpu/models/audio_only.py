"""Audio-only finetune model.

Parity: src/models/audio_mdl.py ``CAVMAEFTAudio`` — a space-saving audio-only
variant of the finetune model (visual parameters removed): CAV-MAE-style
split trunk with ``modality_specific_depth`` audio blocks (shared norms,
modality=None) followed by ``12 - depth`` unified blocks run with 'a' norms
(audio_mdl.py:134-141), a FIXED 2D sin-cos audio pos embed over the (8, T/?)
grid (audio_mdl.py:108-110), an additive learned modality embedding, and an
LN+Linear head. Init: xavier-uniform linears, normal(0.02) modality embed.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from avsiam_tpu.configs import ViTConfig
from avsiam_tpu.models.cavmae_ft import MlpHead
from avsiam_tpu.models.layers import LayerNormFP32, ModalityBlock
from avsiam_tpu.models.layers import PatchEmbed
from avsiam_tpu.models.pos_embed import get_2d_sincos_pos_embed


class CAVMAEFTAudio(nn.Module):
    """Audio-only classifier. ``modality_specific_depth`` defaults to 11
    (audio_mdl.py:71): 11 audio blocks + 1 shared block."""

    vit: ViTConfig
    label_dim: int
    modality_specific_depth: int = 11
    tr_pos: bool = True  # pos embed trainable flag (init is sin-cos either way)
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    mlp_impl: str = "auto"

    def setup(self):
        c = self.vit
        f, t = c.audio_grid
        self.patch_embed_a = PatchEmbed(c.dim, c.patch_size, 1, self.dtype,
                                        name="patch_embed_a")
        sincos = get_2d_sincos_pos_embed(c.dim, f, t)[None]

        self.pos_embed_a = self.param(
            "pos_embed_a", lambda rng, shape: jnp.asarray(sincos),
            (1, c.num_audio_tokens, c.dim))
        self.modality_a = self.param(
            "modality_a", nn.initializers.normal(stddev=0.02),
            (1, 1, c.dim), jnp.float32)
        mk = lambda i, name: ModalityBlock(
            c.dim, c.num_heads, c.mlp_ratio, c.qkv_bias, c.block_ln_eps,
            self.dtype, self.attn_impl, gelu=c.gelu,
            mlp_impl=self.mlp_impl, name=name)
        self.blocks_a = [mk(i, f"blocks_a_{i}")
                         for i in range(self.modality_specific_depth)]
        self.blocks_u = [mk(i, f"blocks_u_{i}")
                         for i in range(c.depth - self.modality_specific_depth)]
        self.norm_a = LayerNormFP32(c.dim, epsilon=c.block_ln_eps,
                                    dtype=self.dtype, name="norm_a")
        self.norm = LayerNormFP32(c.dim, epsilon=c.block_ln_eps,
                                  dtype=self.dtype, name="norm")
        self.mlp_head = MlpHead(self.label_dim, self.dtype, name="mlp_head")

    def encode(self, a):
        """fbank [B, T, F] -> normalized tokens (audio_mdl.py:145-162).
        NOTE: no x2 doubling here — this model adds a modality embedding
        instead (audio_mdl.py:131-135)."""
        if self.is_initializing():
            self.norm(jnp.zeros((1, 1, self.vit.dim), self.dtype))
            for blk in (*self.blocks_a, *self.blocks_u):
                for m in (None, "a", "v"):
                    blk(jnp.zeros((1, 1, self.vit.dim), self.dtype), m)
        a = a[:, None, :, :].transpose(0, 1, 3, 2)  # [B,1,F,T]
        a = self.patch_embed_a(a.astype(self.dtype))
        # tr_pos=False freezes the sin-cos pos embed (audio_mdl.py's
        # requires_grad=tr_pos); the param stays in the tree so torch
        # checkpoint import/export shapes are unchanged
        pos = self.pos_embed_a
        if not self.tr_pos:
            pos = jax.lax.stop_gradient(pos)
        a = a + pos.astype(self.dtype)
        a = a + self.modality_a.astype(self.dtype)
        for blk in self.blocks_a:
            a = blk(a, None)
        for blk in self.blocks_u:
            a = blk(a, "a")
        return self.norm_a(a)

    def __call__(self, a):
        """Token features (audio_mdl.py:145-162 ``forward``)."""
        return self.encode(a)

    def forward_pred(self, a, v=None, mode: str = "audioonly"):
        """Logits head (audio_mdl.py:127-143); v/mode are dummies kept for
        multimodal-pipeline compatibility."""
        x = jnp.mean(self.encode(a), axis=1)
        return self.mlp_head(x)

    def forward_feat(self, a, v=None, mode: str = "av"):
        return self.encode(a)

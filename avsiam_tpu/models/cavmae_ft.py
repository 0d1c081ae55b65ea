"""CAV-MAE finetuning / retrieval model.

TPU-native re-design of the reference ``CAVMAEFT_BASE``
(src/models/cav_mae_base.py:745-1036). Public API parity:
``__call__(a, v, mode, is_eval)`` with mode in
{'audioonly', 'videoonly', 'retrieval', 'mm_grad', 'joint_av'}.

Structure parity:
* Single shared SiameseViT trunk (same surgery as pretraining).
* Heads: mlp_head (video, LN+Linear 768->C), mlp_head_a (audio),
  mlp_head_mm (LN+Linear 1536->C), mlp_head_mm_v2 (unused on the active path
  but kept for checkpoint parity) — cav_mae_base.py:813-816.
* mm_layer_1/2: fusion blocks, initialized as copies of encoder blocks 10/11
  (cav_mae_base.py:819-820; re-copied after loading pretrain weights via
  ``__create_fusion__``, :823-825) and run with 'a' norms over the
  concatenated [512 audio + 196 video] token stream (cav_mae_base.py:1019-1021).
* 'joint_av' mode: invoked by the linear-probe loop
  (traintest_cavmae_base.py:331,343) but missing from the reference source
  (source/bytecode drift, SURVEY.md section 0). We implement the intended
  semantics = the mm fusion path, returning only the fused logits.

TPU-first departures:
* Eval 'mm_grad' fuses all 10 frames by folding the frame axis into the batch
  for the mm layers instead of a Python loop over frames
  (cav_mae_base.py:961-980) — identical math, one big MXU batch.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from avsiam_tpu.configs import CAVMAEFTConfig
from avsiam_tpu.models.layers import LayerNormFP32, ModalityBlock, SiameseViT


class MlpHead(nn.Module):
    """nn.Sequential(LayerNorm, Linear) parity (cav_mae_base.py:813-816).
    torch nn.LayerNorm default eps 1e-5."""

    label_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = LayerNormFP32(x.shape[-1], epsilon=1e-5, dtype=self.dtype,
                          name="ln")(x)
        return nn.Dense(self.label_dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="linear")(x)


class CAVMAEFinetune(nn.Module):
    cfg: CAVMAEFTConfig

    def setup(self):
        c = self.cfg
        self.vit = SiameseViT(c.vit, c.dtype, c.attn_impl, c.embed_double,
                              c.remat_blocks, c.mlp_impl, name="vit")
        self.mlp_head = MlpHead(c.label_dim, c.dtype, name="mlp_head")
        self.mlp_head_a = MlpHead(c.label_dim, c.dtype, name="mlp_head_a")
        self.mlp_head_mm = MlpHead(c.label_dim, c.dtype, name="mlp_head_mm")
        self.mlp_head_mm_v2 = MlpHead(c.label_dim, c.dtype,
                                      name="mlp_head_mm_v2")
        self.mm_layer_1 = ModalityBlock(
            c.vit.dim, c.vit.num_heads, c.vit.mlp_ratio, c.vit.qkv_bias,
            c.vit.block_ln_eps, c.dtype, c.attn_impl, c.vit.gelu,
            c.mlp_impl, name="mm_layer_1")
        self.mm_layer_2 = ModalityBlock(
            c.vit.dim, c.vit.num_heads, c.vit.mlp_ratio, c.vit.qkv_bias,
            c.vit.block_ln_eps, c.dtype, c.attn_impl, c.vit.gelu,
            c.mlp_impl, name="mm_layer_2")

    # ------------------------------------------------------------------
    def encode_audio(self, a):
        """fbank [B,1024,128] -> normalized audio tokens [B,512,D].
        Parity: cav_mae_base.py:830-840."""
        a = self.vit.embed_audio(a)
        a = self.vit.run_blocks(a, "a")
        return self.vit.norm_a(a)

    def encode_video_frames(self, v):
        """[B, T, 3, H, W] -> [B, T, 196, D] normalized video tokens.
        Parity: cav_mae_base.py:855-872 (frames folded into batch)."""
        B, T = v.shape[0], v.shape[1]
        v = v.reshape((B * T,) + v.shape[2:])
        v = self.vit.embed_video(v)
        v = self.vit.run_blocks(v, "v")
        v = self.vit.norm(v)
        return v.reshape(B, T, v.shape[1], v.shape[2])

    def fuse(self, a_tokens, v_tokens):
        """mm fusion: concat -> mm_layer_1/2 with 'a' norms -> split at 512 ->
        mean-pool each side -> concat (1536-d). Parity: cav_mae_base.py:1019-1028."""
        La = a_tokens.shape[1]
        av = jnp.concatenate([a_tokens, v_tokens], axis=1)
        av = self.mm_layer_1(av, "a")
        av = self.mm_layer_2(av, "a")
        return jnp.concatenate(
            [jnp.mean(av[:, :La], axis=1), jnp.mean(av[:, La:], axis=1)],
            axis=-1)

    def _materialize_all_params(self):
        """Touch unused-but-present reference params during init (all 3 norm
        sets per block, the dead mlp_head_mm_v2 head — cav_mae_base.py:816)
        so checkpoints carry the complete reference structure."""
        c = self.cfg
        tok = jnp.zeros((1, 1, c.vit.dim), c.dtype)
        for blk in (*self.vit.blocks, self.mm_layer_1, self.mm_layer_2):
            for m in (None, "a", "v"):
                blk(tok, m)
        for trunk_norm in (self.vit.norm, self.vit.norm_a):
            trunk_norm(tok)
        self.mlp_head_mm_v2(tok[:, 0])
        # both patch embeds (a unimodal init mode would otherwise miss one)
        self.vit.embed_audio(
            jnp.zeros((1, c.vit.audio_length, c.vit.mel_bins), c.dtype))
        self.vit.embed_video(
            jnp.zeros((1, 3, c.vit.img_size, c.vit.img_size), c.dtype))
        self.mlp_head(tok[:, 0])
        self.mlp_head_a(tok[:, 0])
        self.mlp_head_mm(jnp.zeros((1, 2 * c.vit.dim), c.dtype))

    # ------------------------------------------------------------------
    def __call__(self, a, v, mode: str, is_eval: bool = False):
        if self.is_initializing():
            self._materialize_all_params()
        if mode == "audioonly":
            x = jnp.mean(self.encode_audio(a), axis=1)
            out_a = self.mlp_head_a(x)
            if is_eval:
                out_a = out_a[:, None, :]  # cav_mae_base.py:845-846
            return out_a

        if mode == "videoonly":
            # train input [B,1,3,H,W] -> [B,C]; eval [B,T,...] -> [B,T,C]
            vt = self.encode_video_frames(v)
            x = jnp.mean(vt, axis=2)  # [B, T, D]
            x = self.mlp_head(x)
            if x.shape[1] == 1:
                x = x[:, 0]  # squeeze(1) parity (cav_mae_base.py:878)
            return x

        if mode == "retrieval":
            # returns audio tokens + frame-5 video tokens (cav_mae_base.py:
            # 920) when fed the full 10-frame tensor; a caller that already
            # selected its frame (the reference's loader-side frame_use,
            # retrieval.py:100-103) passes [B, 1, ...] and gets that frame
            a_tok = self.encode_audio(a)
            v_tok = self.encode_video_frames(v)
            return a_tok, v_tok[:, 5 if v_tok.shape[1] > 5 else 0]

        if mode in ("mm_grad", "joint_av"):
            a_tok = self.encode_audio(a)
            v_tok = self.encode_video_frames(v)
            if is_eval:
                # fuse every frame; fold frames into batch for the mm layers
                B, T, Lv, D = v_tok.shape
                La = a_tok.shape[1]
                a_rep = jnp.broadcast_to(a_tok[:, None], (B, T, La, D))
                a_rep = a_rep.reshape(B * T, La, D)
                fused = self.fuse(a_rep, v_tok.reshape(B * T, Lv, D))
                out = self.mlp_head_mm(fused).reshape(B, T, -1)
                return out
            # training path: v is [B, 1, 3, H, W] -> one frame
            vt = v_tok[:, 0]
            out_a = self.mlp_head_a(jnp.mean(a_tok, axis=1))
            out_v = self.mlp_head(jnp.mean(vt, axis=1))
            out = self.mlp_head_mm(self.fuse(a_tok, vt))
            if mode == "joint_av":
                return out
            return out, out_a, out_v

        raise ValueError(f"unknown mode: {mode}")

    def forward_feat(self, a, v):
        """Retrieval feature extraction parity (src/retrieval.py:76 uses the
        bytecode-only CAVMAE.forward_feat): per-modality encoded tokens."""
        a_tok = self.encode_audio(a)
        if v.ndim == 4:
            v = v[:, None]
        v_tok = self.encode_video_frames(v)[:, 0]
        return a_tok, v_tok

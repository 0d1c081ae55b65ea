"""CAV-MAE pretraining model (siamese audio-visual MAE + contrastive).

TPU-native re-design of the reference ``CAVMAE_BASE``
(src/models/cav_mae_base.py:216-741). Public API parity: ``__call__(audio,
imgs, mask_ratio_a, mask_ratio_v, mae_loss_weight, contrast_loss_weight,
mask_mode)`` returns the same 8-tuple
(loss, loss_mae, loss_mae_a, loss_mae_v, loss_c, mask_a, mask_v, c_acc).

Structure parity notes:
* TWO full encoder copies: ``vit`` and ``ast`` (ast = deepcopy of vit at init,
  cav_mae_base.py:303). The MAE branch runs audio through ast blocks with the
  shared (modality=None) norms and video through vit blocks with 'v'
  (cav_mae_base.py:483-495); the contrastive branch runs both modalities
  through vit with 'a'/'v' routing (cav_mae_base.py:554-566).
* MAE mask ratio is hard-coded 0.75 in forward regardless of args
  (cav_mae_base.py:696); the mmixed contrastive branch ignores the ratio args
  and uses chunk ratios 0.2*i (cav_mae_base.py:546-549).
* Decoder: 768->512 embed, zero-init TRAINABLE pos embeds / mask token /
  modality embeds (cav_mae_base.py:311-337 — never sin-cos initialized), 8
  blocks dim 512 / 16 heads, per-modality pred heads 512->256 and 512->768.
* mm_layer_1/2 (copies of encoder block 11 at init, cav_mae_base.py:306-307)
  run over the concatenated kept tokens with 'a' norms before the decoder
  (cav_mae_base.py:699-700).

TPU-first departures (mathematically equivalent):
* The multi-ratio contrastive encoder defaults to a single batched
  full-length encode with per-sample attention key-validity masks + masked
  mean-pool ('padded' impl) instead of 5 variable-length chunk encodes —
  one static shape, full MXU utilization. 'exact' impl mirrors the
  reference's chunked gather for parity testing.
* The global-batch embedding gather (GatherLayer, gather_layer.py:21-37) is
  ``jax.lax.all_gather`` over the 'data' mesh axis (differentiable; its
  transpose is a reduce-scatter).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from avsiam_tpu.configs import CAVMAEConfig
from avsiam_tpu.models.layers import (LayerNormFP32, ModalityBlock,
                                      SiameseViT)
from avsiam_tpu.ops import masking as mk
from avsiam_tpu.ops.contrastive import info_nce_gathered
from avsiam_tpu.ops.gather import take_batch, take_tokens
from avsiam_tpu.ops.patchify import audio_to_image, patchify


def chunk_sizes(batch: int, num_chunks: int) -> list[int]:
    """torch.chunk semantics: ceil(B/n)-sized chunks, last one smaller; empty
    chunks dropped (cav_mae_base.py:466 ``torch.chunk(perm, 5)``)."""
    size = -(-batch // num_chunks)
    sizes = []
    rem = batch
    while rem > 0:
        sizes.append(min(size, rem))
        rem -= size
    return sizes


def _pool_chunk_rows(x: jnp.ndarray, chunks: tuple) -> jnp.ndarray:
    """Per-chunk mean pooling over a [T, C] row-concat stream: chunk i
    occupies rows [off_i, off_i + B_i*N_i) and pools to [B_i, 1, C] — the
    token-concat form of `_encode_contrastive`'s `jnp.mean(x, axis=1)`."""
    parts, off = [], 0
    for b, n in chunks:
        rows = x[off:off + b * n].reshape(b, n, -1)
        parts.append(jnp.mean(rows, axis=1, keepdims=True))
        off += b * n
    return jnp.concatenate(parts, axis=0)


class MAEDecoder(nn.Module):
    """MAE decoder. Parity: cav_mae_base.py:311-337, 597-638."""

    cfg: CAVMAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        d = c.decoder
        p = c.vit.patch_size
        self.embed = nn.Dense(d.dim, dtype=self.dtype, param_dtype=jnp.float32,
                              name="embed")
        zeros = nn.initializers.zeros
        self.pos_embed_a = self.param(
            "pos_embed_a", zeros, (1, c.vit.num_audio_tokens, d.dim), jnp.float32)
        self.pos_embed_v = self.param(
            "pos_embed_v", zeros, (1, c.vit.num_video_tokens, d.dim), jnp.float32)
        self.mask_token = self.param("mask_token", zeros, (1, 1, d.dim),
                                     jnp.float32)
        self.modality_a = self.param("modality_a", zeros, (1, 1, d.dim),
                                     jnp.float32)
        self.modality_v = self.param("modality_v", zeros, (1, 1, d.dim),
                                     jnp.float32)
        # The decoder inherits the encoder's MLP impl unless overridden.
        # (A round-4 guard here broke the inherited lnfres+lnfres combination
        # after two "catastrophic" 77-116 clips/s readings; round-5
        # re-measurement could not reproduce them — lnfres on both sides is
        # in fact ~4.7 ms/step FASTER than fres and is now what 'auto'
        # resolves to on TPU. BENCH_NOTES round 5 records the retraction.)
        dec_mlp = c.dec_mlp_impl or c.mlp_impl
        self.blocks = [
            ModalityBlock(d.dim, d.num_heads, d.mlp_ratio, True, d.ln_eps,
                          self.dtype, c.attn_impl, c.vit.gelu,
                          dec_mlp, name=f"blocks_{i}")
            for i in range(d.depth)
        ]
        self.norm = LayerNormFP32(d.dim, epsilon=d.ln_eps, dtype=self.dtype,
                                  name="norm")
        self.pred_a = nn.Dense(p * p * 1, dtype=self.dtype,
                               param_dtype=jnp.float32, name="pred_a")
        self.pred_v = nn.Dense(p * p * 3, dtype=self.dtype,
                               param_dtype=jnp.float32, name="pred_v")

    def __call__(self, x, ids_restore_a, ids_restore_v,
                 len_keep_a: int, len_keep_v: int):
        c = self.cfg
        La = c.vit.num_audio_tokens
        Lv = c.vit.num_video_tokens
        B = x.shape[0]
        x = self.embed(x)
        D = x.shape[-1]

        def _restore(kept, ids_restore, total):
            n_mask = total - kept.shape[1]
            mask_tokens = jnp.broadcast_to(
                self.mask_token.astype(kept.dtype), (B, n_mask, D))
            full = jnp.concatenate([kept, mask_tokens], axis=1)
            # one-hot GEMM restore: take_along_axis's scatter-add backward
            # costs ~5 ms at this shape on TPU (ops/gather.py)
            return take_tokens(full, ids_restore)

        a_ = _restore(x[:, :len_keep_a], ids_restore_a, La)
        v_ = _restore(x[:, len_keep_a:], ids_restore_v, Lv)
        a_ = a_ + (self.pos_embed_a + self.modality_a).astype(a_.dtype)
        v_ = v_ + (self.pos_embed_v + self.modality_v).astype(v_.dtype)
        x = jnp.concatenate([a_, v_], axis=1)
        # run the blocks at the next SUBLANE multiple (708 -> 720 for bf16):
        # ONE pad here replaces a pad + slice copy pair around every block's
        # attention kernel (measured ~0.9 ms each at this shape — the step is
        # bandwidth-bound, BENCH_NOTES.md round 2). Rows are the sublane dim
        # of the [B, N, C] tile, so 16 (bf16) / 8 (f32) alignment is all the
        # kernels and XLA tiling need; round 2 padded to 128 (768 rows),
        # paying 13% more decoder N^2 softmax than necessary. Pad rows are
        # excluded from attention as keys (masked == dropped,
        # tests/test_attention); as queries their outputs are sliced away
        # before the pred heads.
        Ltot = La + Lv
        sub = 16 if x.dtype == jnp.bfloat16 else 8
        Lpad = -(-Ltot // sub) * sub
        key_valid = None
        if Lpad != Ltot:
            x = jnp.pad(x, ((0, 0), (0, Lpad - Ltot), (0, 0)))
            key_valid = jnp.broadcast_to(jnp.arange(Lpad) < Ltot,
                                         (B, Lpad))
        for blk in self.blocks:
            x = blk(x, None, key_valid)
        x = self.norm(x)
        return self.pred_a(x[:, :La]), self.pred_v(x[:, La:Ltot])


class CAVMAEPretrain(nn.Module):
    """The pretraining model. RNG collections: 'mask' (token masking) and
    'perm' (mmixed batch permutations)."""

    cfg: CAVMAEConfig

    def setup(self):
        c = self.cfg
        self.vit = SiameseViT(c.vit, c.dtype, c.attn_impl, c.embed_double,
                              c.remat_blocks, c.mlp_impl, name="vit")
        self.ast = SiameseViT(c.vit, c.dtype, c.attn_impl, c.embed_double,
                              c.remat_blocks, c.mlp_impl, name="ast")
        self.mm_layer_1 = ModalityBlock(
            c.vit.dim, c.vit.num_heads, c.vit.mlp_ratio, c.vit.qkv_bias,
            c.vit.block_ln_eps, c.dtype, c.attn_impl, c.vit.gelu,
            c.mlp_impl, name="mm_layer_1")
        self.mm_layer_2 = ModalityBlock(
            c.vit.dim, c.vit.num_heads, c.vit.mlp_ratio, c.vit.qkv_bias,
            c.vit.block_ln_eps, c.dtype, c.attn_impl, c.vit.gelu,
            c.mlp_impl, name="mm_layer_2")
        self.decoder = MAEDecoder(c, c.dtype, name="decoder")

    def _materialize_all_params(self, audio, imgs):
        """Touch every submodule once during init so the param tree is the
        COMPLETE reference structure (the reference's ast_base is a full
        deepcopy and every block carries all 3 norm sets, even where unused —
        cav_mae_base.py:303,102-211). Runs only under ``init``; costs a few
        1-token dummy calls."""
        c = self.cfg
        tok = jnp.zeros((1, 1, c.vit.dim), c.dtype)
        dtok = jnp.zeros((1, 1, c.decoder.dim), c.dtype)
        for blk in (*self.vit.blocks, *self.ast.blocks,
                    self.mm_layer_1, self.mm_layer_2):
            for m in (None, "a", "v"):
                blk(tok, m)
        for blk in self.decoder.blocks:
            for m in (None, "a", "v"):
                blk(dtok, m)
        self.ast.embed_audio(audio[:1])
        self.ast.embed_video(imgs[:1])
        for trunk in (self.vit, self.ast):
            trunk.norm(tok)
            trunk.norm_a(tok)

    # ------------------------------------------------------------------
    # MAE encoder (cav_mae_base.py:441-504)
    # ------------------------------------------------------------------
    def forward_encoder(self, audio, imgs, mask_ratio_a: float,
                        mask_ratio_v: float):
        c = self.cfg
        a = self.vit.embed_audio(audio)
        v = self.vit.embed_video(imgs)
        len_keep_a = mk.len_keep_for(c.vit.num_audio_tokens, mask_ratio_a)
        len_keep_v = mk.len_keep_for(c.vit.num_video_tokens, mask_ratio_v)
        rng_a = self.make_rng("mask")
        rng_v = self.make_rng("mask")
        a, mask_a, ids_restore_a = mk.random_masking(rng_a, a, len_keep_a)
        v, mask_v, ids_restore_v = mk.random_masking(rng_v, v, len_keep_v)
        # audio through the ast copy with the SHARED norms (modality=None),
        # video through vit with 'v' routing (cav_mae_base.py:483-495)
        for i in range(c.vit.depth):
            v = self.vit.blocks[i](v, "v")
            a = self.ast.blocks[i](a, None)
        cv = self.vit.norm(v)
        ca = self.ast.norm_a(a)
        x = jnp.concatenate([ca, cv], axis=1)
        return x, mask_a, ids_restore_a, mask_v, ids_restore_v

    # ------------------------------------------------------------------
    # Multi-ratio contrastive encoder (cav_mae_base.py:508-594)
    # ------------------------------------------------------------------
    def forward_encoder_mmixed(self, audio, imgs):
        c = self.cfg
        a = self.vit.embed_audio(audio)
        v = self.vit.embed_video(imgs)
        B = a.shape[0]
        f, t = c.vit.audio_grid
        La, Lv = c.vit.num_audio_tokens, c.vit.num_video_tokens

        sizes = chunk_sizes(B, c.mmixed_num_chunks)
        ratios = [c.mmixed_ratio_step * i for i in range(len(sizes))]
        perm_a = jax.random.permutation(self.make_rng("perm"), B)
        perm_v = jax.random.permutation(self.make_rng("perm"), B)

        assert c.mmixed_impl in (
            "exact", "tconcat", "bucketed", "packed", "padded"), \
            c.mmixed_impl  # no silent fallback: a typo'd impl must not
        # quietly run (and get benchmarked as) the padded path
        if c.mmixed_impl == "exact":
            ca, cv = self._mmixed_exact(a, v, perm_a, perm_v, sizes, ratios)
        elif c.mmixed_impl == "tconcat":
            ca, cv = self._mmixed_tconcat(a, v, perm_a, perm_v, sizes, ratios)
        elif c.mmixed_impl == "bucketed":
            ca, cv = self._mmixed_bucketed(a, v, perm_a, perm_v, sizes,
                                           ratios)
        elif c.mmixed_impl == "packed":
            ca, cv = self._mmixed_packed(a, v, perm_a, perm_v, sizes, ratios)
        else:
            ca, cv = self._mmixed_padded(a, v, perm_a, perm_v, sizes, ratios)
        return ca, cv

    def _encode_contrastive(self, x, modality: str,
                            key_valid: Optional[jnp.ndarray] = None):
        x = self.vit.run_blocks(x, modality, key_valid)
        x = self.vit.final_norm(x, modality)
        if key_valid is None:
            return jnp.mean(x, axis=1, keepdims=True)
        return mk.masked_mean(x, key_valid)[:, None, :]

    def _mmixed_exact(self, a, v, perm_a, perm_v, sizes, ratios):
        """Reference-faithful chunked encode: each chunk gathered to its own
        static length and encoded separately (cav_mae_base.py:543-594)."""
        c = self.cfg
        f, t = c.vit.audio_grid
        La, Lv = a.shape[1], v.shape[1]
        a_parts, v_parts = [], []
        off = 0
        for i, size in enumerate(sizes):
            idx_a = jax.lax.dynamic_slice_in_dim(perm_a, off, size)
            idx_v = jax.lax.dynamic_slice_in_dim(perm_v, off, size)
            a_i = take_batch(a, idx_a)
            v_i = take_batch(v, idx_v)
            a_i, _, _ = mk.random_masking_structured(
                self.make_rng("mask"), a_i, ratios[i], t=t, f=f, mode="tf")
            v_i, _, _ = mk.random_masking(
                self.make_rng("mask"), v_i, mk.len_keep_for(Lv, ratios[i]))
            a_parts.append(self._encode_contrastive(a_i, "a"))
            v_parts.append(self._encode_contrastive(v_i, "v"))
            off += size
        ca = jnp.concatenate(a_parts, axis=0)
        cv = jnp.concatenate(v_parts, axis=0)
        # inverse-permute back to input order (cav_mae_base.py:575-590)
        ca = take_batch(ca, jnp.argsort(perm_a))
        cv = take_batch(cv, jnp.argsort(perm_v))
        return ca, cv

    def _mmixed_tconcat(self, a, v, perm_a, perm_v, sizes, ratios):
        """`exact` with all chunks' tokens row-concatenated into ONE [T, C]
        stream per modality (identical RNG draws, gathers and keep sets —
        per-row math matches `_mmixed_exact`): every LN/GEMM/GELU runs once
        over the concatenated rows while attention runs per chunk at its
        exact length on free contiguous-row views of the shared qkv output
        (ModalityBlock.call_tconcat). Motivation: profiling showed the
        chunked backward spends ~40 ms/step accumulating per-chunk partial
        weight-gradient GEMMs (5 small-row partials + adds per weight per
        block); one long-row GEMM per weight removes that entirely.
        Same math as the reference's per-chunk encode
        (cav_mae_base.py:543-594)."""
        c = self.cfg
        f, t = c.vit.audio_grid
        Lv = v.shape[1]
        a_rows, v_rows = [], []
        a_chunks, v_chunks = [], []
        off = 0
        for i, size in enumerate(sizes):
            idx_a = jax.lax.dynamic_slice_in_dim(perm_a, off, size)
            idx_v = jax.lax.dynamic_slice_in_dim(perm_v, off, size)
            a_i = take_batch(a, idx_a)
            v_i = take_batch(v, idx_v)
            a_i, _, _ = mk.random_masking_structured(
                self.make_rng("mask"), a_i, ratios[i], t=t, f=f, mode="tf")
            v_i, _, _ = mk.random_masking(
                self.make_rng("mask"), v_i, mk.len_keep_for(Lv, ratios[i]))
            a_rows.append(a_i.reshape(-1, a_i.shape[-1]))
            v_rows.append(v_i.reshape(-1, v_i.shape[-1]))
            a_chunks.append((size, a_i.shape[1]))
            v_chunks.append((size, v_i.shape[1]))
            off += size
        a_chunks, v_chunks = tuple(a_chunks), tuple(v_chunks)
        xa = self.vit.run_blocks_tconcat(jnp.concatenate(a_rows, axis=0),
                                         "a", a_chunks)
        xv = self.vit.run_blocks_tconcat(jnp.concatenate(v_rows, axis=0),
                                         "v", v_chunks)
        xa = self.vit.final_norm(xa, "a")
        xv = self.vit.final_norm(xv, "v")
        ca = _pool_chunk_rows(xa, a_chunks)
        cv = _pool_chunk_rows(xv, v_chunks)
        ca = take_batch(ca, jnp.argsort(perm_a))
        cv = take_batch(cv, jnp.argsort(perm_v))
        return ca, cv

    def _mmixed_bucketed(self, a, v, perm_a, perm_v, sizes, ratios):
        """`exact` with lane-aligned chunk lengths: identical RNG draws and
        keep sets, but each chunk's kept tokens are gathered into the next
        multiple of 128 rows (inert zero tail rows, excluded from attention
        by a static key-validity mask and from pooling by masked_mean —
        mathematically identical to _mmixed_exact; tested). Result: the
        attention kernels see already-aligned sequences, so the ~10
        pad/slice copies per block that the exact path pays around the
        Pallas calls vanish. Costs ~20% more encoder GEMM rows, which was
        measured to cost MORE than the saved pads on v5e (134.4 clips/s vs
        exact's 141.8 at B=32, BENCH_NOTES.md round 2) — kept as a variant,
        not the default."""
        c = self.cfg
        f, t = c.vit.audio_grid
        La, Lv = a.shape[1], v.shape[1]
        lane = 128
        a_parts, v_parts = [], []
        off = 0
        for i, size in enumerate(sizes):
            idx_a = jax.lax.dynamic_slice_in_dim(perm_a, off, size)
            idx_v = jax.lax.dynamic_slice_in_dim(perm_v, off, size)
            a_i = take_batch(a, idx_a)
            v_i = take_batch(v, idx_v)
            keep_a = mk.len_keep_for(La, ratios[i])
            keep_v = mk.len_keep_for(Lv, ratios[i])
            pad_a = -(-keep_a // lane) * lane
            pad_v = -(-keep_v // lane) * lane
            a_i, _, _ = mk.random_masking_structured(
                self.make_rng("mask"), a_i, ratios[i], t=t, f=f, mode="tf",
                pad_to=pad_a)
            v_i, _, _ = mk.random_masking(
                self.make_rng("mask"), v_i, keep_v, pad_to=pad_v)
            valid_a = None if pad_a == keep_a else jnp.broadcast_to(
                jnp.arange(pad_a) < keep_a, (size, pad_a))
            valid_v = None if pad_v == keep_v else jnp.broadcast_to(
                jnp.arange(pad_v) < keep_v, (size, pad_v))
            a_parts.append(self._encode_contrastive(a_i, "a", valid_a))
            v_parts.append(self._encode_contrastive(v_i, "v", valid_v))
            off += size
        ca = jnp.concatenate(a_parts, axis=0)
        cv = jnp.concatenate(v_parts, axis=0)
        ca = take_batch(ca, jnp.argsort(perm_a))
        cv = take_batch(cv, jnp.argsort(perm_v))
        return ca, cv

    def _mmixed_packed(self, a, v, perm_a, perm_v, sizes, ratios):
        """TPU fast path: the chunked encode's exact FLOPs, restructured for
        the MXU. The per-token work (LN, qkv/proj, MLP) runs over ONE packed
        token array covering BOTH modalities and all 5 chunks — legal because
        attention/MLP weights are shared across modalities (the siamese
        mechanism) and chunk boundaries are static — while the attention core
        runs per chunk on static slices of the packed qkv. Identical math to
        ``_mmixed_exact`` under the same RNG draws (tested); ~10 medium GEMM
        dispatches per block collapse into 3 large ones.
        """
        c = self.cfg
        f, t = c.vit.audio_grid
        Lv = v.shape[1]
        D = a.shape[-1]
        # identical chunk gathers + masking draws as _mmixed_exact
        a_parts, v_parts = [], []
        off = 0
        for i, size in enumerate(sizes):
            idx_a = jax.lax.dynamic_slice_in_dim(perm_a, off, size)
            idx_v = jax.lax.dynamic_slice_in_dim(perm_v, off, size)
            a_i = take_batch(a, idx_a)
            v_i = take_batch(v, idx_v)
            a_i, _, _ = mk.random_masking_structured(
                self.make_rng("mask"), a_i, ratios[i], t=t, f=f, mode="tf")
            v_i, _, _ = mk.random_masking(
                self.make_rng("mask"), v_i, mk.len_keep_for(Lv, ratios[i]))
            a_parts.append(a_i)
            v_parts.append(v_i)
            off += size

        parts = a_parts + v_parts
        segs = [(p.shape[0], p.shape[1]) for p in parts]  # static
        offs = []
        o = 0
        for s, l in segs:
            offs.append(o)
            o += s * l
        n_audio = sum(s * l for s, l in segs[:len(a_parts)])
        x = jnp.concatenate([p.reshape(-1, D) for p in parts], axis=0)

        def routed(x, norm_a, norm_v):
            return jnp.concatenate([norm_a(x[:n_audio]),
                                    norm_v(x[n_audio:])], axis=0)

        for blk in self.vit.blocks:
            qkv = blk.attn.qkv(routed(x, blk.norm1_a, blk.norm1_v))
            outs = []
            for (s, l), o in zip(segs, offs):
                seg = qkv[o:o + s * l].reshape(s, l, -1)
                out, _ = blk.attn.attend(seg)
                outs.append(out.reshape(s * l, D))
            x = x + blk.attn.proj(jnp.concatenate(outs, axis=0))
            x = x + blk.mlp(routed(x, blk.norm2_a, blk.norm2_v))

        x = routed(x, self.vit.norm_a, self.vit.norm)
        pooled = [x[o:o + s * l].reshape(s, l, D).mean(axis=1, keepdims=True)
                  for (s, l), o in zip(segs, offs)]
        ca = jnp.concatenate(pooled[:len(a_parts)], axis=0)
        cv = jnp.concatenate(pooled[len(a_parts):], axis=0)
        ca = take_batch(ca, jnp.argsort(perm_a))
        cv = take_batch(cv, jnp.argsort(perm_v))
        return ca, cv

    def _mmixed_padded(self, a, v, perm_a, perm_v, sizes, ratios):
        """TPU fast path: one batched full-length encode per modality with
        per-sample keep masks (equivalent: masked keys contribute nothing to
        kept-token attention; mean-pool over kept tokens only)."""
        c = self.cfg
        f, t = c.vit.audio_grid
        B, La = a.shape[0], a.shape[1]
        Lv = v.shape[1]

        # per-position chunk id along the permutation, then scatter to samples
        chunk_of_pos = jnp.concatenate(
            [jnp.full((s,), i, dtype=jnp.int32) for i, s in enumerate(sizes)])
        chunk_a = jnp.zeros((B,), jnp.int32).at[perm_a].set(chunk_of_pos)
        chunk_v = jnp.zeros((B,), jnp.int32).at[perm_v].set(chunk_of_pos)

        # static per-chunk counts, computed exactly as the reference's int()
        keep_a_counts = jnp.array(
            [mk.len_keep_for(La, r) for r in ratios], jnp.int32)
        keep_v_counts = jnp.array(
            [mk.len_keep_for(Lv, r) for r in ratios], jnp.int32)
        boost_t_counts = jnp.array(
            [int(t * r * 0.7) for r in ratios], jnp.int32)
        boost_f_counts = jnp.array(
            [int(f * r * 0.7) for r in ratios], jnp.int32)

        # --- audio: structured 'tf' noise with per-sample boost counts ---
        rng = self.make_rng("mask")
        k_noise, k_t, k_f, k_v = jax.random.split(rng, 4)
        noise = jax.random.uniform(k_noise, (B, f, t))
        rank_t = jnp.argsort(jnp.argsort(
            jax.random.uniform(k_t, (B, t)), axis=1), axis=1)
        rank_f = jnp.argsort(jnp.argsort(
            jax.random.uniform(k_f, (B, f)), axis=1), axis=1)
        boost = jnp.logical_or(
            (rank_t < boost_t_counts[chunk_a][:, None])[:, None, :],
            (rank_f < boost_f_counts[chunk_a][:, None])[:, :, None])
        noise = jnp.where(boost, 1.1, noise).reshape(B, La)
        ranks_a = jnp.argsort(jnp.argsort(noise, axis=1), axis=1)
        keep_a = ranks_a < keep_a_counts[chunk_a][:, None]

        # --- video: unstructured with per-sample keep counts ---
        noise_v = jax.random.uniform(k_v, (B, Lv))
        ranks_v = jnp.argsort(jnp.argsort(noise_v, axis=1), axis=1)
        keep_v = ranks_v < keep_v_counts[chunk_v][:, None]

        ca = self._encode_contrastive(a, "a", keep_a)
        cv = self._encode_contrastive(v, "v", keep_v)
        return ca, cv

    # ------------------------------------------------------------------
    # Feature extraction / inpainting (original-CAVMAE parity: the bytecode
    # variants expose forward_feat and forward_inpaint, SURVEY.md section 0;
    # retrieval.py:76 consumes forward_feat)
    # ------------------------------------------------------------------
    def forward_feat(self, audio, imgs):
        """Unmasked per-modality token features via the siamese trunk."""
        a = self.vit.embed_audio(audio)
        v = self.vit.embed_video(imgs)
        a = self.vit.run_blocks(a, "a")
        v = self.vit.run_blocks(v, "v")
        return self.vit.norm_a(a), self.vit.norm(v)

    def forward_inpaint(self, audio, imgs, mask_ratio_a: float = 0.75,
                        mask_ratio_v: float = 0.75):
        """MAE reconstruction: returns (pred_audio_img [B,1,F,T_img],
        pred_video [B,3,H,W], mask_a, mask_v) with predictions unpatchified
        to input space."""
        from avsiam_tpu.ops.patchify import unpatchify
        c = self.cfg
        x, mask_a, ids_ra, mask_v, ids_rv = self.forward_encoder(
            audio, imgs, mask_ratio_a, mask_ratio_v)
        x = self.mm_layer_1(x, "a")
        x = self.mm_layer_2(x, "a")
        len_keep_a = mk.len_keep_for(c.vit.num_audio_tokens, mask_ratio_a)
        len_keep_v = mk.len_keep_for(c.vit.num_video_tokens, mask_ratio_v)
        pred_a, pred_v = self.decoder(x, ids_ra, ids_rv,
                                      len_keep_a, len_keep_v)
        f, t = c.vit.audio_grid
        gh, gw = c.vit.video_grid
        img_a = unpatchify(pred_a, 1, f, t, c.vit.patch_size)
        img_v = unpatchify(pred_v, 3, gh, gw, c.vit.patch_size)
        return img_a, img_v, mask_a, mask_v

    # ------------------------------------------------------------------
    # MAE loss (cav_mae_base.py:663-683)
    # ------------------------------------------------------------------
    def forward_mae_loss(self, inputs, pred, mask, modality: str):
        c = self.cfg
        p = c.vit.patch_size
        if modality == "a":
            img = audio_to_image(inputs)
            target = patchify(img, p)
        else:
            target = patchify(inputs, p)
        target = target.astype(jnp.float32)
        pred = pred.astype(jnp.float32)
        loss = jnp.mean((pred - target) ** 2, axis=-1)  # [N, L]
        return jnp.sum(loss * mask) / jnp.sum(mask)

    # ------------------------------------------------------------------
    # Full forward (cav_mae_base.py:685-741)
    # ------------------------------------------------------------------
    def __call__(self, audio, imgs, mask_ratio_a: float = 0.75,
                 mask_ratio_v: float = 0.75, mae_loss_weight: float = 1.0,
                 contrast_loss_weight: float = 0.01,
                 mask_mode: str = "unstructured",
                 axis_name: Optional[str] = None):
        c = self.cfg
        zero = jnp.zeros((), jnp.float32)
        La = c.vit.num_audio_tokens
        Lv = c.vit.num_video_tokens

        if self.is_initializing():
            self._materialize_all_params(audio, imgs)

        if mae_loss_weight != 0:
            # ratios hard-coded 0.75 regardless of args (cav_mae_base.py:696)
            x, mask_a, ids_ra, mask_v, ids_rv = self.forward_encoder(
                audio, imgs, c.mae_mask_ratio, c.mae_mask_ratio)
            # mm layers run with 'a' norms over the concatenated kept tokens
            # (cav_mae_base.py:699-700)
            x = self.mm_layer_1(x, "a")
            x = self.mm_layer_2(x, "a")
            len_keep_a = mk.len_keep_for(La, c.mae_mask_ratio)
            len_keep_v = mk.len_keep_for(Lv, c.mae_mask_ratio)
            pred_a, pred_v = self.decoder(x, ids_ra, ids_rv,
                                          len_keep_a, len_keep_v)
            loss_mae_a = self.forward_mae_loss(audio, pred_a, mask_a, "a")
            loss_mae_v = self.forward_mae_loss(imgs, pred_v, mask_v, "v")
            # note: the weight only gates the branch; the sum is unweighted
            # (cav_mae_base.py:707)
            loss_mae = loss_mae_a + loss_mae_v
        else:
            loss_mae_a = loss_mae_v = loss_mae = zero
            mask_a = jnp.zeros((audio.shape[0], La), jnp.float32)
            mask_v = jnp.zeros((imgs.shape[0], Lv), jnp.float32)

        if contrast_loss_weight != 0:
            ca, cv = self.forward_encoder_mmixed(audio, imgs)
            loss_c, c_acc = info_nce_gathered(
                jnp.mean(ca, axis=1), jnp.mean(cv, axis=1),
                temperature=c.contrast_temp, bidirect=True,
                axis_name=axis_name)
            loss_c = contrast_loss_weight * loss_c
            # parity: the mmixed call at cav_mae_base.py:722 OVERWRITES
            # mask_a/mask_v with forward_encoder_mmixed's returns — which are
            # None (cav_mae_base.py:594) — even when the MAE branch also ran
            mask_a = mask_v = None
        else:
            loss_c = c_acc = zero

        loss = loss_c + loss_mae
        return loss, loss_mae, loss_mae_a, loss_mae_v, loss_c, mask_a, mask_v, c_acc

"""Core transformer layers: MLP, attention wrapper, modality-routed block,
patch embedding, and the shared siamese ViT trunk.

These are built TPU-first: patch embedding is reshape+matmul (MXU) instead of
a conv, attention dispatches to the fused Pallas kernel (ops/attention.py),
LayerNorm statistics run in float32 under bf16 compute, and every module takes
a static ``modality`` string so XLA traces straight-line code.

Reference parity:
* Attention — src/models/cav_mae_base.py:31-83 (timm-style MHSA, qkv bias).
* Block — src/models/cav_mae_base.py:102-211: pre-LN block with THREE norm
  sets (norm1/norm1_a/norm1_v, norm2/...); the static modality in
  {None,'a','v','av'} selects the norms while attention + MLP weights are
  shared across modalities — the "siamese" mechanism.
* PatchEmbed — src/models/cav_mae_base.py:85-100 (Conv2d k=16 s=16).
* SiameseViT — the surgically-modified timm ViT-B of cav_mae_base.py:236-303:
  video + audio patch embeds, full [1,197,D] pos embed (CLS row kept for
  checkpoint parity but unused), audio pos embed [1,512,D], per-modality final
  norms, and the x2 embedding doubling quirk (cav_mae_base.py:450,455).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from avsiam_tpu.configs import ViTConfig
from avsiam_tpu.ops.attention import attention_qkv
from avsiam_tpu.ops.patchify import audio_to_image, patchify

Dtype = Any


class _LNParams(nn.Module):
    """Parameter holder matching nn.LayerNorm's tree ('scale' ones, 'bias'
    zeros, f32) so checkpoints/importers are unchanged by the custom-VJP
    LayerNorm compute path."""

    features: int

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones,
                                (self.features,), jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)


class LayerNormFP32(nn.Module):
    """LayerNorm with float32 statistics; output cast back to ``dtype``.

    Compute goes through ops/layernorm.py: identical forward math to flax
    nn.LayerNorm (mean-of-squares variance), with a fused single-read Pallas
    backward on TPU (XLA re-reads the activations once per dx fusion and
    once per dgamma fusion; the step is bandwidth-bound — BENCH_NOTES.md).

    setup-style with explicit ``features`` so the params exist without a
    call: ModalityBlock's 'lnfres' MLP path (ops/mlp.py:fused_ln_mlp) reads
    ``.scale``/``.bias`` directly and folds the LN into the MLP kernel. The
    param tree ('ln'/{scale,bias}, f32 ones/zeros) is unchanged from the
    previous nn.LayerNorm submodule, so checkpoints/importers are unaffected.
    """

    features: int
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    def setup(self):
        self.ln = _LNParams(self.features)

    @property
    def scale(self):
        return self.ln.scale

    @property
    def bias(self):
        return self.ln.bias

    def __call__(self, x):
        from avsiam_tpu.ops.layernorm import (LN_IMPL, _ln_fwd_math,
                                              layer_norm_fp32)
        if LN_IMPL != "pallas":
            # default: plain jnp ops (flax nn.LayerNorm's exact formula,
            # ops/layernorm.py:_ln_fwd_math) + XLA autodiff — the measured
            # winner. f32 in, f32 math, cast to self.dtype out.
            y = _ln_fwd_math(x.astype(jnp.float32), self.ln.scale,
                             self.ln.bias, self.epsilon)
            return y.astype(self.dtype)
        # x passes in its own dtype: the custom VJP stores the bf16 x as its
        # residual (not an upcast f32 copy) and casts to f32 internally
        y = layer_norm_fp32(x, self.ln.scale, self.ln.bias, self.epsilon)
        return y.astype(self.dtype)


class DenseParams(nn.Module):
    """Holds a Dense layer's params (same tree/init as nn.Dense: 'kernel'
    lecun-normal [in, out], 'bias' zeros) without binding the compute — the
    fused MLP kernel consumes the raw weights."""

    in_features: int
    features: int

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.in_features, self.features),
                                 jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)


class Mlp(nn.Module):
    """timm Mlp parity: fc1 -> GELU (exact erf by default) -> fc2.

    ``gelu`` selects the activation numerics (ops/gelu.py: 'erf' exact parity,
    'cheb'/'ans' erf-grade fast approximations, 'tanh'). ``impl``:

    * 'dense'     — plain XLA two-GEMM form; autodiff saves BOTH [*, 4D]
                    intermediates (pre-GELU h and gelu(h)) as residuals.
    * 'remat_g'   — same forward, but only gelu(h) is saved: the backward
                    recomputes h with one extra fc1 GEMM instead of reading
                    it from HBM. The step is bandwidth-bound on this chip
                    (~330 GB/s measured vs ~330 TF/s GEMM) so trading one
                    [*, 4D] HBM round-trip for MXU FLOPs is a win. NO extra
                    transcendentals: the backward computed gelu'(h) from h
                    either way. Identical math/gradients (tested).
    * 'remat_all' — neither intermediate saved: backward recomputes fc1 AND
                    gelu (one extra erf pass). Maximum residual-traffic
                    saving, costs one fwd-GELU re-evaluation.
    * 'fused'     — Pallas fused kernel (ops/mlp.py): the hidden never
                    leaves VMEM (measured slower than XLA's GEMMs, kept).
    * 'fres'      — Pallas forward (hidden stays in VMEM, emits the bf16
                    pre-GELU hidden as a residual) + plain-XLA saved-residual
                    backward. Measured-best on v5e (BENCH_NOTES.md round 3:
                    198.3 vs dense 181.4 clips/s at B=64).
    * 'auto'      — 'fres' on the TPU backend, 'dense' elsewhere (interpret-
                    mode Pallas on CPU is correct but slow).
    * 'lnfres'    — accepted for CLI passthrough; at the standalone-Mlp level
                    it behaves as 'fres' (the LN fold happens one level up,
                    in ModalityBlock._mlp_res, where the pre-MLP norm lives).
    """

    dim: int
    hidden_dim: int
    dtype: Dtype = jnp.float32
    gelu: str = "erf"
    impl: str = "dense"

    def setup(self):
        self.fc1 = DenseParams(self.dim, self.hidden_dim)
        self.fc2 = DenseParams(self.hidden_dim, self.dim)

    def __call__(self, x):
        import functools

        import jax
        from jax.ad_checkpoint import checkpoint_name

        from avsiam_tpu.ops import gelu as gelu_ops
        dt = self.dtype
        x = x.astype(dt)
        impl = self.impl
        if impl == "auto":
            impl = "fres" if jax.default_backend() == "tpu" else "dense"
        if impl == "lnfres":
            # LN folding happens at the block level (ModalityBlock._mlp_res);
            # a standalone Mlp call (e.g. the 'av' two-norm tail) runs the
            # plain 'fres' kernel on its already-normalized input.
            impl = "fres"
        if impl in ("fused", "fbwd", "fres"):
            from avsiam_tpu.ops.mlp import fused_mlp
            return fused_mlp(x, self.fc1.kernel, self.fc1.bias,
                             self.fc2.kernel, self.fc2.bias, gelu=self.gelu,
                             impl=impl)
        w1 = self.fc1.kernel.astype(dt)
        b1 = self.fc1.bias.astype(dt)
        w2 = self.fc2.kernel.astype(dt)
        b2 = self.fc2.bias.astype(dt)
        if impl in ("remat_g", "remat_all"):
            policy = (jax.checkpoint_policies.save_only_these_names("mlp_g")
                      if impl == "remat_g"
                      else jax.checkpoint_policies.nothing_saveable)

            @functools.partial(jax.checkpoint, policy=policy)
            def run(x, w1, b1, w2, b2):
                h = jnp.dot(x, w1) + b1
                g = checkpoint_name(gelu_ops.gelu(h, impl=self.gelu), "mlp_g")
                return jnp.dot(g, w2) + b2

            return run(x, w1, b1, w2, b2)
        x = jnp.dot(x, w1) + b1
        # torch nn.GELU() is exact erf; 'cheb'/'ans' are bf16-bit-equivalent
        x = gelu_ops.gelu(x, impl=self.gelu)
        x = jnp.dot(x, w2) + b2
        return x


class Attention(nn.Module):
    """MHSA with fused qkv; dispatches to Pallas/XLA fused attention.

    Parity: cav_mae_base.py:31-83 (scale = head_dim**-0.5, fused SDPA).

    setup-style so the packed mmixed encoder (models/cavmae.py) can drive the
    qkv/proj projections over a token-packed layout while running the
    attention core per chunk; param names ('qkv', 'proj') are unchanged.
    """

    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    def setup(self):
        self.qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias,
                            dtype=self.dtype, param_dtype=jnp.float32)
        self.proj = nn.Dense(self.dim, dtype=self.dtype,
                             param_dtype=jnp.float32)

    def attend(self, qkv, key_valid: Optional[jnp.ndarray] = None):
        """[B, N, 3C] fused projections -> [B, N, C] attention output.

        The raw qkv projection goes to the token-major kernel as-is — the
        Pallas path reads/writes the GEMM's natural layout with NO
        transposes (ops/attention.py:attention_qkv)."""
        B, N, _ = qkv.shape
        H = self.num_heads
        D = self.dim // H
        out = attention_qkv(qkv, H, key_valid=key_valid, impl=self.attn_impl)
        # k is consumed only by the ToMe metric path; the slice is dead code
        # (free) otherwise
        return out, qkv.reshape(B, N, 3, H, D)[:, :, 1]

    def __call__(self, x, key_valid: Optional[jnp.ndarray] = None,
                 tome: bool = False):
        out, k = self.attend(self.qkv(x), key_valid=key_valid)
        out = self.proj(out)
        if tome:
            # mean-head keys as the ToMe matching metric
            # (cav_mae_base.py:80-81 ``return x, k.mean(1)``)
            return out, jnp.mean(k, axis=2)
        return out


class ModalityBlock(nn.Module):
    """Pre-LN ViT block with modality-routed norm sets and shared attn/MLP.

    Parity: cav_mae_base.py:102-211. ``modality`` is static:
      None  -> norm1/norm2 (shared set; MAE audio branch + decoder blocks)
      'a'   -> norm1_a/norm2_a
      'v'   -> norm1_v/norm2_v
      'av'  -> tuple input (a, v): per-modality norms, joint attention; returns
               (out[:, :num_a], x_mid[:, num_a:]) — faithful to the reference's
               return of the PRE-MLP tail for v (cav_mae_base.py:195-211).
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    ln_eps: float = 1e-5
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    gelu: str = "erf"
    mlp_impl: str = "dense"

    def setup(self):
        mk = lambda name: LayerNormFP32(self.dim, epsilon=self.ln_eps,
                                        dtype=self.dtype, name=name)
        self.norm1 = mk("norm1")
        self.norm1_a = mk("norm1_a")
        self.norm1_v = mk("norm1_v")
        self.norm2 = mk("norm2")
        self.norm2_a = mk("norm2_a")
        self.norm2_v = mk("norm2_v")
        self.attn = Attention(self.dim, self.num_heads, self.qkv_bias,
                              self.dtype, self.attn_impl, name="attn")
        self.mlp = Mlp(self.dim, int(self.dim * self.mlp_ratio), self.dtype,
                       self.gelu, self.mlp_impl, name="mlp")

    def __call__(self, x, modality: Optional[str] = None,
                 key_valid: Optional[jnp.ndarray] = None, r: int = 0):
        """``r > 0`` applies ToMe after the attention sub-block (the
        reference's commented ToMe path, cav_mae_base.py:155-166): merge the
        r most similar tokens by mean-head-key matching; merged-away slots
        are masked out of the MLP-residual stream via key_valid composition
        downstream (TPU static-shape formulation, see models/tome.py)."""
        if modality is None:
            n1, n2 = self.norm1, self.norm2
        elif modality == "a":
            n1, n2 = self.norm1_a, self.norm2_a
        elif modality == "v":
            n1, n2 = self.norm1_v, self.norm2_v
        elif modality == "av":
            a, v = x
            num_a = a.shape[1]
            x = jnp.concatenate([self.norm1_a(a), self.norm1_v(v)], axis=1)
            x = x + self.attn(x, key_valid=key_valid)
            a2 = self.norm2_a(x[:, :num_a])
            v2 = self.norm2_v(x[:, num_a:])
            out = x + self.mlp(jnp.concatenate([a2, v2], axis=1))
            return out[:, :num_a], x[:, num_a:]
        else:
            raise ValueError(f"unknown modality: {modality}")
        if r > 0:
            from avsiam_tpu.models.tome import (bipartite_soft_matching,
                                                merge_wavg)
            attn_out, metric = self.attn(n1(x), key_valid=key_valid,
                                         tome=True)
            x = x + attn_out
            assign, keep = bipartite_soft_matching(metric, r)
            x, _ = merge_wavg(assign, x)
            x = self._mlp_res(x, n2)
            return x, keep
        x = x + self.attn(n1(x), key_valid=key_valid)
        x = self._mlp_res(x, n2)
        return x

    def _mlp_res(self, x, n2):
        """The MLP sub-block ``x + mlp(n2(x))``. With ``mlp_impl='lnfres'``
        the pre-MLP LayerNorm, both GEMMs, the GELU, and the residual add run
        as ONE Pallas forward kernel (ops/mlp.py:fused_ln_mlp) — the LN
        output and the MLP output never round-trip HBM. Numerics match the
        unfused 'fres' form (f32 LN stats + f32 GELU under bf16 GEMMs).

        'auto' resolves to lnfres here (TPU, 128-aligned dims only — the
        kernel asserts D/H alignment) as of round 5: the round-4
        "both-sides catastrophe" (77-116 clips/s) did NOT reproduce under
        re-measurement — lnfres+lnfres runs ~4.7 ms/step FASTER than
        fres+fres (310.0 vs 314.7 ms at B=64, BENCH_NOTES round 5), as its
        traffic math always implied; the round-4 readings (2.6-4.2x spread
        between two runs) are now attributed to degraded-tunnel noise.

        The kernel computes the residual add at self.dtype; the unfused path
        computes it in x's own dtype. Blocks always see x at self.dtype in
        this model family, but if a caller ever feeds a promoted (f32) x,
        fall back to the unfused form so residual precision matches."""
        impl = self.mlp_impl
        if (impl == "auto" and jax.default_backend() == "tpu"
                and self.dim % 128 == 0
                and int(self.dim * self.mlp_ratio) % 128 == 0):
            impl = "lnfres"
        if impl == "lnfres" and x.dtype == self.dtype:
            from avsiam_tpu.ops.mlp import fused_ln_mlp
            return fused_ln_mlp(
                x.astype(self.dtype), n2.scale, n2.bias,
                self.mlp.fc1.kernel, self.mlp.fc1.bias,
                self.mlp.fc2.kernel, self.mlp.fc2.bias,
                eps=self.ln_eps, gelu=self.gelu)
        return x + self.mlp(n2(x))

    def call_tconcat(self, x, modality: Optional[str],
                     chunk_shapes: tuple):
        """Token-concat form of ``__call__``: ``x`` is [T, C] — the row-wise
        concatenation of several [B_i, N_i, C] chunks (``chunk_shapes`` =
        static ((B_i, N_i), ...) with T = sum(B_i * N_i)).

        Every token-pointwise op (norms, qkv/proj projections, MLP) runs ONCE
        over all chunks' rows — one GEMM per weight instead of one per chunk —
        while attention still runs per chunk at its exact sequence length
        (free contiguous-row reshape views of the shared qkv GEMM output).
        Per-row math is identical to calling ``__call__`` on each chunk, but
        the backward computes each weight gradient as a single long-contraction
        GEMM instead of accumulating per-chunk partials (the measured dominant
        cost of the chunked mmixed backward — BENCH_NOTES.md round 3)."""
        if modality is None:
            n1, n2 = self.norm1, self.norm2
        elif modality == "a":
            n1, n2 = self.norm1_a, self.norm2_a
        elif modality == "v":
            n1, n2 = self.norm1_v, self.norm2_v
        else:
            raise ValueError(f"tconcat does not route modality {modality!r}")
        qkv = self.attn.qkv(n1(x))  # ONE GEMM over all chunks' rows
        outs, off = [], 0
        for b, n in chunk_shapes:
            r = b * n
            o, _ = self.attn.attend(qkv[off:off + r].reshape(b, n, -1))
            outs.append(o.reshape(r, -1))
            off += r
        x = x + self.attn.proj(jnp.concatenate(outs, axis=0))
        x = self._mlp_res(x, n2)
        return x


class PatchEmbed(nn.Module):
    """Patchify + linear projection (MXU-friendly Conv2d k=p s=p equivalent).

    Kernel layout is [(p, p, c) flattened, dim] so a torch conv weight
    [dim, c, p, p] maps via transpose(2, 3, 1, 0).reshape(-1, dim).
    Parity: cav_mae_base.py:85-100.
    """

    dim: int
    patch_size: int = 16
    in_chans: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: [B, C, H, W]
        tokens = patchify(x, self.patch_size)  # [B, L, p*p*C]
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(tokens)


class SiameseViT(nn.Module):
    """The shared-weight audio/video ViT trunk after the reference's weight
    surgery (cav_mae_base.py:236-303).

    Holds: video patch embed (3ch), audio patch embed (1ch, init = RGB mean of
    the video one at import time), pos_embed [1, 1+196, D] (CLS row retained
    for checkpoint compatibility; only [:, 1:] is used), pos_embed_a
    [1, 512, D] (nearest-interp of the video one at import time), the 12
    modality-routed blocks, and per-modality final norms.
    """

    cfg: ViTConfig
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    embed_double: bool = True
    remat: bool = False
    mlp_impl: str = "dense"

    def setup(self):
        c = self.cfg
        self.patch_embed = PatchEmbed(c.dim, c.patch_size, 3, self.dtype,
                                      name="patch_embed")
        self.patch_embed_a = PatchEmbed(c.dim, c.patch_size, 1, self.dtype,
                                        name="patch_embed_a")
        trunc = nn.initializers.truncated_normal(stddev=0.02)
        self.pos_embed = self.param(
            "pos_embed", trunc, (1, 1 + c.num_video_tokens, c.dim), jnp.float32)
        self.pos_embed_a = self.param(
            "pos_embed_a", trunc, (1, c.num_audio_tokens, c.dim), jnp.float32)
        block_cls = ModalityBlock
        if self.remat:
            block_cls = nn.remat(ModalityBlock, static_argnums=(2,))
        self.blocks = [
            block_cls(c.dim, c.num_heads, c.mlp_ratio, c.qkv_bias,
                      c.block_ln_eps, self.dtype, self.attn_impl,
                      c.gelu, self.mlp_impl, name=f"blocks_{i}")
            for i in range(c.depth)
        ]
        self.norm = LayerNormFP32(c.dim, epsilon=c.final_ln_eps,
                                  dtype=self.dtype, name="norm")
        self.norm_a = LayerNormFP32(c.dim, epsilon=c.final_ln_eps,
                                    dtype=self.dtype, name="norm_a")

    def embed_audio(self, fbank: jnp.ndarray) -> jnp.ndarray:
        """[B, T, F] fbank -> [B, 512, D] tokens (with the x2 quirk).

        Parity: cav_mae_base.py:444-450.
        """
        a = audio_to_image(fbank.astype(self.dtype))
        a = self.patch_embed_a(a)
        a = a + self.pos_embed_a.astype(self.dtype)
        if self.embed_double:
            a = a + a  # x = x + norm_pre(x), norm_pre == Identity
        return a

    def embed_video(self, imgs: jnp.ndarray) -> jnp.ndarray:
        """[B, 3, H, W] -> [B, 196, D] tokens (with the x2 quirk).

        Parity: cav_mae_base.py:453-455 (pos embed drops the CLS row).
        """
        v = self.patch_embed(imgs.astype(self.dtype))
        v = v + self.pos_embed[:, 1:].astype(self.dtype)
        if self.embed_double:
            v = v + v
        return v

    def run_blocks(self, x, modality: Optional[str] = None,
                   key_valid: Optional[jnp.ndarray] = None):
        for blk in self.blocks:
            x = blk(x, modality, key_valid)
        return x

    def run_blocks_tconcat(self, x, modality: Optional[str],
                           chunk_shapes: tuple):
        """Run all blocks in token-concat form (ModalityBlock.call_tconcat):
        x is the [T, C] row-concat of the mmixed chunks of one modality."""
        for blk in self.blocks:
            x = blk.call_tconcat(x, modality, chunk_shapes)
        return x

    def final_norm(self, x, modality: str):
        return self.norm_a(x) if modality == "a" else self.norm(x)

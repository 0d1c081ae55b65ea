"""Configuration dataclasses for the AVSiam-TPU framework.

These replace the reference's argparse sprawl + hard-coded constants
(reference: src/run_cavmae_pretrain_base.py:47-105, src/run_cavmae_ft_base.py:62-141,
egs/*.sh recipe files). Every hyperparameter that the reference hard-codes in
model/dataloader source is surfaced here and injectable.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import jax.numpy as jnp


@dataclass(frozen=True)
class ViTConfig:
    """Shared siamese ViT encoder geometry.

    Defaults reproduce ViT-B/16 as instantiated by the reference
    (src/models/cav_mae_base.py:236,248-261): 12 blocks, dim 768, 12 heads,
    mlp ratio 4, qkv bias, LayerNorm eps 1e-5 inside blocks (torch default;
    the reference rebuilds blocks with ``nn.LayerNorm`` default eps) while the
    final encoder norms come from timm with eps 1e-6.
    """

    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    patch_size: int = 16
    img_size: int = 224
    audio_length: int = 1024  # fbank frames (10 s @ 10 ms shift)
    mel_bins: int = 128
    block_ln_eps: float = 1e-5  # cav_mae_base.py:120 (torch nn.LayerNorm default)
    final_ln_eps: float = 1e-6  # timm ViT final norm eps
    qkv_bias: bool = True
    # GELU numerics (ops/gelu.py): 'erf' = exact (timm nn.GELU parity);
    # 'cheb'/'ans' = erf-grade approximations (max CDF error ~1.5e-7,
    # bf16-bit-equivalent to 'erf', far cheaper on the VPU); 'tanh' = the
    # tanh approximation (fastest, visibly different numerics).
    gelu: str = "erf"

    @property
    def video_grid(self) -> Tuple[int, int]:
        g = self.img_size // self.patch_size
        return (g, g)

    @property
    def audio_grid(self) -> Tuple[int, int]:
        # fbank [T=1024, F=128] is treated as a 1-channel image [F, T]
        # (cav_mae_base.py:444-448), so grid = (F/16, T/16) = (8, 64).
        return (self.mel_bins // self.patch_size, self.audio_length // self.patch_size)

    @property
    def num_video_tokens(self) -> int:
        gh, gw = self.video_grid
        return gh * gw  # 196

    @property
    def num_audio_tokens(self) -> int:
        gh, gw = self.audio_grid
        return gh * gw  # 512


@dataclass(frozen=True)
class DecoderConfig:
    """MAE decoder geometry (cav_mae_base.py:311-337)."""

    dim: int = 512
    depth: int = 8
    num_heads: int = 16
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-5


@dataclass(frozen=True)
class CAVMAEConfig:
    """Pretraining model config (reference CAVMAE_BASE, cav_mae_base.py:216-741)."""

    vit: ViTConfig = field(default_factory=ViTConfig)
    decoder: DecoderConfig = field(default_factory=DecoderConfig)
    # Parity quirk: `x = x + norm_pre(x)` with norm_pre == Identity doubles the
    # embeddings before the blocks (cav_mae_base.py:450,455,517,522).
    embed_double: bool = True
    contrast_temp: float = 0.05  # cav_mae_base.py:647 (fixed)
    # MAE mask ratio hard-coded to 0.75 in the reference forward regardless of
    # args (cav_mae_base.py:696).
    mae_mask_ratio: float = 0.75
    # Multi-ratio contrastive masking: batch split into <=5 chunks, chunk i
    # masked at ratio 0.2*i (cav_mae_base.py:543-550).
    mmixed_num_chunks: int = 5
    mmixed_ratio_step: float = 0.2
    # 'padded' = single batched encode with attention/pool masks (TPU fast
    # path, mathematically equivalent); 'exact' = per-chunk gather of kept
    # tokens (mirrors the reference's variable-length encode; best measured
    # on v5e — 141.8 clips/s vs bucketed 134.4 at B=32, BENCH_NOTES.md);
    # 'bucketed' = exact's gathers rounded up to lane multiples with masked
    # tails (same keep sets, fewer pad/slice copies, but the extra GEMM rows
    # cost more than the pads they save — kept as an option); 'packed' =
    # exact's FLOPs over one token-packed array (also measured slower);
    # 'tconcat' = exact's per-chunk attention with every token-pointwise op
    # (LN/qkv/proj/MLP) run once over the row-concatenated chunks — one
    # weight-gradient GEMM per weight instead of 5 accumulated partials.
    mmixed_impl: str = "padded"
    dtype: Any = jnp.float32  # activation/compute dtype (bf16 on TPU)
    attn_impl: str = "auto"  # 'auto' | 'pallas' | 'xla'
    # 'auto' ('lnfres' on TPU at 128-aligned dims — round-5 measured-best;
    # 'dense' elsewhere) | 'dense' (XLA two-GEMM) |
    # 'fres' (Pallas fwd keeping the hidden in VMEM + bf16 pre-GELU residual
    # out, XLA saved-residual bwd — measured-best on v5e, BENCH_NOTES.md) |
    # 'remat_g' (drop the pre-GELU hidden residual, recompute it in backward)
    # | 'remat_all' (drop both hiddens) | 'fused' (Pallas fwd + single-kernel
    # bwd) | 'fbwd' (XLA fwd, Pallas single-kernel bwd) | 'lnfres' ('fres'
    # with the pre-MLP LayerNorm and the residual add folded into the
    # forward kernel — the LN/MLP outputs never round-trip HBM)
    mlp_impl: str = "auto"
    # decoder blocks' MLP impl; None = same as mlp_impl (the decoder's
    # [B,720,2048] hiddens are the step's largest MLP traffic — worth an
    # independent knob). Round 5: the inherited lnfres+lnfres combination
    # is the measured-best default (the round-4 "catastrophe" did not
    # reproduce; BENCH_NOTES round 5).
    dec_mlp_impl: Any = None
    remat_blocks: bool = False  # jax.checkpoint each encoder block


@dataclass(frozen=True)
class CAVMAEFTConfig:
    """Finetune model config (reference CAVMAEFT_BASE, cav_mae_base.py:745-1036)."""

    vit: ViTConfig = field(default_factory=ViTConfig)
    label_dim: int = 527
    embed_double: bool = True
    num_eval_frames: int = 10  # eval loops over 10 frames (cav_mae_base.py:961)
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    mlp_impl: str = "auto"
    remat_blocks: bool = False


@dataclass(frozen=True)
class AudioConfig:
    """Audio front-end + augmentation config.

    Mirrors the reference ``audio_conf`` dict (run_cavmae_pretrain_base.py:120-124)
    plus the fbank constants hard-coded in src/dataloader.py:328.
    """

    num_mel_bins: int = 128
    target_length: int = 1024
    sample_rate: int = 16000
    frame_shift_ms: float = 10.0
    frame_length_ms: float = 25.0
    # dataset stats from egs/audioset/run_pretrain_base.sh:36-38
    norm_mean: float = -5.081
    norm_std: float = 4.4849
    freqm: int = 0  # SpecAug frequency mask width
    timem: int = 0  # SpecAug time mask width
    mixup: float = 0.0
    noise: bool = False
    skip_norm: bool = False
    mean_pool_downsample: bool = False


@dataclass(frozen=True)
class OptimizerConfig:
    """torch.optim.Adam parity: betas (0.95, 0.999), L2-style weight decay 5e-7
    (traintest_cavmae_base.py:64-66, traintest_ft_base.py:78-83)."""

    lr: float = 2e-4
    b1: float = 0.95
    b2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 5e-7
    # MultiStepLR(list(range(start, 1000, step)), gamma)
    lrscheduler_start: int = 10
    lrscheduler_step: int = 5
    lrscheduler_decay: float = 0.5
    # lr_adapt=True replaces MultiStepLR with ReduceLROnPlateau(mode='max',
    # factor=0.5, patience=lr_patience), stepped per epoch on the eval metric
    # (mAP/acc for finetune, -eval_loss for pretrain) — the reference's
    # "preliminary experiments only" path (traintest_ft_base.py:99-104,
    # traintest_cavmae_base.py:68-75). Every recipe sets it False.
    lr_adapt: bool = False
    lr_patience: int = 2


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. The reference is DP-only (2x8 GPUs, NCCL); we keep a
    'data' axis for DP plus an optional 'model' axis for tensor parallelism
    headroom (SURVEY.md section 2.5)."""

    data: int = -1  # -1 = all devices
    model: int = 1


@dataclass(frozen=True)
class PretrainConfig:
    model: CAVMAEConfig = field(default_factory=CAVMAEConfig)
    audio: AudioConfig = field(default_factory=AudioConfig)
    opt: OptimizerConfig = field(default_factory=OptimizerConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    batch_size: int = 64  # global batch
    n_epochs: int = 25
    masking_ratio: float = 0.25
    masking_ratio_a: float = 0.25
    mask_mode: str = "unstructured"
    contrast_loss_weight: float = 1.0
    mae_loss_weight: float = 1.0
    n_print_steps: int = 100
    seed: int = 87
    exp_dir: str = "./exp/pretrain"
    # False skips the per-epoch audio_model.{e} params saves (the reference's
    # --save_model gate, traintest_cavmae_base.py:232); train_state saves for
    # resume are unaffected.
    save_model: bool = True
    # How many trailing train_state.{e} resume checkpoints to keep (~2.9 GB
    # each at ViT-B: params + two Adam states). Resume only ever reads the
    # newest one, and the reference likewise overwrites a single
    # optim_state.pth (traintest_cavmae_base.py:233) — keeping them all grows
    # disk without bound on long runs. <=0 keeps every epoch.
    keep_train_states: int = 1
    # Save the resume train_state only every N epochs (the final epoch is
    # always saved). 1 = per-epoch, the reference behavior
    # (traintest_cavmae_base.py:233 writes optim state every epoch). On a
    # slow-IO host a full ViT-B state save costs minutes; many-epoch runs
    # over small data can't afford it per epoch. Skipped epochs simply make
    # a --resume restart from the last saved one.
    train_state_every: int = 1
    # Validate (and run best-checkpoint tracking / plateau-scheduler steps)
    # only every N epochs; the final epoch is always validated. 1 = the
    # reference behavior (validate every epoch, traintest_cavmae_base.py:192).
    # On short-epoch runs (small datasets / large batch) per-epoch eval +
    # the best_audio_model save it triggers can dominate wall-clock; train
    # meters still land in result.csv/metrics.jsonl every epoch.
    val_interval: int = 1


@dataclass(frozen=True)
class FinetuneConfig:
    model: CAVMAEFTConfig = field(default_factory=CAVMAEFTConfig)
    audio: AudioConfig = field(default_factory=AudioConfig)
    opt: OptimizerConfig = field(default_factory=OptimizerConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    batch_size: int = 4
    n_epochs: int = 15
    head_lr: float = 100.0  # lr multiplier for mlp_head* params
    mm_lr: float = 100.0  # lr multiplier for mm_layer* params
    freeze_base: bool = False
    ftmode: str = "mm_grad"
    # eval-time forward mode; None = same as ftmode (the reference's separate
    # --ftmode_test flag, run_cavmae_ft_base.py)
    ftmode_test: Optional[str] = None
    # torch-parity optimizer: per-leaf gated Adam reproducing
    # find_unused_parameters skip semantics under stochastic loss routing
    # (per-leaf step counts, frozen moments for untouched branches).
    # DEFAULT ON: with plain optax, branches unselected by mm_grad routing
    # would still get weight decay + stale-momentum Adam updates every step,
    # while the reference (DDP find_unused_parameters + set_to_none grads)
    # skips them entirely. False = plain masked-free optax (faster, one
    # fused update, non-parity dynamics for mm_grad).
    parity_optimizer: bool = True
    loss: str = "BCE"  # 'BCE' | 'CE'
    metrics: str = "mAP"  # 'mAP' | 'acc'
    label_smooth: float = 0.1
    n_print_steps: int = 100
    seed: int = 87
    exp_dir: str = "./exp/ft"
    # False skips per-epoch audio_model.{e} params saves (--save_model,
    # traintest_ft_base.py:262); best-model + train_state saves unaffected.
    save_model: bool = True
    # See PretrainConfig.keep_train_states; the reference FT loop likewise
    # overwrites a single best_optim_state.pth (traintest_ft_base.py:256-258).
    keep_train_states: int = 1
    # See PretrainConfig.train_state_every.
    train_state_every: int = 1


def replace(cfg, **kwargs):
    """dataclasses.replace passthrough so callers don't import dataclasses."""
    return dataclasses.replace(cfg, **kwargs)

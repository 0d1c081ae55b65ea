"""Analytic roofline floor for the pretrain step (VERDICT r4 #3).

Computes, per step component, (a) the minimum HBM bytes the step's chosen
AD/save-set implies and (b) its MXU FLOPs, then converts both to a time
floor at the MEASURED chip rates (BENCH_NOTES.md round 2: ~330 GB/s
sustained HBM, ~330 TF/s bf16 GEMM stacks — not the spec sheet numbers)
and compares the sum against the measured step time.

The bytes model is explicit and intentionally generous to the hardware
(i.e. it UNDERSTATES achievable traffic, so the floor is a true lower
bound under its assumptions):

* Transformer block, forward (bf16): the only HBM round-trips counted are
  tensors that MUST exist in HBM because the backward reads them (the
  saved-residual set our 'fres'/XLA path saves): qkv [3C], attention out
  [C], post-attention residual [C], pre-GELU MLP hidden [4C], block output
  [C]. Each is written once and read once; the block input is read twice
  (LN+qkv fusion, residual add). Everything else (LN stats, softmax, GELU)
  is assumed fused at zero extra traffic.
* Transformer block, backward: reads every saved tensor once, streams one
  [C] cotangent in and out per fusion site (4 sites), writes d(qkv) [3C]
  once (the attention-backward boundary). Weight gradients are counted as
  one f32 write + (for multi-call blocks) one read-accumulate per extra
  call site sharing the weight.
* Attention score/softmax traffic ([B,H,N,N]) is counted as ZERO HBM (our
  Pallas kernels keep scores in VMEM; XLA small-N fuses) — flash-style.
* Optimizer (per-leaf Adam, f32 states): read g, p, m, v; write p, m, v
  = 7 x 4P bytes. Plus one f32->bf16 param cast per step (read 4P, write
  2P) and fwd+bwd weight reads (2 x 2P) — weights are read once per pass
  in the floor even though real chunked calls re-read them.
* Patchify/unpatchify/losses/gathers/pooling are counted at their i/o
  sizes only.

FLOPs: GEMMs fwd 2*T*W_mac, backward 2x fwd (dx + dW GEMMs); attention
2*(2*N*C) MACs/token fwd, 2x bwd. VPU work (softmax/GELU/LN) is not a
floor term (it overlaps the MXU in the best case).

Usage:  python scripts/roofline.py [B] [--params P]  (default B=64;
--params skips the eval_shape count, e.g. when running without flax)

The printed table is the BENCH_NOTES round-5 roofline; keep the two in
sync.
"""

import sys

HBM_GBPS = 330.0   # measured sustained (BENCH_NOTES.md round 2)
MXU_TFLOPS = 330.0  # measured bf16 GEMM-stack rate (same)
BF16 = 2
F32 = 4


def chunk_sizes(batch, num_chunks):
    size = -(-batch // num_chunks)
    out = []
    left = batch
    while left > 0:
        out.append(min(size, left))
        left -= size
    return out


def block_bytes(T, C, mlp_ratio=4, calls=1, weight_reads=True):
    """HBM bytes for `calls` forward+backward passes totalling T tokens
    through ONE transformer block of width C (assumption set above)."""
    H = int(mlp_ratio * C)
    # forward: writes (read back by bwd or next op) + reads
    fwd_w = (3 * C + C + C + 4 * C + C) * BF16          # qkv, attn_o, res1, hidden, out
    fwd_r = (2 * C + 3 * C + C + C + C) * BF16          # x twice, qkv, attn_o, res1
    # backward: read saves once, stream 4 cotangent sites, write dqkv + dx
    bwd_r = (3 * C + C + C + 4 * C + C + 4 * C) * BF16
    bwd_w = (3 * C + 4 * C) * BF16
    act = T * (fwd_w + fwd_r + bwd_r + bwd_w)
    W = 3 * C * C + C * C + 2 * C * H                    # qkv, proj, fc1+fc2
    wbytes = 0
    if weight_reads:
        wbytes += 2 * W * BF16                           # fwd + bwd weight reads
        wbytes += W * F32                                # dW write
        wbytes += (calls - 1) * 2 * W * F32              # partial accumulate r+w
    return act + wbytes


def block_flops(T, C, N_att, mlp_ratio=4):
    """MXU FLOPs for fwd+bwd of T tokens (avg attended length N_att)."""
    H = int(mlp_ratio * C)
    W = 3 * C * C + C * C + 2 * C * H
    gemm = 2 * T * W * 3                                 # fwd + dx + dW
    att = 2 * T * (2 * N_att * C) * 3                    # scores+out, fwd+bwd
    return gemm + att


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 64
    if "--params" in sys.argv:
        P = int(float(sys.argv[sys.argv.index("--params") + 1]))
    else:
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        from avsiam_tpu.configs import CAVMAEConfig
        from avsiam_tpu.models import CAVMAEPretrain
        model = CAVMAEPretrain(CAVMAEConfig(dtype=jnp.bfloat16))
        a = jax.ShapeDtypeStruct((1, 1024, 128), jnp.float32)
        v = jax.ShapeDtypeStruct((1, 3, 224, 224), jnp.float32)
        rng = jax.random.PRNGKey(0)
        shapes = jax.eval_shape(
            lambda: model.init({"params": rng, "mask": rng, "perm": rng},
                               jnp.zeros(a.shape, a.dtype),
                               jnp.zeros(v.shape, v.dtype)))
        import math
        P = sum(math.prod(x.shape) for x in jax.tree.leaves(shapes))
    La, Lv, C = 512, 196, 768
    Cd, Ld = 512, 720
    rows = []

    def add(name, byt, flops):
        rows.append((name, byt, flops))

    # ---- pass 1: multi-ratio contrastive (both modalities through vit) ----
    sizes = chunk_sizes(B, 5)
    ratios = [0.2 * i for i in range(len(sizes))]
    for depth_calls in [1]:  # single trunk, 12 blocks
        Ta = sum(s * int(La * (1 - r)) for s, r in zip(sizes, ratios))
        Tv = sum(s * int(Lv * (1 - r)) for s, r in zip(sizes, ratios))
        Na = sum(s * int(La * (1 - r)) ** 2 for s, r in zip(sizes, ratios)) / max(Ta, 1)
        Nv = sum(s * int(Lv * (1 - r)) ** 2 for s, r in zip(sizes, ratios)) / max(Tv, 1)
        byt = 12 * (block_bytes(Ta, C, calls=len(sizes))
                    + block_bytes(Tv, C, calls=len(sizes), weight_reads=False))
        fl = 12 * (block_flops(Ta, C, Na) + block_flops(Tv, C, Nv))
        add("pass1 mmixed (%d+%d tok)" % (Ta, Tv), byt, fl)

    # ---- pass 2: MAE encoders (audio via ast, video via vit) ----
    Ta2, Tv2 = B * int(La * 0.25), B * int(Lv * 0.25)
    byt = 12 * (block_bytes(Ta2, C) + block_bytes(Tv2, C))
    fl = 12 * (block_flops(Ta2, C, int(La * 0.25))
               + block_flops(Tv2, C, int(Lv * 0.25)))
    add("pass2 MAE enc (%d+%d tok)" % (Ta2, Tv2), byt, fl)

    # ---- mm layers (2 blocks, joint 177 tokens) ----
    Tm = B * (int(La * 0.25) + int(Lv * 0.25))
    add("mm layers (%d tok)" % Tm, 2 * block_bytes(Tm, C),
        2 * block_flops(Tm, C, Tm // B))

    # ---- decoder: 8 blocks at N=720, C=512 + embed/pred/unpatchify ----
    Td = B * Ld
    byt = 8 * block_bytes(Td, Cd)
    fl = 8 * block_flops(Td, Cd, Ld)
    # embed 768->512 + pred heads + unpatchify + MSE loss i/o (fwd+bwd)
    io = Td * (C + Cd) * BF16 * 3 + Td * (256 + 768) // 2 * BF16 * 3
    add("decoder (8 x %d tok)" % Td, byt + io, fl)

    # ---- embeds/patchify + contrastive head (small) ----
    inp = B * (1024 * 128 + 3 * 224 * 224) * F32
    add("patchify+inputs", inp * 2, 2 * B * (La + Lv) * 256 * C * 2 * 3)

    # ---- params: cast + fwd/bwd reads + grads + Adam ----
    add("param cast f32->bf16", P * (F32 + BF16), 0)
    add("grad writes (f32)", P * F32, 0)
    add("Adam (7 x 4P)", 7 * P * F32, 0)

    tot_b = sum(r[1] for r in rows)
    tot_f = sum(r[2] for r in rows)
    print(f"B={B}  params={P/1e6:.1f}M  (HBM {HBM_GBPS} GB/s, MXU {MXU_TFLOPS} TF/s)")
    print(f"{'component':34s} {'GB':>7s} {'ms@BW':>7s} {'GFLOP':>8s} {'ms@MXU':>7s} {'floor':>7s}")
    floor = 0.0
    for name, byt, fl in rows:
        tb = byt / HBM_GBPS / 1e6
        tf = fl / MXU_TFLOPS / 1e9
        floor += max(tb, tf)
        print(f"{name:34s} {byt/1e9:7.2f} {tb:7.2f} {fl/1e9:8.0f} {tf:7.2f} {max(tb,tf):7.2f}")
    print(f"{'TOTAL':34s} {tot_b/1e9:7.2f} {tot_b/HBM_GBPS/1e6:7.2f} "
          f"{tot_f/1e9:8.0f} {tot_f/MXU_TFLOPS/1e9:7.2f} {floor:7.2f}")
    print(f"floor(ms) = sum(max(bytes/BW, flops/MXU)) = {floor:.1f}")


if __name__ == "__main__":
    main()

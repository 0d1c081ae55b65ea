"""Numerics soak on the real accelerator: many full-size pretrain steps on
fresh random batches must stay finite, and a repeated paired batch must be
learnable (contrastive accuracy -> 1) — the round-1 stability evidence
(BENCH_NOTES.md), re-runnable after kernel changes.

Usage: python scripts/soak.py [n_fresh_steps] [n_overfit_steps] [attn] [B]

Pass criteria: every fresh-step loss finite; repeated-batch contrastive
accuracy ends well above chance and loss_c drops well below the ln(B)
uniform plateau. (Round-1's "100% in 40 steps" was at B=16 — the quoted
start loss 2.82 is ln 16; at B=32 the two-pass optimizer overfits more
slowly. Kernel gradients are NOT the cause: full-step grad cosine between
the Pallas path and the XLA path measured 0.99994/0.99996 with matching
norms, BENCH_NOTES.md.)
"""

import math
import sys
import time

import jax
import jax.numpy as jnp

from avsiam_tpu.configs import CAVMAEConfig, OptimizerConfig, PretrainConfig
from avsiam_tpu.models import CAVMAEPretrain
from avsiam_tpu.train.pretrain import init_state, make_pretrain_step


def main():
    n_fresh = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    n_overfit = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    attn = sys.argv[3] if len(sys.argv) > 3 else "auto"
    B = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    mcfg = CAVMAEConfig(dtype=jnp.bfloat16, attn_impl=attn,
                        mmixed_impl="exact")
    cfg = PretrainConfig(model=mcfg, opt=OptimizerConfig(lr=2e-4),
                        batch_size=B)
    model = CAVMAEPretrain(mcfg)
    rng = jax.random.PRNGKey(0)
    vit = mcfg.vit
    a = jax.random.normal(rng, (B, vit.audio_length, vit.mel_bins), jnp.float32)
    v = jax.random.normal(rng, (B, 3, vit.img_size, vit.img_size), jnp.float32)
    state = init_state(rng, model, cfg, (a, v))
    step = make_pretrain_step(model, cfg)
    lr = jnp.float32(2e-4)

    # phase 1: fresh random batches — every loss must stay finite
    t0 = time.perf_counter()
    for i in range(n_fresh):
        ka, kv = jax.random.split(jax.random.fold_in(rng, i))
        ai = jax.random.normal(ka, a.shape, jnp.float32)
        vi = jax.random.normal(kv, v.shape, jnp.float32)
        state, m = step(state, (ai, vi), rng, lr)
        if i % 20 == 0 or i == n_fresh - 1:
            vals = {k: float(jax.device_get(x)) for k, x in m.items()}
            assert all(jnp.isfinite(jnp.asarray(x)) for x in vals.values()), \
                (i, vals)
            print(f"fresh {i:4d}: loss={vals['loss']:.4f} "
                  f"loss_c={vals['loss_c']:.4f} c_acc={vals['c_acc']:.3f}")
    print(f"phase 1 ok: {n_fresh} fresh steps finite "
          f"({time.perf_counter() - t0:.0f}s)")

    # phase 2: one repeated batch from FRESH init — the contrastive head
    # must overfit it. (Running it from the phase-1 state would fail by
    # design: unpaired-noise training collapses the contrastive head to the
    # uniform ln(B) state, exactly as round 1 documented.)
    state = init_state(rng, model, cfg, (a, v))
    accs = []
    for i in range(n_overfit):
        state, m = step(state, (a, v), rng, lr)
        if i % 10 == 0:
            print(f"overfit {i:3d}: loss_c="
                  f"{float(jax.device_get(m['loss_c'])):.4f} c_acc="
                  f"{float(jax.device_get(m['c_acc'])):.3f}")
        if i >= n_overfit - 5:
            accs.append(float(jax.device_get(m["c_acc"])))
    final = sum(accs) / len(accs)
    last_loss_c = float(jax.device_get(m["loss_c"]))
    print(f"phase 2: repeated-batch c_acc (last 5 avg) = {final:.3f}, "
          f"loss_c = {last_loss_c:.4f} (uniform plateau = ln B = "
          f"{math.log(B):.4f})")
    assert final > max(0.15, 5.0 / B), final
    assert last_loss_c < math.log(B) - 0.5, last_loss_c
    print("soak ok")


if __name__ == "__main__":
    main()

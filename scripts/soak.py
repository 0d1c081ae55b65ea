"""Numerics soak on the real accelerator: many full-size pretrain steps on
fresh random batches must stay finite, and a repeated paired batch must be
learnable (contrastive accuracy -> 1) — the round-1 stability evidence
(BENCH_NOTES.md), re-runnable after kernel changes.

Usage: python scripts/soak.py [n_fresh_steps] [n_overfit_steps]
"""

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
    B = 32
    mcfg = CAVMAEConfig(dtype=jnp.bfloat16, attn_impl="auto",
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

    # phase 2: one repeated batch — the contrastive head must overfit it
    accs = []
    for i in range(n_overfit):
        state, m = step(state, (a, v), rng, lr)
        if i >= n_overfit - 5:
            accs.append(float(jax.device_get(m["c_acc"])))
    final = sum(accs) / len(accs)
    print(f"phase 2: repeated-batch c_acc (last 5 avg) = {final:.3f}")
    assert final > 0.9, final
    print("soak ok")


if __name__ == "__main__":
    main()

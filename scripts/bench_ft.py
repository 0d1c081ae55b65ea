"""Benchmark one finetune-step configuration on the current accelerator.

Usage: python scripts/bench_ft.py [B] [FTMODE] [ITERS] [MLP]
Prints one line: config + clips/s + ms/step. The work unit is the reference
FT step (stochastic-routed mm_grad loss, 3-group Adam,
traintest_ft_base.py:131-175) on ViT-B at full input geometry.
"""

import sys
import time

import jax
import jax.numpy as jnp

from avsiam_tpu.configs import CAVMAEFTConfig, FinetuneConfig, OptimizerConfig
from avsiam_tpu.models.cavmae_ft import CAVMAEFinetune
from avsiam_tpu.train.finetune import init_state, make_finetune_step


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    ftmode = sys.argv[2] if len(sys.argv) > 2 else "mm_grad"
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    mlp = sys.argv[4] if len(sys.argv) > 4 else "dense"
    mcfg = CAVMAEFTConfig(dtype=jnp.bfloat16, attn_impl="auto",
                          mlp_impl=mlp)
    cfg = FinetuneConfig(model=mcfg, opt=OptimizerConfig(lr=1e-4),
                         batch_size=B, ftmode=ftmode)
    model = CAVMAEFinetune(mcfg)
    rng = jax.random.PRNGKey(0)
    a = jax.random.normal(rng, (B, 1024, 128), jnp.float32)
    v = jax.random.normal(rng, (B, 1, 3, 224, 224), jnp.float32)
    y = (jax.random.uniform(rng, (B, mcfg.label_dim)) > 0.98).astype(
        jnp.float32)
    t0 = time.perf_counter()
    state = init_state(rng, model, cfg, (a, v, y))
    step = make_finetune_step(model, cfg)
    lr = jnp.float32(1e-4)
    state, m = step(state, (a, v, y), rng, lr)
    float(jax.device_get(m["loss"]))
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, (a, v, y), rng, lr)
    float(jax.device_get(m["loss"]))
    dt = (time.perf_counter() - t0) / iters
    print(f"FT B={B:3d} mode={ftmode} mlp={mlp}: {B / dt:7.1f} clips/s "
          f"{dt * 1000:7.1f} ms/step  (compile+init {compile_t:.0f}s)")


if __name__ == "__main__":
    main()

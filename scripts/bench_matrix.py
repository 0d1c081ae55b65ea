"""Benchmark one pretrain-step configuration on the current accelerator.

Usage: python scripts/bench_matrix.py B ATTN MMIXED [ITERS] [MLP] [GELU]
Prints one line: config + clips/s + ms/step.

AVSIAM_BENCH_MODEL selects a backbone variant preset (e.g. cav-mae-large,
cav-mae-huge; default cav-mae-base) so the bytecode-only reference variants
(models/__init__.py:8-17) can be measured at full geometry on the chip.
"""

import sys
import os
import time

import jax

# Persistent compilation cache (works through the axon tunnel, measured
# round 4): repeats of an already-benched config skip the 3-8 min remote
# compile. Same dir as bench.py so the driver bench and A/B sweeps share it.
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", "tests", ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp

from avsiam_tpu.configs import OptimizerConfig, PretrainConfig, replace
from avsiam_tpu.models import CAVMAEPretrain
from avsiam_tpu.train.pretrain import init_state, make_pretrain_step


def main():
    B = int(sys.argv[1])
    attn = sys.argv[2]
    if attn.startswith("auto") and attn != "auto":
        # e.g. 'auto128': move the pallas/XLA crossover for this run
        import avsiam_tpu.ops.attention as _att_mod
        _att_mod._XLA_SMALL_N = int(attn[4:])
        attn = "auto"
    mmixed = sys.argv[3]
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    mlp = sys.argv[5] if len(sys.argv) > 5 else "dense"
    gelu = sys.argv[6] if len(sys.argv) > 6 else "erf"
    if gelu == "gelu_tanh":  # legacy spelling
        gelu = "tanh"
    remat = len(sys.argv) > 7 and sys.argv[7] == "remat"
    dec_mlp = None
    if "+" in mlp:  # 'ENC+DEC', e.g. 'dense+fbwd'
        mlp, dec_mlp = mlp.split("+", 1)
    model_name = os.environ.get("AVSIAM_BENCH_MODEL", "cav-mae-base")
    from avsiam_tpu.models.variants import pretrain_config
    mcfg = pretrain_config(model_name, dtype=jnp.bfloat16, attn_impl=attn,
                           mmixed_impl=mmixed, mlp_impl=mlp,
                           dec_mlp_impl=dec_mlp, remat_blocks=remat)
    mcfg = replace(mcfg, vit=replace(mcfg.vit, gelu=gelu))
    cfg = PretrainConfig(model=mcfg, opt=OptimizerConfig(), batch_size=B)
    model = CAVMAEPretrain(mcfg)
    rng = jax.random.PRNGKey(0)
    vit = mcfg.vit
    a = jax.random.normal(rng, (B, vit.audio_length, vit.mel_bins),
                          jnp.float32)
    v = jax.random.normal(rng, (B, 3, vit.img_size, vit.img_size),
                          jnp.float32)
    t0 = time.perf_counter()
    state = init_state(rng, model, cfg, (a, v))
    step = make_pretrain_step(model, cfg)
    lr = jnp.float32(2e-4)
    state, m = step(state, (a, v), rng, lr)
    float(jax.device_get(m["loss"]))
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, (a, v), rng, lr)
    float(jax.device_get(m["loss"]))
    dt = (time.perf_counter() - t0) / iters
    mlp_desc = mlp if dec_mlp is None else f"{mlp}+{dec_mlp}"
    if model_name != "cav-mae-base":
        print(f"model={model_name}", end="  ")
    print(f"B={B:3d} attn={attn:6s} mmixed={mmixed:6s} mlp={mlp_desc:5s} "
          f"gelu={gelu:4s} remat={int(remat)}: "
          f"{B / dt:7.1f} clips/s  {dt * 1000:7.1f} ms/step  "
          f"(compile+init {compile_t:.0f}s)")


if __name__ == "__main__":
    main()

"""Memory/parameter microbenchmark.

Parity surface: src/gpu_memory.py — a standalone probe that builds the
shared-encoder model, reports parameter counts, and measures peak device
memory over a few fake train steps.
"""

from __future__ import annotations

import argparse
import json


def count_params(tree) -> int:
    import jax
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def main(argv=None):
    from avsiam_tpu.cli.common import apply_platform_override
    apply_platform_override()
    p = argparse.ArgumentParser("avsiam-tpu memory probe")
    p.add_argument("--model", type=str, default="cav-mae-base")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--dtype", type=str, default="bfloat16")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from avsiam_tpu.cli.common import jnp_dtype
    from avsiam_tpu.configs import OptimizerConfig, PretrainConfig
    from avsiam_tpu.models import CAVMAEPretrain
    from avsiam_tpu.models.variants import pretrain_config
    from avsiam_tpu.train.pretrain import init_state, make_pretrain_step
    from avsiam_tpu.utils.profiling import device_memory_stats

    model_cfg = pretrain_config(args.model, dtype=jnp_dtype(args.dtype))
    cfg = PretrainConfig(model=model_cfg, opt=OptimizerConfig(),
                         batch_size=args.batch_size)
    model = CAVMAEPretrain(model_cfg)
    rng = jax.random.PRNGKey(0)
    B = args.batch_size
    vit = model_cfg.vit
    a = jnp.ones((B, vit.audio_length, vit.mel_bins), jnp.float32)
    v = jnp.ones((B, 3, vit.img_size, vit.img_size), jnp.float32)
    state = init_state(rng, model, cfg, (a, v))
    n_params = count_params(state.params)
    n_opt = count_params((state.opt1, state.opt2))
    step_fn = make_pretrain_step(model, cfg)
    for _ in range(args.steps):
        state, metrics = step_fn(state, (a, v), rng, jnp.float32(1e-4))
    float(jax.device_get(metrics["loss"]))  # force execution
    out = {
        "model": args.model,
        "params_million": round(n_params / 1e6, 3),
        "optimizer_state_million": round(n_opt / 1e6, 3),
        "batch_size": B,
        "memory": device_memory_stats(),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

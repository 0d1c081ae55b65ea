"""Micro-benchmark: 12 x (Dense 768->3072 -> GELU -> Dense 3072->768)
fwd+bwd at pretrain token counts, comparing GELU implementations on the
real chip. Isolates the VPU cost of exact-erf GELU (the largest
parity-numerics overhead found in round 1: tanh GELU saved ~15% step time;
'ans'/'cheb' are bf16-bit-equivalent to 'erf' — see ops/gelu.py).

Usage: python scripts/bench_gelu.py [erf|tanh|ans|cheb|none] [T]
"""

import sys
import time

import jax
import jax.numpy as jnp

from avsiam_tpu.ops.gelu import gelu as gelu_op


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "erf"
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 14336
    D, H, L = 768, 3072, 12
    act = (lambda x: x) if kind == "none" else (lambda x: gelu_op(x, kind))
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (T, D), jnp.bfloat16)
    w1 = jax.random.normal(rng, (L, D, H), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(rng, (L, H, D), jnp.bfloat16) * 0.02

    def loss(x, w1, w2):
        for i in range(L):
            x = x + jnp.dot(act(jnp.dot(x, w1[i])), w2[i])
        return jnp.sum(x.astype(jnp.float32))

    step = jax.jit(jax.grad(loss))
    g = step(x, w1, w2)
    float(jax.device_get(g[0, 0]))
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(g.astype(jnp.bfloat16), w1, w2)
    float(jax.device_get(g[0, 0]))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"gelu={kind:5s} T={T}: {dt:7.2f} ms / 12-layer MLP fwd+bwd")


if __name__ == "__main__":
    main()

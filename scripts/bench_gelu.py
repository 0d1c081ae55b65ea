"""Micro-benchmark: 12 x (Dense 768->3072 -> GELU -> Dense 3072->768)
fwd+bwd at pretrain token counts, comparing GELU implementations on the
real chip. Isolates the VPU cost of exact-erf GELU (the largest
parity-numerics overhead found in round 1: tanh GELU saved ~15% step time).

Usage: python scripts/bench_gelu.py [erf|fasterf|fasterf_bf16|tanh] [T]
"""

import sys
import time

import jax
import jax.numpy as jnp

from avsiam_tpu.ops.mlp import _erf


def make_gelu(kind):
    sqrt2 = 2.0 ** 0.5
    if kind == "erf":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if kind == "tanh":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if kind == "fasterf":  # A&S 7.1.26 erf in f32, cast back
        def g(x):
            xf = x.astype(jnp.float32)
            return (0.5 * xf * (1.0 + _erf(xf / sqrt2))).astype(x.dtype)
        return g
    if kind == "fasterf_bf16":  # A&S erf in the input dtype
        return lambda x: 0.5 * x * (1.0 + _erf(x / jnp.asarray(sqrt2, x.dtype)))
    raise ValueError(kind)


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "erf"
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 14336
    D, H, L = 768, 3072, 12
    gelu = make_gelu(kind)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (T, D), jnp.bfloat16)
    w1 = jax.random.normal(rng, (L, D, H), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(rng, (L, H, D), jnp.bfloat16) * 0.02

    def loss(x, w1, w2):
        for i in range(L):
            x = x + jnp.dot(gelu(jnp.dot(x, w1[i])), w2[i])
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
    print(f"gelu={kind:13s} T={T}: {dt:7.2f} ms / 12-layer MLP fwd+bwd")


if __name__ == "__main__":
    main()

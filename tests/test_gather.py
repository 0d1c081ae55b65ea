"""One-hot matmul gathers (ops/gather.py) vs jnp gather/scatter: forward
values must be bit-exact and gradients identical (the matmul lowering is a
permutation-matrix product, not an approximation)."""

import jax
import jax.numpy as jnp
import numpy as np

from avsiam_tpu.ops.gather import take_batch, take_tokens


def test_take_tokens_matches_gather_fwd_and_grad():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (3, 50, 16))
    ids = jax.vmap(lambda k: jax.random.permutation(k, 50)[:20])(
        jax.random.split(rng, 3))

    fwd_m = take_tokens(x, ids, impl="matmul")
    fwd_g = take_tokens(x, ids, impl="gather")
    np.testing.assert_array_equal(np.asarray(fwd_m), np.asarray(fwd_g))

    gm = jax.grad(lambda x: jnp.sum(jnp.sin(take_tokens(x, ids, "matmul"))))(x)
    gg = jax.grad(lambda x: jnp.sum(jnp.sin(take_tokens(x, ids, "gather"))))(x)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gg),
                               atol=1e-7, rtol=1e-7)


def test_take_tokens_bf16_bit_exact():
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (2, 30, 8)).astype(jnp.bfloat16)
    ids = jnp.tile(jnp.arange(30)[::-1][None, :12], (2, 1))
    fwd_m = np.asarray(take_tokens(x, ids, impl="matmul")).view(np.uint16)
    fwd_g = np.asarray(take_tokens(x, ids, impl="gather")).view(np.uint16)
    np.testing.assert_array_equal(fwd_m, fwd_g)


def test_take_batch_matches_take():
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (8, 5, 4))
    ids = jnp.asarray([3, 0, 7, 3])
    np.testing.assert_array_equal(
        np.asarray(take_batch(x, ids, "matmul")),
        np.asarray(take_batch(x, ids, "gather")))
    gm = jax.grad(lambda x: jnp.sum(take_batch(x, ids, "matmul") ** 2))(x)
    gg = jax.grad(lambda x: jnp.sum(take_batch(x, ids, "gather") ** 2))(x)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gg),
                               atol=1e-6, rtol=1e-6)

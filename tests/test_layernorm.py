"""ops/layernorm.py: forward bit-parity with flax nn.LayerNorm, gradient
equivalence of the analytic and Pallas (interpret-mode) backwards vs flax
autodiff, and param-tree compatibility of LayerNormFP32."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from avsiam_tpu.ops import layernorm as lnops

EPS = 1e-5


def _flax_ln(x, scale, bias):
    mdl = nn.LayerNorm(epsilon=EPS, dtype=jnp.float32, param_dtype=jnp.float32)
    params = {"params": {"scale": scale, "bias": bias}}
    return mdl.apply(params, x.astype(jnp.float32)).astype(x.dtype)


def test_forward_bitwise_matches_flax():
    rng = jax.random.PRNGKey(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jax.random.normal(rng, (7, 33, 256), dtype)
        scale = jax.random.normal(jax.random.fold_in(rng, 1), (256,)) * 0.1 + 1
        bias = jax.random.normal(jax.random.fold_in(rng, 2), (256,)) * 0.1
        got = lnops.layer_norm_fp32(x, scale, bias, EPS)
        ref = _flax_ln(x, scale, bias)
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(ref, np.float32),
                                      err_msg=str(dtype))


def test_analytic_backward_matches_autodiff():
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (5, 40, 128))
    scale = jax.random.normal(jax.random.fold_in(rng, 1), (128,)) * 0.2 + 1
    bias = jax.random.normal(jax.random.fold_in(rng, 2), (128,)) * 0.1

    def loss_custom(x, s, b):
        return jnp.sum(jnp.sin(lnops.layer_norm_fp32(x, s, b, EPS)))

    def loss_flax(x, s, b):
        return jnp.sum(jnp.sin(_flax_ln(x, s, b)))

    gc = jax.grad(loss_custom, argnums=(0, 1, 2))(x, scale, bias)
    gf = jax.grad(loss_flax, argnums=(0, 1, 2))(x, scale, bias)
    for a, b, name in zip(gc, gf, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5, err_msg=name)


def test_pallas_backward_matches_analytic():
    """Force the Pallas kernel (interpret mode off-TPU) against the jnp
    analytic backward: ragged row counts, both C widths, both dtypes."""
    rng = jax.random.PRNGKey(4)
    for R, C, dtype in ((96, 128, jnp.float32), (130, 256, jnp.float32),
                        (37, 128, jnp.bfloat16), (512, 128, jnp.bfloat16)):
        x = jax.random.normal(rng, (R, C), dtype)
        dy = jax.random.normal(jax.random.fold_in(rng, R), (R, C), dtype)
        scale = jax.random.normal(jax.random.fold_in(rng, 1), (C,)) * 0.2 + 1
        dxp, dgp, dbp = lnops._ln_bwd_pallas(x, dy, scale, EPS)
        dxa, dga, dba = lnops._ln_bwd_math(x, scale, dy, EPS)
        np.testing.assert_allclose(np.asarray(dxp, np.float32),
                                   np.asarray(dxa, np.float32),
                                   atol=2e-2 if dtype == jnp.bfloat16 else 1e-5,
                                   rtol=2e-2 if dtype == jnp.bfloat16 else 1e-5,
                                   err_msg=f"dx R={R} C={C} {dtype}")
        np.testing.assert_allclose(np.asarray(dgp), np.asarray(dga),
                                   atol=1e-3, rtol=1e-4,
                                   err_msg=f"dgamma R={R} C={C} {dtype}")
        np.testing.assert_allclose(np.asarray(dbp), np.asarray(dba),
                                   atol=1e-3, rtol=1e-4,
                                   err_msg=f"dbeta R={R} C={C} {dtype}")


def test_layernorm_fp32_param_tree_unchanged():
    """LayerNormFP32 must keep the nn.LayerNorm param tree (ln/scale,
    ln/bias, f32) — checkpoint and torch-import compatibility."""
    from avsiam_tpu.models.layers import LayerNormFP32
    mdl = LayerNormFP32(64, epsilon=EPS, dtype=jnp.bfloat16)
    x = jnp.ones((2, 3, 64), jnp.bfloat16)
    params = mdl.init(jax.random.PRNGKey(0), x)
    leaves = params["params"]["ln"]
    assert set(leaves) == {"scale", "bias"}
    assert leaves["scale"].shape == (64,) and leaves["scale"].dtype == jnp.float32
    assert float(leaves["scale"][0]) == 1.0 and float(leaves["bias"][0]) == 0.0
    out = mdl.apply(params, x)
    assert out.dtype == jnp.bfloat16

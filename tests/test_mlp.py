"""Fused Pallas MLP (ops/mlp.py) vs the plain XLA two-GEMM reference:
forward values and all five gradients across GELU numerics, padded row
counts. Runs in interpreter mode on the CPU test mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsiam_tpu.ops.mlp import fused_mlp

D, H = 128, 256


def _ref_mlp(x, w1, b1, w2, b2, gelu):
    from avsiam_tpu.ops.gelu import gelu as gelu_op
    h = jnp.dot(x, w1) + b1
    # same impl on both sides: this test checks kernel plumbing, not GELU
    # accuracy (test_gelu.py covers that)
    h = gelu_op(h, impl=gelu)
    return jnp.dot(h, w2) + b2


def _params(key, dtype):
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (67, D), dtype)  # 67: exercises row padding
    w1 = jax.random.normal(ks[1], (D, H), dtype) * 0.05
    b1 = jax.random.normal(ks[2], (H,), dtype) * 0.1
    w2 = jax.random.normal(ks[3], (H, D), dtype) * 0.05
    b2 = jax.random.normal(ks[4], (D,), dtype) * 0.1
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("gelu", ["erf", "tanh", "cheb"])
def test_fused_mlp_forward_matches_xla(gelu):
    x, w1, b1, w2, b2 = _params(jax.random.PRNGKey(0), jnp.float32)
    got = fused_mlp(x, w1, b1, w2, b2, gelu=gelu)
    ref = _ref_mlp(x, w1, b1, w2, b2, gelu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("gelu", ["erf", "tanh", "cheb"])
def test_fused_mlp_grads_match_xla(gelu):
    x, w1, b1, w2, b2 = _params(jax.random.PRNGKey(1), jnp.float32)

    def loss_fused(x, w1, b1, w2, b2):
        y = fused_mlp(x, w1, b1, w2, b2, gelu=gelu)
        return jnp.sum(jnp.sin(y))

    def loss_ref(x, w1, b1, w2, b2):
        return jnp.sum(jnp.sin(_ref_mlp(x, w1, b1, w2, b2, gelu)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for name, a, b in zip(("dx", "dw1", "db1", "dw2", "db2"), g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4, err_msg=name)


def test_fused_mlp_3d_input_and_bf16():
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 40, D), jnp.bfloat16)
    _, w1, b1, w2, b2 = _params(jax.random.PRNGKey(3), jnp.float32)
    got = fused_mlp(x, w1, b1, w2, b2)
    ref = _ref_mlp(x.astype(jnp.float32), w1, b1, w2, b2, "erf")
    assert got.shape == (3, 40, D) and got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               atol=0.15, rtol=0.05)  # bf16 GEMM tolerance


def test_mlp_module_fused_matches_dense():
    """The Mlp module's fused impl must match the dense impl on identical
    params (f32)."""
    from avsiam_tpu.models.layers import Mlp
    rng = jax.random.PRNGKey(4)
    x = jax.random.normal(rng, (2, 33, D))
    dense = Mlp(D, H, jnp.float32, "erf", "dense")
    fused = Mlp(D, H, jnp.float32, "erf", "fused")
    params = dense.init(rng, x)
    out_d = dense.apply(params, x)
    out_f = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_d),
                               atol=1e-5, rtol=1e-5)


def test_fbwd_forward_bitwise_matches_dense_and_grads_match():
    """'fbwd' runs the dense XLA forward verbatim (bit-identical outputs)
    with the Pallas single-kernel backward (gradients equal to
    reassociation tolerance)."""
    from avsiam_tpu.models.layers import Mlp
    rng = jax.random.PRNGKey(6)
    x = jax.random.normal(rng, (2, 33, D))
    dense = Mlp(D, H, jnp.float32, "erf", "dense")
    params = dense.init(rng, x)

    def loss(impl, p, x):
        m = Mlp(D, H, jnp.float32, "erf", impl)
        return jnp.sum(jnp.sin(m.apply(p, x)))

    out_d = dense.apply(params, x)
    out_f = Mlp(D, H, jnp.float32, "erf", "fbwd").apply(params, x)
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_d))
    gd = jax.jit(jax.grad(lambda p, x: loss("dense", p, x),
                          argnums=(0, 1)))(params, x)
    gf = jax.jit(jax.grad(lambda p, x: loss("fbwd", p, x),
                          argnums=(0, 1)))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=2e-5, err_msg="fbwd grad")


@pytest.mark.parametrize("impl", ["fbwd", "fres"])
def test_hybrid_impls_grads_match_dense(impl):
    """'fres' (Pallas fwd emitting the hpre residual + XLA bwd) and 'fbwd'
    gradients match dense to float tolerance."""
    from avsiam_tpu.models.layers import Mlp
    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(rng, (2, 33, D))
    dense = Mlp(D, H, jnp.float32, "erf", "dense")
    params = dense.init(rng, x)

    def loss(impl_, p, x):
        m = Mlp(D, H, jnp.float32, "erf", impl_)
        return jnp.sum(jnp.sin(m.apply(p, x)))

    out_d = dense.apply(params, x)
    out_i = Mlp(D, H, jnp.float32, "erf", impl).apply(params, x)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(out_d),
                               atol=1e-5, rtol=1e-5)
    gd = jax.jit(jax.grad(lambda p, x: loss("dense", p, x),
                          argnums=(0, 1)))(params, x)
    gi = jax.jit(jax.grad(lambda p, x: loss(impl, p, x),
                          argnums=(0, 1)))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(gi),
                    jax.tree_util.tree_leaves(gd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=2e-5,
                                   err_msg=f"{impl} grad")


def test_mlp_remat_variants_bitwise_match_dense():
    """'remat_g'/'remat_all' change WHAT is saved for backward, not the math:
    forward outputs must be BIT-IDENTICAL to 'dense' and gradients equal to
    float-reassociation tolerance (the recomputed fc1 GEMM may be fused and
    reassociated differently by XLA inside the backward program)."""
    from avsiam_tpu.models.layers import Mlp
    rng = jax.random.PRNGKey(5)
    x = jax.random.normal(rng, (2, 33, D))
    dense = Mlp(D, H, jnp.float32, "erf", "dense")
    params = dense.init(rng, x)

    def loss(impl, p, x):
        m = Mlp(D, H, jnp.float32, "erf", impl)
        return jnp.sum(jnp.sin(m.apply(p, x)))

    out_d = dense.apply(params, x)
    gd = jax.jit(jax.grad(lambda p, x: loss("dense", p, x),
                          argnums=(0, 1)))(params, x)
    for impl in ("remat_g", "remat_all"):
        out_i = Mlp(D, H, jnp.float32, "erf", impl).apply(params, x)
        np.testing.assert_array_equal(np.asarray(out_i), np.asarray(out_d),
                                      err_msg=f"{impl} forward")
        gi = jax.jit(jax.grad(lambda p, x: loss(impl, p, x),
                              argnums=(0, 1)))(params, x)
        for a, b in zip(jax.tree_util.tree_leaves(gi),
                        jax.tree_util.tree_leaves(gd)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=2e-5,
                                       err_msg=f"{impl} grad")


def test_fres_mlp_under_dp_tp_mesh():
    """'fres' (the bench-default Pallas-forward MLP) must stay correct when
    its inputs arrive sharded from a DP x TP mesh: GSPMD has no partitioning
    rule for the pallas_call, so it must resolve the shardings (gathering as
    needed) without changing values or gradients vs the unsharded run."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from avsiam_tpu.parallel.mesh import make_mesh
    from avsiam_tpu.configs import MeshConfig

    mesh = make_mesh(MeshConfig(data=4, model=2))
    x, w1, b1, w2, b2 = _params(jax.random.PRNGKey(7), jnp.float32)
    x = jnp.tile(x[None], (8, 1, 1))  # [8, 67, D] so 'data' divides rows

    def loss(x, w1, b1, w2, b2):
        y = fused_mlp(x, w1, b1, w2, b2, gelu="erf", impl="fres")
        return jnp.sum(jnp.sin(y))

    ref_val = loss(x, w1, b1, w2, b2)
    ref_gr = jax.grad(loss, argnums=(1, 3))(x, w1, b1, w2, b2)

    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    w1s = jax.device_put(w1, NamedSharding(mesh, P(None, "model")))
    w2s = jax.device_put(w2, NamedSharding(mesh, P("model", None)))
    b1s = jax.device_put(b1, NamedSharding(mesh, P()))
    b2s = jax.device_put(b2, NamedSharding(mesh, P()))
    with mesh:
        val = jax.jit(loss)(xs, w1s, b1s, w2s, b2s)
        gr = jax.jit(jax.grad(loss, argnums=(1, 3)))(xs, w1s, b1s, w2s, b2s)
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-6)
    # atol 1e-4: dw sums 536 rows; the sharded run reduces in a different
    # order (per-shard partials + psum), so last-bit drift accumulates
    for name, a, b in zip(("dw1", "dw2"), gr, ref_gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4, err_msg=name)


def _ref_ln_mlp(x, g, bl, w1, b1, w2, b2, eps, gelu):
    from avsiam_tpu.ops.layernorm import _ln_fwd_math
    n = _ln_fwd_math(x, g, bl, eps)
    return x + _ref_mlp(n, w1, b1, w2, b2, gelu)


def test_fused_ln_mlp_matches_unfused():
    """'lnfres' (ops/mlp.py:fused_ln_mlp): LN + fc1 + GELU + fc2 + residual
    in one Pallas forward must match the unfused LN -> MLP -> add composition
    in values and in ALL gradients (x, ln scale/bias, both weight pairs)."""
    from avsiam_tpu.ops.mlp import fused_ln_mlp
    x, w1, b1, w2, b2 = _params(jax.random.PRNGKey(3), jnp.float32)
    g = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(8), (D,))
    bl = 0.1 * jax.random.normal(jax.random.PRNGKey(9), (D,))
    eps = 1e-5

    def l_new(x, g, bl, w1, b1, w2, b2):
        return jnp.sum(jnp.sin(fused_ln_mlp(x, g, bl, w1, b1, w2, b2,
                                            eps=eps, gelu="erf")))

    def l_ref(x, g, bl, w1, b1, w2, b2):
        return jnp.sum(jnp.sin(_ref_ln_mlp(x, g, bl, w1, b1, w2, b2,
                                           eps, "ans")))

    args = (x, g, bl, w1, b1, w2, b2)
    np.testing.assert_allclose(float(l_new(*args)), float(l_ref(*args)),
                               rtol=1e-5)
    gn = jax.jit(jax.grad(l_new, argnums=tuple(range(7))))(*args)
    gr = jax.jit(jax.grad(l_ref, argnums=tuple(range(7))))(*args)
    names = ("dx", "dgamma", "dbeta", "dw1", "db1", "dw2", "db2")
    for name, a, b in zip(names, gn, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5, err_msg=name)


def test_modality_block_lnfres_matches_dense():
    """ModalityBlock(mlp_impl='lnfres') must match the 'dense' block in
    forward and parameter gradients on every routing path (single-norm,
    'av' two-norm fallback, tconcat) with shared params."""
    from avsiam_tpu.models.layers import ModalityBlock
    mk = lambda impl: ModalityBlock(dim=D, num_heads=4, dtype=jnp.float32,
                                    attn_impl="xla", gelu="erf",
                                    mlp_impl=impl)
    ref, new = mk("dense"), mk("lnfres")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 24, D))
    params = ref.init(rng, x, "a")

    def loss(m, p):
        return jnp.sum(jnp.sin(m.apply(p, x, "a")))

    np.testing.assert_allclose(np.asarray(new.apply(params, x, "a")),
                               np.asarray(ref.apply(params, x, "a")),
                               atol=1e-5, rtol=1e-5)
    g0 = jax.jit(jax.grad(lambda p: loss(ref, p)))(params)
    g1 = jax.jit(jax.grad(lambda p: loss(new, p)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)
    # 'av' path (two norm sets -> standalone Mlp fallback mapping to 'fres')
    a_in = jax.random.normal(rng, (2, 16, D))
    v_in = jax.random.normal(rng, (2, 8, D))
    pav = ref.init(rng, (a_in, v_in), "av")
    for o_new, o_ref in zip(new.apply(pav, (a_in, v_in), "av"),
                            ref.apply(pav, (a_in, v_in), "av")):
        np.testing.assert_allclose(np.asarray(o_new), np.asarray(o_ref),
                                   atol=1e-5, rtol=1e-5)
    # tconcat path folds too
    xt = x.reshape(-1, D)
    t_ref = ref.apply(params, xt, "a", ((2, 24),), method=ref.call_tconcat)
    t_new = new.apply(params, xt, "a", ((2, 24),), method=new.call_tconcat)
    np.testing.assert_allclose(np.asarray(t_new), np.asarray(t_ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_ln_mlp_under_dp_mesh():
    """fused_ln_mlp under a DP-sharded input: GSPMD must resolve the
    pallas_call's shardings without changing values or gradients."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from avsiam_tpu.ops.mlp import fused_ln_mlp
    from avsiam_tpu.parallel.mesh import make_mesh
    from avsiam_tpu.configs import MeshConfig

    mesh = make_mesh(MeshConfig(data=8))
    x, w1, b1, w2, b2 = _params(jax.random.PRNGKey(7), jnp.float32)
    x = jnp.tile(x[None], (8, 1, 1))
    g = jnp.ones((D,))
    bl = jnp.zeros((D,))

    def loss(x, w1, b1, w2, b2):
        y = fused_ln_mlp(x, g, bl, w1, b1, w2, b2, eps=1e-5, gelu="erf")
        return jnp.sum(jnp.sin(y))

    ref_val = loss(x, w1, b1, w2, b2)
    ref_gr = jax.grad(loss, argnums=(1, 3))(x, w1, b1, w2, b2)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    with mesh:
        val = jax.jit(loss)(xs, w1, b1, w2, b2)
        gr = jax.jit(jax.grad(loss, argnums=(1, 3)))(xs, w1, b1, w2, b2)
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-6)
    for name, a, b in zip(("dw1", "dw2"), gr, ref_gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4, err_msg=name)


def test_lnfres_both_sides_inherits_cleanly():
    """The decoder inherits mlp_impl='lnfres' with no warning and no silent
    fallback. (A round-4 guard warned and broke this combination after two
    "catastrophic" throughput readings that round-5 re-measurement could
    not reproduce — lnfres+lnfres is in fact the FASTER config and is what
    'auto' now resolves to on TPU; BENCH_NOTES round 5.) The forward must
    match an explicit dec_mlp_impl='lnfres' config bit-for-bit."""
    import warnings

    from avsiam_tpu.configs import CAVMAEConfig, DecoderConfig, ViTConfig
    from avsiam_tpu.models import CAVMAEPretrain

    # lnfres requires 128-aligned dims (ops/mlp.py:fused_ln_mlp asserts)
    vit = ViTConfig(dim=128, depth=1, num_heads=2, patch_size=16,
                    img_size=32, audio_length=64, mel_bins=32)
    dec = DecoderConfig(dim=128, depth=1, num_heads=2)
    rng = jax.random.PRNGKey(0)
    a = jax.random.normal(rng, (2, vit.audio_length, vit.mel_bins))
    v = jax.random.normal(rng, (2, 3, vit.img_size, vit.img_size))
    rngs = {"params": rng, "mask": rng, "perm": rng}

    cfg = CAVMAEConfig(vit=vit, decoder=dec, mlp_impl="lnfres")
    cfg2 = CAVMAEConfig(vit=vit, decoder=dec, mlp_impl="lnfres",
                        dec_mlp_impl="lnfres")
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)  # no warning either way
        params = CAVMAEPretrain(cfg).init(rngs, a, v)
        params2 = CAVMAEPretrain(cfg2).init(rngs, a, v)
    out = CAVMAEPretrain(cfg).apply(params, a, v, rngs=rngs)
    out2 = CAVMAEPretrain(cfg2).apply(params2, a, v, rngs=rngs)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(out2[0]))

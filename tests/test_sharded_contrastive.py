"""Distributed-correctness tests on the virtual 8-device CPU mesh:

* the GSPMD-jitted InfoNCE over a 'data'-sharded batch equals the
  single-device value (the GatherLayer-equivalence claim);
* the explicit shard_map all_gather formulation agrees too, including grads;
* a DP-sharded pretrain step produces the same loss as unsharded.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from avsiam_tpu.configs import CAVMAEConfig, DecoderConfig, MeshConfig, \
    OptimizerConfig, PretrainConfig, ViTConfig
from avsiam_tpu.ops.contrastive import info_nce, info_nce_gathered
from avsiam_tpu.parallel.mesh import batch_sharding, make_mesh


def test_sharded_info_nce_matches_single_device():
    mesh = make_mesh(MeshConfig(data=8, model=1))
    rng = jax.random.PRNGKey(0)
    a = jax.random.normal(rng, (16, 32))
    v = jax.random.normal(jax.random.PRNGKey(1), (16, 32))
    ref_loss, ref_acc = info_nce(a, v)

    bs = batch_sharding(mesh)
    a_sh = jax.device_put(a, bs)
    v_sh = jax.device_put(v, bs)
    with mesh:
        loss, acc = jax.jit(info_nce)(a_sh, v_sh)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
    np.testing.assert_allclose(float(acc), float(ref_acc), rtol=1e-6)


def test_shardmap_all_gather_formulation_matches():
    from jax import shard_map  # moved out of jax.experimental in jax 0.8
    mesh = make_mesh(MeshConfig(data=8, model=1))
    rng = jax.random.PRNGKey(0)
    a = jax.random.normal(rng, (16, 32))
    v = jax.random.normal(jax.random.PRNGKey(1), (16, 32))
    ref_loss, _ = info_nce(a, v)

    def _loss(a, v):
        loss = info_nce_gathered(a, v, axis_name="data")[0]
        # value is identical on every shard; pmean proves replication to the
        # shard_map checker
        return jax.lax.pmean(loss, "data")

    fn = shard_map(_loss, mesh=mesh,
                   in_specs=(P("data", None), P("data", None)),
                   out_specs=P())
    loss = jax.jit(fn)(a, v)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)

    # gradients through the explicit all_gather (GatherLayer backward path)
    g_ref = jax.grad(lambda a: info_nce(a, v)[0])(a)
    g_sh = jax.jit(jax.grad(lambda a: fn(a, v)))(a)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-7)


def test_dp_sharded_pretrain_step_matches_unsharded():
    from avsiam_tpu.models import CAVMAEPretrain
    from avsiam_tpu.train.pretrain import init_state, make_pretrain_step
    vit = ViTConfig(dim=32, depth=2, num_heads=2, patch_size=16, img_size=32,
                    audio_length=128, mel_bins=32)
    cfg = PretrainConfig(
        model=CAVMAEConfig(vit=vit, decoder=DecoderConfig(dim=16, depth=1,
                                                          num_heads=2)),
        opt=OptimizerConfig(lr=1e-3), batch_size=8)
    model = CAVMAEPretrain(cfg.model)
    rng = jax.random.PRNGKey(0)
    a = jax.random.normal(rng, (8, vit.audio_length, vit.mel_bins))
    v = jax.random.normal(rng, (8, 3, vit.img_size, vit.img_size))
    state0 = init_state(rng, model, cfg, (a, v))
    step = make_pretrain_step(model, cfg)
    _, m_ref = step(state0, (a, v), rng, jnp.float32(1e-3))
    ref = {k: float(val) for k, val in m_ref.items()}

    mesh = make_mesh(MeshConfig(data=8, model=1))
    bs = batch_sharding(mesh)
    repl = NamedSharding(mesh, P())
    state1 = init_state(rng, model, cfg, (a, v))
    state1 = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl), state1)
    a_sh = jax.device_put(a, bs)
    v_sh = jax.device_put(v, bs)
    with mesh:
        _, m_sh = step(state1, (a_sh, v_sh), rng, jnp.float32(1e-3))
    got = {k: float(val) for k, val in m_sh.items()}
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=5e-4, atol=1e-5,
                                   err_msg=k)


def test_tp_sharded_pretrain_step_matches_replicated():
    """Tensor parallelism (mesh 'model' axis, Megatron qkv/fc sharding rules)
    is a pure layout choice: a 4x2 DPxTP step must reproduce the replicated
    step's losses AND parameter updates."""
    from avsiam_tpu.models import CAVMAEPretrain
    from avsiam_tpu.train.loops import _shard_state
    from avsiam_tpu.train.pretrain import init_state, make_pretrain_step
    vit = ViTConfig(dim=32, depth=2, num_heads=2, patch_size=16, img_size=32,
                    audio_length=128, mel_bins=32)
    cfg = PretrainConfig(
        model=CAVMAEConfig(vit=vit, decoder=DecoderConfig(dim=16, depth=1,
                                                          num_heads=2)),
        opt=OptimizerConfig(lr=1e-3), batch_size=8)
    model = CAVMAEPretrain(cfg.model)
    rng = jax.random.PRNGKey(0)
    a = jax.random.normal(rng, (8, vit.audio_length, vit.mel_bins))
    v = jax.random.normal(rng, (8, 3, vit.img_size, vit.img_size))
    step = make_pretrain_step(model, cfg)
    ref_state, m_ref = step(init_state(rng, model, cfg, (a, v)), (a, v), rng,
                            jnp.float32(1e-3))
    ref = {k: float(val) for k, val in m_ref.items()}
    ref_qkv = np.asarray(jax.device_get(
        ref_state.params["vit"]["blocks_0"]["attn"]["qkv"]["kernel"]))
    ref_fc2 = np.asarray(jax.device_get(
        ref_state.params["vit"]["blocks_0"]["mlp"]["fc2"]["kernel"]))

    mesh = make_mesh(MeshConfig(data=4, model=2))
    state1 = _shard_state(init_state(rng, model, cfg, (a, v)), mesh)
    qkv_sharding = state1.params["vit"]["blocks_0"]["attn"]["qkv"][
        "kernel"].sharding
    assert qkv_sharding.spec == P(None, "model"), qkv_sharding
    bs = batch_sharding(mesh)
    with mesh:
        new_state, m_sh = step(state1, (jax.device_put(a, bs),
                                        jax.device_put(v, bs)), rng,
                               jnp.float32(1e-3))
    got = {k: float(val) for k, val in m_sh.items()}
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=5e-4, atol=1e-5,
                                   err_msg=k)
    # updated params match leaf-for-leaf across the TP layout
    got_qkv = np.asarray(jax.device_get(
        new_state.params["vit"]["blocks_0"]["attn"]["qkv"]["kernel"]))
    got_fc2 = np.asarray(jax.device_get(
        new_state.params["vit"]["blocks_0"]["mlp"]["fc2"]["kernel"]))
    # row-parallel fc2 accumulates partial sums via psum -> different f32
    # reduction order than the replicated matmul; tolerance matches that
    np.testing.assert_allclose(got_qkv, ref_qkv, rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(got_fc2, ref_fc2, rtol=5e-4, atol=1e-5)


def test_sharded_mmixed_exact_vs_padded_and_unsharded():
    """VERDICT r3 #7: the bench default (mmixed_impl='exact') must be correct
    when the batch axis is sharded over the mesh. 'exact' does per-chunk
    take_batch gathers + an argsort inverse-permute ACROSS the batch axis —
    under GSPMD these become cross-device collectives, the one mmixed code
    path the tiny dryrun (padded default) never exercised.

    Asserts, with identical RNG draws:
    * exact sharded == exact unsharded (embeddings, full mmixed forward);
    * padded sharded == padded unsharded;
    * exact sharded == packed sharded (same-RNG impl pair, now on the mesh).
    """
    from avsiam_tpu.configs import replace
    from avsiam_tpu.models import CAVMAEPretrain
    from avsiam_tpu.models.cavmae import CAVMAEPretrain as M

    vit = ViTConfig(dim=32, depth=2, num_heads=2, patch_size=16, img_size=32,
                    audio_length=128, mel_bins=32)
    cfg = CAVMAEConfig(vit=vit, mmixed_impl="exact",
                       decoder=DecoderConfig(dim=16, depth=1, num_heads=2))
    mesh = make_mesh(MeshConfig(data=8, model=1))
    bs = batch_sharding(mesh)
    rng = jax.random.PRNGKey(0)
    B = 8
    a = jax.random.normal(rng, (B, vit.audio_length, vit.mel_bins))
    v = jax.random.normal(jax.random.PRNGKey(1),
                          (B, 3, vit.img_size, vit.img_size))
    model = CAVMAEPretrain(cfg)
    params = model.init({"params": rng, "mask": rng, "perm": rng}, a, v,
                        mae_loss_weight=0.0, contrast_loss_weight=1.0)
    rngs = {"mask": jax.random.PRNGKey(1), "perm": jax.random.PRNGKey(2)}

    outs = {}
    for impl in ("exact", "padded", "packed"):
        m = CAVMAEPretrain(replace(cfg, mmixed_impl=impl))
        fwd = jax.jit(lambda p, a, v, m=m: m.apply(
            p, a, v, method=M.forward_encoder_mmixed, rngs=rngs))
        ref = fwd(params, a, v)
        with mesh:
            sh = fwd(params, jax.device_put(a, bs), jax.device_put(v, bs))
        for r, s in zip(ref, sh):
            np.testing.assert_allclose(np.asarray(s), np.asarray(r),
                                       atol=2e-5, rtol=1e-4,
                                       err_msg=f"{impl}: sharded != unsharded")
        outs[impl] = sh
    # exact and packed consume identical RNG draws -> identical on the mesh
    for e, p in zip(outs["exact"], outs["packed"]):
        np.testing.assert_allclose(np.asarray(p), np.asarray(e),
                                   atol=2e-5, rtol=1e-4,
                                   err_msg="packed != exact on sharded batch")


def test_dp_sharded_exact_mmixed_step_matches_unsharded():
    """Full two-pass TRAIN STEP with mmixed_impl='exact' (the bench default)
    on the 8-device mesh: losses and c_acc must match the unsharded step —
    gradients of the cross-batch gathers/inverse-permutes included."""
    from avsiam_tpu.configs import replace
    from avsiam_tpu.models import CAVMAEPretrain
    from avsiam_tpu.train.pretrain import init_state, make_pretrain_step

    vit = ViTConfig(dim=32, depth=2, num_heads=2, patch_size=16, img_size=32,
                    audio_length=128, mel_bins=32)
    cfg = PretrainConfig(
        model=CAVMAEConfig(vit=vit, mmixed_impl="exact",
                           decoder=DecoderConfig(dim=16, depth=1,
                                                 num_heads=2)),
        opt=OptimizerConfig(lr=1e-3), batch_size=8)
    model = CAVMAEPretrain(cfg.model)
    rng = jax.random.PRNGKey(0)
    a = jax.random.normal(rng, (8, vit.audio_length, vit.mel_bins))
    v = jax.random.normal(rng, (8, 3, vit.img_size, vit.img_size))
    state0 = init_state(rng, model, cfg, (a, v))
    step = make_pretrain_step(model, cfg)
    _, m_ref = step(state0, (a, v), rng, jnp.float32(1e-3))
    ref = {k: float(val) for k, val in m_ref.items()}

    mesh = make_mesh(MeshConfig(data=8, model=1))
    bs = batch_sharding(mesh)
    repl = NamedSharding(mesh, P())
    state1 = init_state(rng, model, cfg, (a, v))
    state1 = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl), state1)
    with mesh:
        _, m_sh = step(state1, (jax.device_put(a, bs), jax.device_put(v, bs)),
                       rng, jnp.float32(1e-3))
    got = {k: float(val) for k, val in m_sh.items()}
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=5e-4, atol=1e-5,
                                   err_msg=k)

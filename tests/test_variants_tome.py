"""Tests: audio-only model, ToMe merging, variants, forward_feat/inpaint."""

import jax
import jax.numpy as jnp
import numpy as np

from avsiam_tpu.configs import CAVMAEConfig, DecoderConfig, ViTConfig
from avsiam_tpu.models import CAVMAEPretrain
from avsiam_tpu.models.audio_only import CAVMAEFTAudio
from avsiam_tpu.models.pos_embed import get_2d_sincos_pos_embed
from avsiam_tpu.models.tome import bipartite_soft_matching, merge_wavg
from avsiam_tpu.models.variants import (finetune_config, pretrain_config,
                                        vit_config)

TINY = ViTConfig(dim=32, depth=4, num_heads=2, patch_size=16, img_size=32,
                 audio_length=128, mel_bins=32)


def test_audio_only_model():
    model = CAVMAEFTAudio(vit=TINY, label_dim=5, modality_specific_depth=3)
    rng = jax.random.PRNGKey(0)
    a = jax.random.normal(rng, (2, TINY.audio_length, TINY.mel_bins))
    variables = jax.jit(lambda r, a: model.init(r, a, method=model.forward_pred)
                        )(rng, a)
    out = model.apply(variables, a, method=model.forward_pred)
    assert out.shape == (2, 5)
    feat = model.apply(variables, a)
    assert feat.shape == (2, TINY.num_audio_tokens, TINY.dim)
    # split-trunk structure: 3 audio blocks + 1 unified block
    p = variables["params"]
    assert "blocks_a_2" in p and "blocks_u_0" in p and "blocks_a_3" not in p
    # fixed sin-cos pos embed at init
    f, t = TINY.audio_grid
    expected = get_2d_sincos_pos_embed(TINY.dim, f, t)[None]
    np.testing.assert_allclose(np.asarray(p["pos_embed_a"]), expected,
                               atol=1e-6)


def test_tome_merge_reduces_unique_tokens():
    rng = jax.random.PRNGKey(0)
    B, N, D = 2, 16, 8
    metric = jax.random.normal(rng, (B, N, D))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, D))
    r = 4
    assign, keep = bipartite_soft_matching(metric, r)
    assert assign.shape == (B, N, N)
    assert int((~keep[0]).sum()) == r
    merged, size = merge_wavg(assign, x)
    # mass conservation: total weighted sum is preserved
    np.testing.assert_allclose(np.asarray((merged * size).sum(axis=(1, 2))),
                               np.asarray(x.sum(axis=(1, 2))), rtol=1e-4)
    # kept-token count: sizes on kept slots sum to N
    np.testing.assert_allclose(
        np.asarray((size[:, :, 0] * keep).sum(axis=1)),
        np.full(B, N, np.float32), rtol=1e-5)


def test_tome_identity_when_r0():
    metric = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 4))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 4))
    assign, keep = bipartite_soft_matching(metric, 0)
    merged, _ = merge_wavg(assign, x)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(x), atol=1e-6)
    assert bool(keep.all())


def test_variant_presets():
    assert vit_config("cav-mae-large").dim == 1024
    assert vit_config("cav-mae-huge").depth == 32
    assert vit_config("cav-mae-base-clip").dim == 768
    cfg = pretrain_config("cav-mae-base")
    assert cfg.decoder.dim == 512 and cfg.decoder.depth == 8
    ft = finetune_config("tiny", label_dim=7)
    assert ft.label_dim == 7 and ft.vit.dim == 32


def test_forward_feat_and_inpaint():
    cfg = CAVMAEConfig(vit=TINY, decoder=DecoderConfig(dim=16, depth=1,
                                                       num_heads=2))
    model = CAVMAEPretrain(cfg)
    rng = jax.random.PRNGKey(0)
    a = jax.random.normal(rng, (2, TINY.audio_length, TINY.mel_bins))
    v = jax.random.normal(rng, (2, 3, TINY.img_size, TINY.img_size))
    params = jax.jit(model.init)({"params": rng, "mask": rng, "perm": rng},
                                 a, v)
    fa, fv = model.apply(params, a, v, method=model.forward_feat)
    assert fa.shape == (2, TINY.num_audio_tokens, TINY.dim)
    assert fv.shape == (2, TINY.num_video_tokens, TINY.dim)
    img_a, img_v, mask_a, mask_v = model.apply(
        params, a, v, method=model.forward_inpaint,
        rngs={"mask": jax.random.PRNGKey(1)})
    assert img_a.shape == (2, 1, TINY.mel_bins, TINY.audio_length)
    assert img_v.shape == (2, 3, TINY.img_size, TINY.img_size)
    assert np.isfinite(np.asarray(img_v)).all()


def test_block_tome_path():
    """Block r>0 applies ToMe after attention and returns a keep mask."""
    import flax.linen as nn
    from avsiam_tpu.models.layers import ModalityBlock
    rng = jax.random.PRNGKey(0)
    blk = ModalityBlock(16, 2)
    x = jax.random.normal(rng, (2, 12, 16))
    params = blk.init(rng, x, "a")
    out, keep = blk.apply(params, x, "a", None, 4)
    assert out.shape == x.shape
    assert keep.shape == (2, 12)
    assert int((~keep).sum(axis=1)[0]) == 4
    # r=0 unchanged signature
    out0 = blk.apply(params, x, "a")
    assert out0.shape == x.shape


def test_audio_only_tr_pos_freezes_pos_embed():
    """tr_pos=False must zero the pos-embed gradient (audio_mdl.py's
    requires_grad=tr_pos) while leaving the param in the tree (checkpoint
    shapes unchanged); tr_pos=True trains it."""
    import numpy as np

    rng = jax.random.PRNGKey(1)
    a = jax.random.normal(rng, (2, TINY.audio_length, TINY.mel_bins))
    for tr_pos, expect_zero in ((False, True), (True, False)):
        model = CAVMAEFTAudio(vit=TINY, label_dim=5,
                              modality_specific_depth=3, tr_pos=tr_pos)
        variables = jax.jit(
            lambda r, a, m=model: m.init(r, a, method=m.forward_pred))(rng, a)

        def loss(params, m=model):
            out = m.apply({"params": params}, a, method=m.forward_pred)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(variables["params"])
        gp = np.asarray(g["pos_embed_a"])
        assert (np.all(gp == 0) == expect_zero), tr_pos
        assert "pos_embed_a" in variables["params"]


def test_audio_only_gelu_and_mlp_impl_thread_into_blocks():
    """gelu/mlp_impl config must reach the blocks: 'tanh' GELU produces
    different activations than the default 'erf' (it silently didn't before
    round 3), while mlp_impl='remat_g' is bit-identical by construction."""
    import dataclasses
    import numpy as np

    rng = jax.random.PRNGKey(2)
    a = jax.random.normal(rng, (2, TINY.audio_length, TINY.mel_bins))
    base = CAVMAEFTAudio(vit=TINY, label_dim=5, modality_specific_depth=3)
    variables = jax.jit(
        lambda r, a: base.init(r, a, method=base.forward_pred))(rng, a)
    out_erf = base.apply(variables, a, method=base.forward_pred)
    tanh_vit = dataclasses.replace(TINY, gelu="tanh")
    m_tanh = CAVMAEFTAudio(vit=tanh_vit, label_dim=5,
                           modality_specific_depth=3)
    out_tanh = m_tanh.apply(variables, a, method=m_tanh.forward_pred)
    assert not np.allclose(np.asarray(out_erf), np.asarray(out_tanh),
                           atol=1e-6)
    m_remat = CAVMAEFTAudio(vit=TINY, label_dim=5, modality_specific_depth=3,
                            mlp_impl="remat_g")
    out_remat = m_remat.apply(variables, a, method=m_remat.forward_pred)
    np.testing.assert_array_equal(np.asarray(out_remat), np.asarray(out_erf))

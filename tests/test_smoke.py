"""End-to-end smoke tests on tiny geometry (BASELINE.json config #1 shape)."""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from avsiam_tpu.configs import CAVMAEConfig, CAVMAEFTConfig, ViTConfig, DecoderConfig
from avsiam_tpu.models import CAVMAEPretrain, CAVMAEFinetune

TINY_VIT = ViTConfig(dim=32, depth=2, num_heads=2, patch_size=16,
                     img_size=64, audio_length=128, mel_bins=32)
TINY_DEC = DecoderConfig(dim=16, depth=1, num_heads=2)


def _batch(rng, vit, B=2, T=None):
    ka, kv = jax.random.split(rng)
    a = jax.random.normal(ka, (B, vit.audio_length, vit.mel_bins))
    shape = ((B, 3, vit.img_size, vit.img_size)
             if T is None else (B, T, 3, vit.img_size, vit.img_size))
    v = jax.random.normal(kv, shape)
    return a, v


def test_pretrain_forward_losses_finite():
    cfg = CAVMAEConfig(vit=TINY_VIT, decoder=TINY_DEC)
    model = CAVMAEPretrain(cfg)
    rng = jax.random.PRNGKey(0)
    a, v = _batch(rng, TINY_VIT, B=6)
    params = model.init({"params": rng, "mask": rng, "perm": rng}, a, v)
    out = model.apply(params, a, v, 0.25, 0.25, 1.0, 1.0,
                      rngs={"mask": jax.random.PRNGKey(1),
                            "perm": jax.random.PRNGKey(2)})
    loss, loss_mae, loss_mae_a, loss_mae_v, loss_c, mask_a, mask_v, c_acc = out
    assert jnp.isfinite(loss)
    assert jnp.isfinite(loss_c)
    assert jnp.allclose(loss, loss_mae + loss_c, rtol=1e-5)
    # when the contrastive branch runs, the mmixed call overwrites the masks
    # with its None returns (cav_mae_base.py:594,722)
    assert mask_a is None and mask_v is None

    # MAE-only forward returns the real masks: 75% removed (hardcoded ratio,
    # cav_mae_base.py:696)
    out = model.apply(params, a, v, 0.25, 0.25, 1.0, 0.0,
                      rngs={"mask": jax.random.PRNGKey(1),
                            "perm": jax.random.PRNGKey(2)})
    mask_a, mask_v = out[5], out[6]
    La = TINY_VIT.num_audio_tokens
    Lv = TINY_VIT.num_video_tokens
    assert mask_a.shape == (6, La)
    assert int(mask_a[0].sum()) == La - int(La * 0.25)
    assert int(mask_v[0].sum()) == Lv - int(Lv * 0.25)


def test_pretrain_mmixed_exact_matches_padded_shapes():
    for impl in ("exact", "padded"):
        cfg = CAVMAEConfig(vit=TINY_VIT, decoder=TINY_DEC, mmixed_impl=impl)
        model = CAVMAEPretrain(cfg)
        rng = jax.random.PRNGKey(0)
        a, v = _batch(rng, TINY_VIT, B=6)
        params = model.init({"params": rng, "mask": rng, "perm": rng}, a, v,
                            mae_loss_weight=0.0, contrast_loss_weight=1.0)
        out = model.apply(params, a, v, 0.25, 0.25, 0.0, 1.0,
                          rngs={"mask": jax.random.PRNGKey(1),
                                "perm": jax.random.PRNGKey(2)})
        assert jnp.isfinite(out[4])


def test_pretrain_grads_flow():
    cfg = CAVMAEConfig(vit=TINY_VIT, decoder=TINY_DEC)
    model = CAVMAEPretrain(cfg)
    rng = jax.random.PRNGKey(0)
    a, v = _batch(rng, TINY_VIT, B=5)
    params = model.init({"params": rng, "mask": rng, "perm": rng}, a, v)

    def loss_fn(p):
        out = model.apply(p, a, v, 0.25, 0.25, 1.0, 1.0,
                          rngs={"mask": jax.random.PRNGKey(1),
                                "perm": jax.random.PRNGKey(2)})
        return out[0]

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(jnp.all(jnp.isfinite(g)) for g in leaves)
    # decoder gets gradient from the MAE loss
    gd = grads["params"]["decoder"]["pred_a"]["kernel"]
    assert float(jnp.abs(gd).max()) > 0


@pytest.mark.parametrize("mode,is_eval,expected", [
    # expected: output shape, with T standing for the eval frame count;
    # 'triple' = mm_grad training returns (av, a, v) logits
    ("audioonly", False, (2, 7)),
    ("audioonly", True, (2, 1, 7)),
    ("videoonly", False, (2, 7)),
    ("mm_grad", False, "triple"),
    ("mm_grad", True, (2, "T", 7)),
    ("joint_av", False, (2, 7)),
])
def test_finetune_modes(mode, is_eval, expected):
    cfg = CAVMAEFTConfig(vit=TINY_VIT, label_dim=7)
    model = CAVMAEFinetune(cfg)
    rng = jax.random.PRNGKey(0)
    T = 3 if is_eval else 1
    a, v = _batch(rng, TINY_VIT, B=2, T=T)
    params = model.init(rng, a, v, mode, is_eval)
    out = model.apply(params, a, v, mode, is_eval)
    if expected == "triple":
        assert len(out) == 3
        assert out[0].shape == (2, 7)
    else:
        want = tuple(T if d == "T" else d for d in expected)
        assert out.shape == want


def test_finetune_retrieval_mode():
    vit = dataclasses.replace(TINY_VIT)
    cfg = CAVMAEFTConfig(vit=vit, label_dim=7)
    model = CAVMAEFinetune(cfg)
    rng = jax.random.PRNGKey(0)
    a, v = _batch(rng, vit, B=2, T=6)
    params = model.init(rng, a, v, "retrieval")
    a_tok, v_tok = model.apply(params, a, v, "retrieval")
    assert a_tok.shape == (2, vit.num_audio_tokens, vit.dim)
    assert v_tok.shape == (2, vit.num_video_tokens, vit.dim)


def test_retrieval_single_frame_matches_frame_slice():
    """A caller that pre-selected its frame (loader-side frame_use,
    reference retrieval.py:100-103) passes [B, 1, ...] and must get exactly
    the tokens the 10-frame tensor would yield at that index."""
    vit = dataclasses.replace(TINY_VIT)
    cfg = CAVMAEFTConfig(vit=vit, label_dim=7)
    model = CAVMAEFinetune(cfg)
    rng = jax.random.PRNGKey(3)
    a, v = _batch(rng, vit, B=2, T=10)
    params = model.init(rng, a, v, "retrieval")
    _, v_tok_full = model.apply(params, a, v, "retrieval")  # frame 5 quirk
    for k in (2, 5):
        _, v_tok_one = model.apply(params, a, v[:, k:k + 1], "retrieval")
        import numpy as np
        if k == 5:
            # allclose, not bit-equal: encoding 1 frame vs 10 changes the
            # GEMM batch shape, so XLA reassociates reductions differently
            np.testing.assert_allclose(np.asarray(v_tok_one),
                                       np.asarray(v_tok_full),
                                       atol=1e-5, rtol=1e-4)
        else:
            assert not np.allclose(np.asarray(v_tok_one),
                                   np.asarray(v_tok_full))


def test_dataset_frame_use_selects_frame():
    """AVDataset(frame_use=k) must return frame k in single-frame eval
    batches (the reference's val_audio_conf['frame_use'])."""
    import numpy as np
    from avsiam_tpu.configs import AudioConfig
    from avsiam_tpu.data.dataset import AVDataset
    import json as _json
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        idx = os.path.join(d, "i.json")
        with open(idx, "w") as f:
            _json.dump({"data": [{"wav": "/x.wav", "labels": ""}]}, f)
        kw = dict(mode="eval", frame_source="synthetic", im_res=32)
        ds_all = AVDataset(idx, AudioConfig(target_length=128), **kw)
        _, frames10, _, _ = ds_all.batch([0], 0, frames_per_sample=10)
        for k in (0, 7):
            ds_k = AVDataset(idx, AudioConfig(target_length=128),
                             frame_use=k, **kw)
            _, f1, _, _ = ds_k.batch([0], 0, frames_per_sample=1)
            np.testing.assert_array_equal(f1[0, 0], frames10[0, k])
        # frame_use >= 0 also pins the frame in TRAIN mode (opt-in
        # determinism; -1 keeps the reference's random-of-10 draw)
        kw_tr = dict(kw, mode="train")
        ds_tr = AVDataset(idx, AudioConfig(target_length=128),
                          frame_use=7, **kw_tr)
        for seed in (0, 1, 2):
            _, f1, _, _ = ds_tr.batch([0], seed, frames_per_sample=1)
            np.testing.assert_array_equal(f1[0, 0], frames10[0, 7])


def test_dataset_synthetic_paired_shares_latent():
    """'synthetic_paired' clips carry the same per-clip latent in both
    modalities (tone-bank amplitudes == frame band intensities), are
    deterministic per path, and differ across clips."""
    import numpy as np
    from avsiam_tpu.configs import AudioConfig
    from avsiam_tpu.data.dataset import AVDataset
    import json as _json
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        idx = os.path.join(d, "i.json")
        with open(idx, "w") as f:
            _json.dump({"data": [{"wav": f"/p/{i}.wav", "labels": ""}
                                 for i in range(4)]}, f)
        ds = AVDataset(idx, AudioConfig(target_length=128), mode="train",
                       frame_source="synthetic_paired", im_res=32, n_class=2)
        w, fr, _, _ = ds.batch([0, 1, 2, 3], 0)
        w2, fr2, _, _ = ds.batch([0, 1, 2, 3], 1)  # other seed: same data
        np.testing.assert_array_equal(w, w2)
        assert not np.array_equal(w[0], w[1])
        assert not np.array_equal(fr[0], fr[1])
        # frame band means recover the latent (up to affine scale)
        amps = ds._paired_latent(ds.index[0])
        bands = fr[0, 0].astype(np.float32).mean(axis=(0, 2))
        bands = bands.reshape(len(amps), -1).mean(axis=1)
        assert np.corrcoef(amps, bands)[0, 1] > 0.99

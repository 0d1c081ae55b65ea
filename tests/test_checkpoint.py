"""Checkpoint save/restore, weight averaging, timm surgery, pretrain->FT
transfer, and pretrain state_dict import round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

from avsiam_tpu.configs import (CAVMAEConfig, CAVMAEFTConfig, DecoderConfig,
                                ViTConfig)
from avsiam_tpu.models import CAVMAEFinetune, CAVMAEPretrain
from avsiam_tpu.utils.checkpoint import (average_checkpoints, restore_params,
                                         save_params, transfer_pretrain_to_ft)
from avsiam_tpu.utils.torch_import import (import_cavmae_pretrain,
                                           vit_surgery_from_timm)

VIT = ViTConfig(dim=32, depth=2, num_heads=2, patch_size=16, img_size=64,
                audio_length=128, mel_bins=32)
DEC = DecoderConfig(dim=16, depth=1, num_heads=2)


def _pretrain_params():
    model = CAVMAEPretrain(CAVMAEConfig(vit=VIT, decoder=DEC))
    rng = jax.random.PRNGKey(0)
    a = jnp.zeros((2, VIT.audio_length, VIT.mel_bins))
    v = jnp.zeros((2, 3, VIT.img_size, VIT.img_size))
    return model, jax.jit(model.init)(
        {"params": rng, "mask": rng, "perm": rng}, a, v)["params"]


def test_save_restore_average(tmp_path):
    _, params = _pretrain_params()
    exp = str(tmp_path)
    save_params(exp, "audio_model.1", params)
    p2 = jax.tree_util.tree_map(lambda x: x + 1.0, params)
    save_params(exp, "audio_model.2", p2)
    r = restore_params(exp, "audio_model.1", like=params)
    leaf = r["vit"]["pos_embed_a"]
    np.testing.assert_allclose(np.asarray(leaf),
                               np.asarray(params["vit"]["pos_embed_a"]))
    avg = average_checkpoints(exp, 1, 2, like=params)
    np.testing.assert_allclose(
        np.asarray(avg["vit"]["pos_embed_a"]),
        np.asarray(params["vit"]["pos_embed_a"]) + 0.5, atol=1e-6)


def test_timm_surgery():
    """Audio patch embed must be the RGB mean; pos_embed_a a nearest-resample;
    norms duplicated."""
    torch.manual_seed(0)
    sd = {}
    D = VIT.dim
    sd["patch_embed.proj.weight"] = torch.randn(D, 3, 16, 16)
    sd["patch_embed.proj.bias"] = torch.randn(D)
    sd["pos_embed"] = torch.randn(1, 1 + VIT.num_video_tokens, D)
    sd["cls_token"] = torch.randn(1, 1, D)
    for i in range(VIT.depth):
        p = f"blocks.{i}"
        for n in ("norm1", "norm2"):
            sd[f"{p}.{n}.weight"] = torch.randn(D)
            sd[f"{p}.{n}.bias"] = torch.randn(D)
        sd[f"{p}.attn.qkv.weight"] = torch.randn(3 * D, D)
        sd[f"{p}.attn.qkv.bias"] = torch.randn(3 * D)
        sd[f"{p}.attn.proj.weight"] = torch.randn(D, D)
        sd[f"{p}.attn.proj.bias"] = torch.randn(D)
        sd[f"{p}.mlp.fc1.weight"] = torch.randn(4 * D, D)
        sd[f"{p}.mlp.fc1.bias"] = torch.randn(4 * D)
        sd[f"{p}.mlp.fc2.weight"] = torch.randn(D, 4 * D)
        sd[f"{p}.mlp.fc2.bias"] = torch.randn(D)
    sd["norm.weight"] = torch.randn(D)
    sd["norm.bias"] = torch.randn(D)

    tree = vit_surgery_from_timm(sd, depth=VIT.depth,
                                 num_audio_tokens=VIT.num_audio_tokens)
    # audio patch embed == channel-mean: compare against conv-weight mean
    w = sd["patch_embed.proj.weight"].numpy()  # [D,3,16,16]
    expected = w.mean(axis=1).transpose(1, 2, 0).reshape(-1, D)
    np.testing.assert_allclose(tree["patch_embed_a"]["proj"]["kernel"],
                               expected, atol=1e-6)
    # pos_embed_a: nearest resample of grid tokens
    pos = sd["pos_embed"].numpy()[:, 1:]
    idx = (np.arange(VIT.num_audio_tokens) * pos.shape[1]
           // VIT.num_audio_tokens)
    np.testing.assert_allclose(tree["pos_embed_a"][0], pos[0, idx], atol=1e-6)
    # duplicated norms
    np.testing.assert_allclose(tree["blocks_0"]["norm1_a"]["ln"]["scale"],
                               tree["blocks_0"]["norm1"]["ln"]["scale"])
    np.testing.assert_allclose(tree["norm_a"]["ln"]["bias"],
                               tree["norm"]["ln"]["bias"])


def test_pretrain_import_covers_tree():
    """A synthetic reference-named CAVMAE_BASE state_dict must import into the
    exact CAVMAEPretrain tree structure."""
    from flax import traverse_util
    model, fresh = _pretrain_params()

    def rand(*shape):
        return torch.randn(*shape)

    D, DD = VIT.dim, DEC.dim
    sd = {}

    def add_block(p, d):
        for n in ("norm1", "norm1_a", "norm1_v", "norm2", "norm2_a", "norm2_v"):
            sd[f"{p}.{n}.weight"] = rand(d)
            sd[f"{p}.{n}.bias"] = rand(d)
        sd[f"{p}.attn.qkv.weight"] = rand(3 * d, d)
        sd[f"{p}.attn.qkv.bias"] = rand(3 * d)
        sd[f"{p}.attn.proj.weight"] = rand(d, d)
        sd[f"{p}.attn.proj.bias"] = rand(d)
        sd[f"{p}.mlp.fc1.weight"] = rand(4 * d, d)
        sd[f"{p}.mlp.fc1.bias"] = rand(4 * d)
        sd[f"{p}.mlp.fc2.weight"] = rand(d, 4 * d)
        sd[f"{p}.mlp.fc2.bias"] = rand(d)

    for trunk in ("vit_base", "ast_base"):
        sd[f"{trunk}.patch_embed.proj.weight"] = rand(D, 3, 16, 16)
        sd[f"{trunk}.patch_embed.proj.bias"] = rand(D)
        sd[f"{trunk}.patch_embed_a.proj.weight"] = rand(D, 1, 16, 16)
        sd[f"{trunk}.patch_embed_a.proj.bias"] = rand(D)
        sd[f"{trunk}.pos_embed"] = rand(1, 1 + VIT.num_video_tokens, D)
        sd[f"{trunk}.pos_embed_a"] = rand(1, VIT.num_audio_tokens, D)
        sd[f"{trunk}.norm.weight"] = rand(D)
        sd[f"{trunk}.norm.bias"] = rand(D)
        sd[f"{trunk}.norm_a.weight"] = rand(D)
        sd[f"{trunk}.norm_a.bias"] = rand(D)
        for i in range(VIT.depth):
            add_block(f"{trunk}.blocks.{i}", D)
    add_block("mm_layer_1", D)
    add_block("mm_layer_2", D)
    sd["decoder_embed.weight"] = rand(DD, D)
    sd["decoder_embed.bias"] = rand(DD)
    sd["decoder_pos_embed_a"] = rand(1, VIT.num_audio_tokens, DD)
    sd["decoder_pos_embed_v"] = rand(1, VIT.num_video_tokens, DD)
    sd["mask_token"] = rand(1, 1, DD)
    sd["decoder_modality_a"] = rand(1, 1, DD)
    sd["decoder_modality_v"] = rand(1, 1, DD)
    sd["decoder_norm.weight"] = rand(DD)
    sd["decoder_norm.bias"] = rand(DD)
    sd["decoder_pred_a.weight"] = rand(256, DD)
    sd["decoder_pred_a.bias"] = rand(256)
    sd["decoder_pred_v.weight"] = rand(768, DD)
    sd["decoder_pred_v.bias"] = rand(768)
    for i in range(DEC.depth):
        add_block(f"decoder_blocks.{i}", DD)

    imported = import_cavmae_pretrain(sd, depth=VIT.depth,
                                      decoder_depth=DEC.depth)
    fi = traverse_util.flatten_dict(imported, sep="/")
    ff = traverse_util.flatten_dict(jax.device_get(fresh), sep="/")
    assert set(fi) == set(ff), (
        f"only_in_import={sorted(set(fi) - set(ff))[:5]} "
        f"only_in_fresh={sorted(set(ff) - set(fi))[:5]}")
    for k in ff:
        assert fi[k].shape == ff[k].shape, k


def test_transfer_pretrain_to_ft():
    _, pre = _pretrain_params()
    ft_model = CAVMAEFinetune(CAVMAEFTConfig(vit=VIT, label_dim=3))
    rng = jax.random.PRNGKey(1)
    a = jnp.zeros((1, VIT.audio_length, VIT.mel_bins))
    v = jnp.zeros((1, 1, 3, VIT.img_size, VIT.img_size))
    ft = jax.jit(lambda r, a, v: ft_model.init(r, a, v, "mm_grad", False))(
        rng, a, v)["params"]
    out = transfer_pretrain_to_ft(jax.device_get(pre), jax.device_get(ft))
    np.testing.assert_allclose(
        np.asarray(out["vit"]["pos_embed_a"]),
        np.asarray(pre["vit"]["pos_embed_a"]))
    # default = reference active path: mm layers come from the PRETRAIN
    # checkpoint (non-strict load; __create_fusion__ is commented out there)
    np.testing.assert_allclose(
        np.asarray(out["mm_layer_1"]["attn"]["qkv"]["kernel"]),
        np.asarray(pre["mm_layer_1"]["attn"]["qkv"]["kernel"]))
    # refresh_fusion=True = __create_fusion__: re-copy from blocks 10/11
    # (here depth-2/depth-1 of the tiny model)
    out2 = transfer_pretrain_to_ft(jax.device_get(pre), jax.device_get(ft),
                                   refresh_fusion=True)
    np.testing.assert_allclose(
        np.asarray(out2["mm_layer_1"]["attn"]["qkv"]["kernel"]),
        np.asarray(pre["vit"]["blocks_0"]["attn"]["qkv"]["kernel"]))
    np.testing.assert_allclose(
        np.asarray(out2["mm_layer_2"]["attn"]["qkv"]["kernel"]),
        np.asarray(pre["vit"]["blocks_1"]["attn"]["qkv"]["kernel"]))
    # heads keep fresh init
    np.testing.assert_allclose(
        np.asarray(out["mlp_head"]["linear"]["kernel"]),
        np.asarray(ft["mlp_head"]["linear"]["kernel"]))

"""Numerical parity against a PyTorch mirror of the reference semantics.

We build a small torch model implementing the documented reference math
(pre-LN block with 3 norm sets at eps 1e-5, exact-erf GELU, timm MHSA,
Conv2d patchify, pos-embed add + x2 doubling, final norm at eps 1e-6,
LN+Linear head) with reference state_dict naming, then import its weights
through utils/torch_import and check our flax forward matches to float32
tolerance. This validates in one shot: the importer's name/layout mapping,
LN epsilons, GELU exactness, attention math, and the patchify kernel layout.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

from avsiam_tpu.configs import CAVMAEFTConfig, ViTConfig
from avsiam_tpu.models import CAVMAEFinetune
from avsiam_tpu.utils.torch_import import import_cavmae_ft

DIM, HEADS, DEPTH = 32, 2, 2
VIT = ViTConfig(dim=DIM, depth=DEPTH, num_heads=HEADS, patch_size=16,
                img_size=64, audio_length=128, mel_bins=32)
N_CLASS = 5


class TAttention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.head_dim = dim // heads
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, self.head_dim)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.head_dim ** -0.5
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class TBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        for n in ("norm1", "norm1_a", "norm1_v", "norm2", "norm2_a", "norm2_v"):
            setattr(self, n, nn.LayerNorm(dim))  # torch default eps 1e-5
        self.attn = TAttention(dim, heads)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, dim * 4)
        self.mlp.fc2 = nn.Linear(dim * 4, dim)

    def _mlp(self, x):
        return self.mlp.fc2(F.gelu(self.mlp.fc1(x)))  # exact erf gelu

    def forward(self, x, modality=None):
        n1 = {None: self.norm1, "a": self.norm1_a, "v": self.norm1_v}[modality]
        n2 = {None: self.norm2, "a": self.norm2_a, "v": self.norm2_v}[modality]
        x = x + self.attn(n1(x))
        x = x + self._mlp(n2(x))
        return x


class TTrunk(nn.Module):
    """vit_base after surgery: both patch embeds, pos embeds, blocks, norms."""

    def __init__(self):
        super().__init__()
        self.patch_embed = nn.Sequential()
        self.patch_embed.proj = nn.Conv2d(3, DIM, 16, 16)
        self.patch_embed_a = nn.Sequential()
        self.patch_embed_a.proj = nn.Conv2d(1, DIM, 16, 16)
        nv = VIT.num_video_tokens
        na = VIT.num_audio_tokens
        self.pos_embed = nn.Parameter(torch.randn(1, nv + 1, DIM) * 0.02)
        self.pos_embed_a = nn.Parameter(torch.randn(1, na, DIM) * 0.02)
        self.blocks = nn.ModuleList([TBlock(DIM, HEADS) for _ in range(DEPTH)])
        self.norm = nn.LayerNorm(DIM, eps=1e-6)
        self.norm_a = nn.LayerNorm(DIM, eps=1e-6)


class TModel(nn.Module):
    def __init__(self):
        super().__init__()
        self.vit_base = TTrunk()
        self.mm_layer_1 = TBlock(DIM, HEADS)
        self.mm_layer_2 = TBlock(DIM, HEADS)
        for name in ("mlp_head", "mlp_head_a", "mlp_head_mm", "mlp_head_mm_v2"):
            d = DIM * 2 if name == "mlp_head_mm" else DIM
            setattr(self, name, nn.Sequential(nn.LayerNorm(d),
                                              nn.Linear(d, N_CLASS)))

    def forward_audioonly(self, a):
        a = a.unsqueeze(1).transpose(2, 3)
        a = self.vit_base.patch_embed_a.proj(a).flatten(2).transpose(1, 2)
        a = a + self.vit_base.pos_embed_a
        a = a + a  # norm_pre == Identity doubling quirk
        for blk in self.vit_base.blocks:
            a = blk(a, "a")
        a = self.vit_base.norm_a(a)
        return self.mlp_head_a(a.mean(dim=1))

    def forward_mm(self, a, v):
        a_in = a.unsqueeze(1).transpose(2, 3)
        a = self.vit_base.patch_embed_a.proj(a_in).flatten(2).transpose(1, 2)
        a = a + self.vit_base.pos_embed_a
        a = a + a
        for blk in self.vit_base.blocks:
            a = blk(a, "a")
        a = self.vit_base.norm_a(a)
        v = self.vit_base.patch_embed.proj(v).flatten(2).transpose(1, 2)
        v = v + self.vit_base.pos_embed[:, 1:]
        v = v + v
        for blk in self.vit_base.blocks:
            v = blk(v, "v")
        v = self.vit_base.norm(v)
        out_a = self.mlp_head_a(a.mean(dim=1))
        out_v = self.mlp_head(v.mean(dim=1))
        av = torch.cat((a, v), dim=1)
        av = self.mm_layer_1(av, "a")
        av = self.mm_layer_2(av, "a")
        na = a.shape[1]
        fused = torch.cat((av[:, :na].mean(1), av[:, na:].mean(1)), dim=-1)
        return self.mlp_head_mm(fused), out_a, out_v


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    tm = TModel().eval()
    cfg = CAVMAEFTConfig(vit=VIT, label_dim=N_CLASS)
    jm = CAVMAEFinetune(cfg)
    rng = jax.random.PRNGKey(0)
    a = jnp.zeros((2, VIT.audio_length, VIT.mel_bins))
    v = jnp.zeros((2, 1, 3, VIT.img_size, VIT.img_size))
    fresh = jax.jit(lambda r, a, v: jm.init(r, a, v, "mm_grad", False))(
        rng, a, v)["params"]
    params, missing, unused = import_cavmae_ft(
        tm.state_dict(), fresh, depth=DEPTH)
    assert not missing, f"missing params not covered by import: {missing}"
    assert not unused, f"unused torch keys: {unused}"
    return tm, jm, params


def test_audioonly_parity(models):
    tm, jm, params = models
    rng = np.random.RandomState(0)
    a = rng.randn(2, VIT.audio_length, VIT.mel_bins).astype(np.float32)
    with torch.no_grad():
        ref = tm.forward_audioonly(torch.from_numpy(a)).numpy()
    out = np.asarray(jm.apply({"params": params}, jnp.asarray(a), None,
                              "audioonly", False))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_mm_grad_parity(models):
    tm, jm, params = models
    rng = np.random.RandomState(1)
    a = rng.randn(2, VIT.audio_length, VIT.mel_bins).astype(np.float32)
    v = rng.randn(2, 3, VIT.img_size, VIT.img_size).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_a, ref_v = tm.forward_mm(torch.from_numpy(a),
                                              torch.from_numpy(v))
    out, out_a, out_v = jm.apply({"params": params}, jnp.asarray(a),
                                 jnp.asarray(v)[:, None], "mm_grad", False)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_a), ref_a.numpy(),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_v), ref_v.numpy(),
                               atol=3e-5, rtol=1e-4)


def test_reference_checkpoint_activations():
    """Auto-activating REAL-checkpoint parity: skips until someone runs
    `python scripts/gen_goldens.py activations --reference-src ... --ckpt
    ...` on a machine with timm + an AVSiam clone + a README-table .pth
    (README.md:57-62) and drops tests/fixtures/ref_activations.npz here.
    Loads the same .pth through OUR importer and compares per-mode logits."""
    import os
    fx = os.path.join(os.path.dirname(__file__), "fixtures",
                      "ref_activations.npz")
    if not os.path.exists(fx):
        pytest.skip("ref_activations.npz not present (scripts/gen_goldens.py)")
    data = np.load(fx)
    ckpt = data["meta_ckpt"].item().decode()
    if not os.path.exists(ckpt):
        pytest.skip(f"recorded checkpoint missing: {ckpt}")
    from avsiam_tpu.configs import CAVMAEFTConfig, ViTConfig
    from avsiam_tpu.utils.torch_import import load_torch_checkpoint

    label_dim = int(data["meta_label_dim"])
    cfg = CAVMAEFTConfig(vit=ViTConfig(), label_dim=label_dim)
    jm = CAVMAEFinetune(cfg)
    rng = jax.random.PRNGKey(0)
    a = jnp.asarray(data["audio"])
    v = jnp.asarray(data["video"])[:, None]
    fresh = jax.jit(lambda r, a, v: jm.init(r, a, v, "mm_grad", False))(
        rng, a[:1], v[:1])["params"]
    sd = load_torch_checkpoint(ckpt)
    params, missing, unused = import_cavmae_ft(sd, fresh, depth=12)
    for mode in ("audioonly", "videoonly", "mm_grad"):
        key = f"logits_{mode}"
        if key not in data:
            continue
        out = jm.apply({"params": params}, a, v, mode, True)
        out = out[0] if isinstance(out, (tuple, list)) else out
        if np.asarray(out).ndim == 3:  # [B, T, C] eval frames -> frame 0
            out = np.asarray(out)[:, 0]
        np.testing.assert_allclose(np.asarray(out), data[key],
                                   atol=1e-3, rtol=1e-3, err_msg=mode)

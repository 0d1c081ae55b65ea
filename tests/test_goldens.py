"""Golden-value regression guards: fixed-seed tiny-model outputs must stay
stable to 0.2% relative across refactors (TOL below; CPU f32 reduction-order
drift is far smaller, so any trip is a real numerics change — update the
constants only with an explanation of what changed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsiam_tpu.configs import (CAVMAEConfig, CAVMAEFTConfig, DecoderConfig,
                                ViTConfig)
from avsiam_tpu.models import CAVMAEFinetune, CAVMAEPretrain
from avsiam_tpu.ops.fbank import kaldi_fbank

TINY = ViTConfig(dim=32, depth=2, num_heads=2, patch_size=16, img_size=32,
                 audio_length=128, mel_bins=32)
DEC = DecoderConfig(dim=16, depth=1, num_heads=2)

# Recorded on CPU (f32, highest matmul precision), jax 0.9.0, round 1.
GOLDEN = {
    "pretrain_loss": 9.15990,
    "pretrain_loss_mae_a": 1.88034,
    "pretrain_loss_mae_v": 2.00493,
    "pretrain_loss_c": 5.27464,
    "ft_logit_sum": 5.97570,
    "fbank_sum": -23532.377,
}
TOL = 2e-3  # relative


def _rel_close(a, b):
    return abs(a - b) <= TOL * max(1.0, abs(b))


def test_pretrain_golden():
    model = CAVMAEPretrain(CAVMAEConfig(vit=TINY, decoder=DEC))
    rng = jax.random.PRNGKey(42)
    a = jax.random.normal(rng, (4, TINY.audio_length, TINY.mel_bins))
    v = jax.random.normal(jax.random.PRNGKey(43),
                          (4, 3, TINY.img_size, TINY.img_size))
    params = jax.jit(model.init)({"params": rng, "mask": rng, "perm": rng},
                                 a, v)
    out = model.apply(params, a, v, 0.25, 0.25, 1.0, 1.0,
                      rngs={"mask": jax.random.PRNGKey(1),
                            "perm": jax.random.PRNGKey(2)})
    got = {"pretrain_loss": float(out[0]),
           "pretrain_loss_mae_a": float(out[2]),
           "pretrain_loss_mae_v": float(out[3]),
           "pretrain_loss_c": float(out[4])}
    for k, v_ in got.items():
        assert _rel_close(v_, GOLDEN[k]), (k, v_, GOLDEN[k])


def test_finetune_golden():
    model = CAVMAEFinetune(CAVMAEFTConfig(vit=TINY, label_dim=5))
    rng = jax.random.PRNGKey(42)
    a = jax.random.normal(rng, (2, TINY.audio_length, TINY.mel_bins))
    v = jax.random.normal(jax.random.PRNGKey(43),
                          (2, 1, 3, TINY.img_size, TINY.img_size))
    params = jax.jit(lambda r, a, v: model.init(r, a, v, "mm_grad", False))(
        rng, a, v)
    out, out_a, out_v = model.apply(params, a, v, "mm_grad", False)
    s = float(jnp.sum(out) + jnp.sum(out_a) + jnp.sum(out_v))
    assert _rel_close(s, GOLDEN["ft_logit_sum"]), s


def test_fbank_golden():
    rng = np.random.RandomState(7)
    wav = (rng.randn(32000) * 0.1).astype(np.float32)
    fb = np.asarray(kaldi_fbank(jnp.asarray(wav)))
    assert _rel_close(float(fb.sum()), GOLDEN["fbank_sum"]), float(fb.sum())

"""The padded mmixed fast path must be mathematically equivalent to the
reference's gather-based variable-length encode: masked keys contribute
nothing to kept tokens' attention, and masked mean-pool equals pooling the
gathered subset."""

import jax
import jax.numpy as jnp
import numpy as np

from avsiam_tpu.configs import CAVMAEConfig, DecoderConfig, ViTConfig
from avsiam_tpu.models import CAVMAEPretrain
from avsiam_tpu.ops import masking as mk

TINY = ViTConfig(dim=32, depth=3, num_heads=2, patch_size=16, img_size=64,
                 audio_length=256, mel_bins=32)


def _setup():
    cfg = CAVMAEConfig(vit=TINY, decoder=DecoderConfig(dim=16, depth=1,
                                                       num_heads=2))
    model = CAVMAEPretrain(cfg)
    rng = jax.random.PRNGKey(0)
    a = jax.random.normal(rng, (4, TINY.audio_length, TINY.mel_bins))
    v = jax.random.normal(rng, (4, 3, TINY.img_size, TINY.img_size))
    params = model.init({"params": rng, "mask": rng, "perm": rng}, a, v)
    return cfg, model, params, a, v


def test_masked_encode_equals_gathered_encode():
    cfg, model, params, a, v = _setup()
    L = TINY.num_audio_tokens
    B = 4
    rng = jax.random.PRNGKey(7)
    keep = mk.keep_mask_unstructured(rng, B, L, len_keep=L // 2)

    def padded(params, a):
        def run(mdl):
            tok = mdl.vit.embed_audio(a)
            return mdl._encode_contrastive(tok, "a", keep)
        return model.apply(params, method=run)

    def exact(params, a):
        def run(mdl):
            tok = mdl.vit.embed_audio(a)
            outs = []
            for b in range(B):  # gather each sample's kept tokens
                ids = jnp.nonzero(keep[b], size=L // 2)[0]
                tb = tok[b:b + 1, ids]
                outs.append(mdl._encode_contrastive(tb, "a"))
            return jnp.concatenate(outs, axis=0)
        return model.apply(params, method=run)

    out_p = np.asarray(padded(params, a))
    out_e = np.asarray(exact(params, a))
    np.testing.assert_allclose(out_p, out_e, atol=2e-5, rtol=1e-4)


def test_padded_and_exact_mmixed_close_in_distribution():
    """Same RNG draws differ between impls, but the contrastive losses must
    be in the same range (both are valid multi-ratio InfoNCE estimates)."""
    losses = {}
    for impl in ("padded", "exact"):
        cfg = CAVMAEConfig(vit=TINY, mmixed_impl=impl,
                           decoder=DecoderConfig(dim=16, depth=1, num_heads=2))
        model = CAVMAEPretrain(cfg)
        rng = jax.random.PRNGKey(0)
        a = jax.random.normal(rng, (5, TINY.audio_length, TINY.mel_bins))
        v = jax.random.normal(rng, (5, 3, TINY.img_size, TINY.img_size))
        params = model.init({"params": rng, "mask": rng, "perm": rng}, a, v,
                            mae_loss_weight=0.0, contrast_loss_weight=1.0)
        out = model.apply(params, a, v, 0.25, 0.25, 0.0, 1.0,
                          rngs={"mask": jax.random.PRNGKey(1),
                                "perm": jax.random.PRNGKey(2)})
        losses[impl] = float(out[4])
    # temp 0.05 makes random-init NCE noisy; assert both are finite,
    # positive, and within an order of magnitude of each other
    for impl, loss in losses.items():
        assert np.isfinite(loss) and 0.0 < loss < 50.0, (impl, loss)
    ratio = losses["padded"] / losses["exact"]
    assert 0.1 < ratio < 10.0, losses


def test_keep_counts_per_ratio():
    """Padded mmixed must keep exactly int(L*(1-0.2i)) tokens per chunk-i
    sample — the reference's keep-set sizes (cav_mae_base.py:546-549)."""
    from avsiam_tpu.models.cavmae import chunk_sizes
    B, L = 10, 64
    rng = jax.random.PRNGKey(0)
    sizes = chunk_sizes(B, 5)
    assert sizes == [2, 2, 2, 2, 2]
    # torch.chunk edge: B=4 -> 4 chunks of 1
    assert chunk_sizes(4, 5) == [1, 1, 1, 1]
    assert chunk_sizes(7, 5) == [2, 2, 2, 1]
    ratios = [0.2 * i for i in range(5)]
    keeps = [mk.len_keep_for(L, r) for r in ratios]
    assert keeps == [64, 51, 38, 25, 12]

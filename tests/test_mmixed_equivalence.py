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


def test_mmixed_padded_equals_exact_full_forward():
    """Inject IDENTICAL keep masks + permutations into the padded and exact
    mmixed paths: the per-sample embeddings AND the resulting InfoNCE loss
    must agree to float tolerance. This is the end-to-end proof that the
    single batched masked encode is the reference's 5-chunk variable-length
    encode (cav_mae_base.py:533-594), not merely close in distribution."""
    from avsiam_tpu.models.cavmae import chunk_sizes
    from avsiam_tpu.ops.contrastive import info_nce_gathered

    cfg, model, params, a, v = _setup()
    B = 5
    rng = jax.random.PRNGKey(3)
    a = jax.random.normal(rng, (B, TINY.audio_length, TINY.mel_bins))
    v = jax.random.normal(jax.random.fold_in(rng, 1),
                          (B, 3, TINY.img_size, TINY.img_size))
    La, Lv = TINY.num_audio_tokens, TINY.num_video_tokens
    sizes = chunk_sizes(B, 5)
    ratios = [0.2 * i for i in range(len(sizes))]
    keeps_a = [mk.len_keep_for(La, r) for r in ratios]
    keeps_v = [mk.len_keep_for(Lv, r) for r in ratios]

    rs = np.random.RandomState(0)
    perm_a = np.asarray(rs.permutation(B))
    perm_v = np.asarray(rs.permutation(B))
    # chunk id of each SAMPLE (position along the permutation -> chunk)
    chunk_of_pos = np.repeat(np.arange(len(sizes)), sizes)
    chunk_a = np.zeros(B, np.int64)
    chunk_a[perm_a] = chunk_of_pos
    chunk_v = np.zeros(B, np.int64)
    chunk_v[perm_v] = chunk_of_pos

    def rand_keep(L, count):
        m = np.zeros(L, np.float32)
        m[rs.permutation(L)[:count]] = 1.0
        return m

    keep_a = jnp.asarray(np.stack([rand_keep(La, keeps_a[chunk_a[b]])
                                   for b in range(B)]))
    keep_v = jnp.asarray(np.stack([rand_keep(Lv, keeps_v[chunk_v[b]])
                                   for b in range(B)]))

    def padded(mdl):
        ca = mdl._encode_contrastive(mdl.vit.embed_audio(a), "a", keep_a)
        cv = mdl._encode_contrastive(mdl.vit.embed_video(v), "v", keep_v)
        return ca, cv

    def exact(mdl):
        ta, tv = mdl.vit.embed_audio(a), mdl.vit.embed_video(v)
        a_parts, v_parts, off = [], [], 0
        for i, size in enumerate(sizes):
            rows_a = [ta[int(perm_a[off + j]),
                         jnp.nonzero(keep_a[int(perm_a[off + j])],
                                     size=keeps_a[i])[0]]
                      for j in range(size)]
            rows_v = [tv[int(perm_v[off + j]),
                         jnp.nonzero(keep_v[int(perm_v[off + j])],
                                     size=keeps_v[i])[0]]
                      for j in range(size)]
            a_parts.append(mdl._encode_contrastive(jnp.stack(rows_a), "a"))
            v_parts.append(mdl._encode_contrastive(jnp.stack(rows_v), "v"))
            off += size
        ca = jnp.concatenate(a_parts, axis=0)[jnp.argsort(jnp.asarray(perm_a))]
        cv = jnp.concatenate(v_parts, axis=0)[jnp.argsort(jnp.asarray(perm_v))]
        return ca, cv

    ca_p, cv_p = model.apply(params, method=padded)
    ca_e, cv_e = model.apply(params, method=exact)
    np.testing.assert_allclose(np.asarray(ca_p), np.asarray(ca_e),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cv_p), np.asarray(cv_e),
                               atol=2e-5, rtol=1e-4)
    loss_p, acc_p = info_nce_gathered(ca_p.mean(axis=1), cv_p.mean(axis=1),
                                      temperature=0.05, bidirect=True)
    loss_e, acc_e = info_nce_gathered(ca_e.mean(axis=1), cv_e.mean(axis=1),
                                      temperature=0.05, bidirect=True)
    np.testing.assert_allclose(float(loss_p), float(loss_e), rtol=1e-5)
    np.testing.assert_allclose(float(acc_p), float(acc_e))


def test_mmixed_packed_matches_exact_same_rng():
    """The packed impl (one token-packed GEMM set per block, per-chunk
    attention) consumes the SAME RNG draws as the exact chunked impl, so the
    two must produce identical embeddings on identical inputs."""
    from avsiam_tpu.configs import replace
    from avsiam_tpu.models.cavmae import CAVMAEPretrain as M

    cfg = CAVMAEConfig(vit=TINY, mmixed_impl="exact",
                       decoder=DecoderConfig(dim=16, depth=1, num_heads=2))
    model_e = CAVMAEPretrain(cfg)
    model_p = CAVMAEPretrain(replace(cfg, mmixed_impl="packed"))
    rng = jax.random.PRNGKey(0)
    for B in (5, 4, 7):  # even chunks, fewer-than-5 chunks, ragged chunks
        a = jax.random.normal(jax.random.fold_in(rng, B),
                              (B, TINY.audio_length, TINY.mel_bins))
        v = jax.random.normal(jax.random.fold_in(rng, B + 100),
                              (B, 3, TINY.img_size, TINY.img_size))
        params = model_e.init({"params": rng, "mask": rng, "perm": rng}, a, v,
                              mae_loss_weight=0.0, contrast_loss_weight=1.0)
        rngs = {"mask": jax.random.PRNGKey(1), "perm": jax.random.PRNGKey(2)}
        ca_e, cv_e = model_e.apply(params, a, v,
                                   method=M.forward_encoder_mmixed, rngs=rngs)
        ca_p, cv_p = model_p.apply(params, a, v,
                                   method=M.forward_encoder_mmixed, rngs=rngs)
        np.testing.assert_allclose(np.asarray(ca_p), np.asarray(ca_e),
                                   atol=2e-5, rtol=1e-4, err_msg=f"B={B}")
        np.testing.assert_allclose(np.asarray(cv_p), np.asarray(cv_e),
                                   atol=2e-5, rtol=1e-4, err_msg=f"B={B}")


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


def test_tconcat_matches_exact_same_rng():
    """The tconcat impl (one [T, C] row-concat stream per modality, per-chunk
    attention on contiguous views) consumes the SAME RNG draws as exact and
    its per-row math is the same GEMMs/LN/GELU, so embeddings must match on
    identical inputs — including ragged and fewer-than-5-chunk batches."""
    from avsiam_tpu.configs import replace
    from avsiam_tpu.models.cavmae import CAVMAEPretrain as M

    cfg = CAVMAEConfig(vit=TINY, mmixed_impl="exact",
                       decoder=DecoderConfig(dim=16, depth=1, num_heads=2))
    model_e = CAVMAEPretrain(cfg)
    model_t = CAVMAEPretrain(replace(cfg, mmixed_impl="tconcat"))
    rng = jax.random.PRNGKey(0)
    for B in (5, 4, 7):  # even chunks, fewer-than-5 chunks, ragged chunks
        a = jax.random.normal(jax.random.fold_in(rng, B),
                              (B, TINY.audio_length, TINY.mel_bins))
        v = jax.random.normal(jax.random.fold_in(rng, B + 100),
                              (B, 3, TINY.img_size, TINY.img_size))
        params = model_e.init({"params": rng, "mask": rng, "perm": rng}, a, v,
                              mae_loss_weight=0.0, contrast_loss_weight=1.0)
        rngs = {"mask": jax.random.PRNGKey(1), "perm": jax.random.PRNGKey(2)}
        ca_e, cv_e = model_e.apply(params, a, v,
                                   method=M.forward_encoder_mmixed, rngs=rngs)
        ca_t, cv_t = model_t.apply(params, a, v,
                                   method=M.forward_encoder_mmixed, rngs=rngs)
        np.testing.assert_allclose(np.asarray(ca_t), np.asarray(ca_e),
                                   atol=2e-5, rtol=1e-4, err_msg=f"B={B}")
        np.testing.assert_allclose(np.asarray(cv_t), np.asarray(cv_e),
                                   atol=2e-5, rtol=1e-4, err_msg=f"B={B}")


def test_tconcat_gradients_match_exact():
    """tconcat must also BACKPROPAGATE identically to exact: the weight
    gradients of the contrastive loss agree even though tconcat computes each
    one as a single long-row GEMM instead of 5 accumulated per-chunk
    partials (same math, different contraction grouping)."""
    from avsiam_tpu.configs import replace
    from avsiam_tpu.models.cavmae import CAVMAEPretrain as M

    cfg = CAVMAEConfig(vit=TINY, mmixed_impl="exact",
                       decoder=DecoderConfig(dim=16, depth=1, num_heads=2))
    model_e = CAVMAEPretrain(cfg)
    model_t = CAVMAEPretrain(replace(cfg, mmixed_impl="tconcat"))
    rng = jax.random.PRNGKey(3)
    B = 5
    a = jax.random.normal(rng, (B, TINY.audio_length, TINY.mel_bins))
    v = jax.random.normal(jax.random.fold_in(rng, 1),
                          (B, 3, TINY.img_size, TINY.img_size))
    params = model_e.init({"params": rng, "mask": rng, "perm": rng}, a, v,
                          mae_loss_weight=0.0, contrast_loss_weight=1.0)
    rngs = {"mask": jax.random.PRNGKey(1), "perm": jax.random.PRNGKey(2)}

    def loss(mdl, p):
        def fwd(m):
            ca, cv = m.forward_encoder_mmixed(a, v)
            return jnp.sum(ca * cv)  # couples every chunk's embeddings
        return mdl.apply(p, method=fwd, rngs=dict(rngs))

    ge = jax.grad(lambda p: loss(model_e, p))(params)
    gt = jax.grad(lambda p: loss(model_t, p))(params)
    flat_e = jax.tree_util.tree_leaves_with_path(ge)
    flat_t = {jax.tree_util.keystr(k): x
              for k, x in jax.tree_util.tree_leaves_with_path(gt)}
    for k, xe in flat_e:
        xt = flat_t[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(np.asarray(xt), np.asarray(xe),
                                   atol=3e-5, rtol=2e-4,
                                   err_msg=jax.tree_util.keystr(k))


def test_bucketed_equals_exact():
    """The 'bucketed' impl (lane-aligned gathers + masked tails) must produce
    the same contrastive embeddings as 'exact' under the same RNG: identical
    chunk gathers and keep-set draws, inert pad rows."""
    from avsiam_tpu.configs import replace as cfg_replace
    cfg, model, params, a, v = _setup()
    rngs = {"mask": jax.random.PRNGKey(7), "perm": jax.random.PRNGKey(9)}

    def run(impl):
        m = CAVMAEPretrain(cfg_replace(cfg, mmixed_impl=impl))

        def fwd(mdl):
            return mdl.forward_encoder_mmixed(a, v)

        return m.apply(params, method=fwd, rngs=dict(rngs))

    ca_e, cv_e = run("exact")
    ca_b, cv_b = run("bucketed")
    np.testing.assert_allclose(np.asarray(ca_b), np.asarray(ca_e),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cv_b), np.asarray(cv_e),
                               atol=1e-5, rtol=1e-5)

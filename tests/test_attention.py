"""Pallas fused attention vs XLA reference: forward + gradients, with and
without key-validity masks (CPU interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsiam_tpu.ops.attention import pallas_attention, xla_attention


def _qkv(rng, B=2, N=200, H=3, D=64):
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (B, N, H, D))
    k = jax.random.normal(k2, (B, N, H, D))
    v = jax.random.normal(k3, (B, N, H, D))
    return q, k, v


@pytest.mark.parametrize("N", [128, 196, 200, 512])
def test_forward_matches_xla(N):
    q, k, v = _qkv(jax.random.PRNGKey(0), N=N)
    out_p = pallas_attention(q, k, v)
    out_x = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=1e-5, rtol=1e-5)


def test_forward_with_mask_matches_xla():
    rng, km = jax.random.split(jax.random.PRNGKey(1))
    q, k, v = _qkv(rng, N=196)
    # fresh key for the mask: reusing the qkv key would correlate the mask
    # with the values, testing one correlated point instead of independent
    valid = jax.random.uniform(km, (2, 196)) > 0.4
    out_p = pallas_attention(q, k, v, key_valid=valid)
    out_x = xla_attention(q, k, v, key_valid=valid)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=1e-5, rtol=1e-5)


def test_masked_attention_equals_dropped_tokens():
    """Masked keys must be exactly equivalent to physically removing those
    tokens (the basis of the padded mmixed encoder)."""
    rng = jax.random.PRNGKey(2)
    B, N, H, D = 1, 64, 2, 32
    q, k, v = _qkv(rng, B=B, N=N, H=H, D=D)
    keep = np.zeros(N, bool)
    keep[:40] = True  # keep a contiguous prefix for easy slicing
    valid = jnp.asarray(keep)[None, :]
    out_masked = xla_attention(q, k, v, key_valid=valid)
    out_dropped = xla_attention(q[:, :40], k[:, :40], v[:, :40])
    np.testing.assert_allclose(np.asarray(out_masked[:, :40]),
                               np.asarray(out_dropped), atol=1e-5, rtol=1e-5)
    out_masked_p = pallas_attention(q, k, v, key_valid=valid)
    np.testing.assert_allclose(np.asarray(out_masked_p[:, :40]),
                               np.asarray(out_dropped), atol=1e-5, rtol=1e-5)


def test_gradients_match_xla():
    q, k, v = _qkv(jax.random.PRNGKey(3), B=1, N=130, H=2, D=64)
    valid = jax.random.uniform(jax.random.PRNGKey(4), (1, 130)) > 0.3

    def loss_p(q, k, v):
        return jnp.sum(pallas_attention(q, k, v, key_valid=valid) ** 2)

    def loss_x(q, k, v):
        return jnp.sum(xla_attention(q, k, v, key_valid=valid) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4, err_msg=name)


def test_bf16_forward_close():
    q, k, v = _qkv(jax.random.PRNGKey(5), N=196)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out_p = pallas_attention(qb, kb, vb).astype(jnp.float32)
    out_x = xla_attention(q, k, v)
    assert jnp.max(jnp.abs(out_p - out_x)) < 0.05


def test_token_major_qkv_matches_separate():
    """attention_qkv (token-major layout-native kernel: lane-masked
    full-width dots over the raw [B, N, 3C] projection) must match the
    head-major path in forward and gradients — unmasked, masked, and
    sublane-padded rows (N=130 -> 144 for f32? 130 -> pad by sublane), and
    the MAE-decoder head shape D=32 (4 sub-heads per lane slab)."""
    from avsiam_tpu.ops.attention import attention_qkv

    for N, H, D, masked in ((128, 2, 64, False), (130, 2, 64, False),
                            (130, 2, 64, True), (128, 4, 32, False),
                            (120, 4, 32, True)):
        rng = jax.random.PRNGKey(N + H)
        C = H * D
        xqkv = jax.random.normal(rng, (2, N, 3 * C))
        qkv5 = xqkv.reshape(2, N, 3, H, D)
        valid = (jax.random.uniform(rng, (2, N)) > 0.3) if masked else None

        def loss_packed(xqkv):
            return jnp.sum(attention_qkv(xqkv, H, key_valid=valid,
                                         impl="pallas") ** 2)

        def loss_sep(xqkv):
            q5 = xqkv.reshape(2, N, 3, H, D)
            return jnp.sum(pallas_attention(q5[:, :, 0], q5[:, :, 1],
                                            q5[:, :, 2],
                                            key_valid=valid) ** 2)

        out_p = attention_qkv(xqkv, H, key_valid=valid, impl="pallas")
        out_s = pallas_attention(qkv5[:, :, 0], qkv5[:, :, 1], qkv5[:, :, 2],
                                 key_valid=valid)
        np.testing.assert_allclose(np.asarray(out_p),
                                   np.asarray(out_s.reshape(2, N, C)),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"N={N} D={D} masked={masked}")
        gp = jax.grad(loss_packed)(xqkv)
        gs = jax.grad(loss_sep)(xqkv)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gs),
                                   atol=1e-4, rtol=1e-4,
                                   err_msg=f"N={N} D={D} masked={masked}")


def test_sample_packed_matches_sp1():
    """sp>1 (samples-per-program packing for small N) must be bit-identical
    to sp=1 in forward and match in gradients — the per-sample loop computes
    the same dots in the same order, only grouped into fewer programs."""
    import importlib

    from avsiam_tpu.ops.attention import (_samples_per_program,
                                          pallas_attention_qkv)

    # NOTE: `from avsiam_tpu.ops import attention` binds the re-exported
    # *function*, not the module — go through importlib for the module.
    attn_mod = importlib.import_module("avsiam_tpu.ops.attention")

    # sp selection depends on the row cap (AVSIAM_SP_ROWS); pin it so the
    # assertions are stable against default changes (8192 since the round-3
    # sweep, BENCH_NOTES.md).
    cap0 = attn_mod._SP_ROW_CAP
    try:
        attn_mod._SP_ROW_CAP = 2048
        assert _samples_per_program(64, 192) == 8   # divisor, zero padding
        assert _samples_per_program(13, 144) == 13  # whole batch, 1 program
        assert _samples_per_program(13, 160) == 7   # prime B: pad 13 -> 14
        assert _samples_per_program(64, 720) == 1   # long seqs: unpacked
        attn_mod._SP_ROW_CAP = 8192
        assert _samples_per_program(64, 192) == 32  # bigger cap, bigger sp
        assert _samples_per_program(13, 160) == 13  # whole batch now fits
        assert _samples_per_program(64, 720) == 1   # long seqs: still 1
        # AVSIAM_SP_MAXNP raises the packing-eligible Np (decoder A/B knob)
        np0 = attn_mod._SP_MAX_NP
        try:
            attn_mod._SP_MAX_NP = 1024
            # cap fits 11 samples (8192 // 720) but the divisor rule picks
            # 8 (zero batch padding, within 2x of the cap)
            assert _samples_per_program(64, 720) == 8
            assert _samples_per_program(64, 512) == 16
        finally:
            attn_mod._SP_MAX_NP = np0
        assert _samples_per_program(64, 720) == 1   # default restored
    finally:
        attn_mod._SP_ROW_CAP = cap0
    rng = jax.random.PRNGKey(9)
    B, N, H, D = 8, 177, 2, 64
    C = H * D
    xqkv = jax.random.normal(rng, (B, N, 3 * C))
    valid = jax.random.uniform(rng, (B, N)) > 0.3
    for masked in (False, True):
        kv = valid if masked else None
        ref = pallas_attention_qkv(xqkv, H, key_valid=kv, sp=1)
        for sp in (2, 4, 8, 3, 5):  # 3, 5: non-divisor -> batch padding
            got = pallas_attention_qkv(xqkv, H, key_valid=kv, sp=sp)
            np.testing.assert_array_equal(
                np.asarray(got), np.asarray(ref),
                err_msg=f"sp={sp} masked={masked}")

        def loss(xqkv, sp):
            return jnp.sum(pallas_attention_qkv(xqkv, H, key_valid=kv,
                                                sp=sp) ** 2)

        g1 = jax.grad(loss)(xqkv, 1)
        for sp in (8, 5):  # divisor and batch-padded
            gs = jax.grad(loss)(xqkv, sp)
            np.testing.assert_allclose(np.asarray(gs), np.asarray(g1),
                                       atol=1e-4, rtol=1e-4,
                                       err_msg=f"grad sp={sp} "
                                               f"masked={masked}")
            assert np.isfinite(np.asarray(gs)).all()


def test_token_major_saved_stats_match_recompute():
    """The backward with forward-saved softmax stats (m, 1/denom) must
    produce the same gradients as the recompute-everything backward — the
    stats only skip the rowmax/rowsum reduce passes, not any math.

    sp is pinned to 1: stats saving only engages on unpacked programs (the
    production sp=1 shapes are the decoder's 720 and full audio's 512), and
    auto-sp would pick sp=2 at these test shapes, silently disabling the
    stats path and comparing the recompute backward against itself."""
    import importlib
    att = importlib.import_module("avsiam_tpu.ops.attention")

    for N, H, D, masked in ((130, 2, 64, False), (120, 4, 32, True)):
        rng = jax.random.PRNGKey(N)
        C = H * D
        xqkv = jax.random.normal(rng, (2, N, 3 * C))
        valid = (jax.random.uniform(rng, (2, N)) > 0.3) if masked else None

        def loss(xqkv):
            return jnp.sum(att.pallas_attention_qkv(
                xqkv, H, key_valid=valid, sp=1) ** 2)

        saved = att._STATS_MIN_NP
        try:
            att._STATS_MIN_NP = 1
            # guard against a vacuous self-comparison: the stats path must
            # actually engage at this (sp=1, D>=32) configuration
            _, (_, _, stats) = att._pallas_attention_tm_fwd(
                jnp.asarray(xqkv, jnp.float32), None, H, 1)
            assert stats is not None, "stats path did not engage"
            g_stats = jax.grad(loss)(xqkv)
            att._STATS_MIN_NP = 0
            g_rec = jax.grad(loss)(xqkv)
        finally:
            att._STATS_MIN_NP = saved
        np.testing.assert_allclose(np.asarray(g_stats), np.asarray(g_rec),
                                   atol=1e-6, rtol=1e-6,
                                   err_msg=f"N={N} D={D} masked={masked}")

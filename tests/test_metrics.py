"""Metric parity tests against hand-computed values."""

import numpy as np

from avsiam_tpu.eval import (AverageMeter, calculate_stats, compute_metrics,
                             d_prime, mean_ap, retrieval_metrics,
                             similarity_matrix)


def test_calculate_stats_perfect_predictions():
    target = np.eye(4).repeat(3, axis=0)  # 12 samples, 4 classes
    output = target * 0.9 + 0.05
    stats = calculate_stats(output, target)
    assert len(stats) == 4
    assert all(abs(s["AP"] - 1.0) < 1e-9 for s in stats)
    assert all(abs(s["auc"] - 1.0) < 1e-9 for s in stats)
    assert stats[0]["acc"] == 1.0


def test_calculate_stats_no_positive_class():
    target = np.zeros((6, 2))
    target[:, 0] = [1, 0, 1, 0, 1, 0]
    output = np.random.RandomState(0).rand(6, 2)
    stats = calculate_stats(output, target)
    # class 1 has no positives -> auc fallback path (-1)
    assert stats[1]["auc"] == -1


def test_d_prime():
    assert abs(d_prime(0.5)) < 1e-12
    assert d_prime(0.9) > 0


def test_retrieval_metrics_identity():
    feats = np.random.RandomState(0).randn(20, 8)
    m = retrieval_metrics(feats, feats, "audio")
    assert m["R1"] == 1.0 and m["R5"] == 1.0 and m["MR"] == 1.0
    # shifted pairing: diagonal no longer best
    m2 = retrieval_metrics(feats, np.roll(feats, 1, axis=0), "audio")
    assert m2["R1"] < 1.0


def test_compute_metrics_known_ranks():
    # similarity where diagonal is 2nd best in every row
    B = 10
    sim = np.zeros((B, B))
    rng = np.random.RandomState(1)
    for i in range(B):
        sim[i, i] = 0.8
        sim[i, (i + 1) % B] = 0.9  # best is off-diagonal
    m = compute_metrics(sim)
    assert m["R1"] == 0.0
    assert m["R5"] == 1.0
    assert m["MR"] == 2.0


def test_similarity_matrix_is_cosine():
    a = np.array([[1.0, 0.0], [0.0, 2.0]])
    b = np.array([[2.0, 0.0], [0.0, 1.0]])
    s = similarity_matrix(a, b)
    np.testing.assert_allclose(s, [[1, 0], [0, 1]], atol=1e-12)


def test_average_meter():
    m = AverageMeter()
    m.update(2.0, n=2)
    m.update(4.0)
    assert m.val == 4.0
    assert abs(m.avg - 8.0 / 3) < 1e-12

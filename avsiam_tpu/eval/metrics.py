"""Classification metrics: mAP / AUC / d-prime.

Parity: src/utilities/stats.py (sklearn per-class AP, ROC-AUC, PR curves,
d_prime via the inverse normal CDF) and src/utilities/util.py:238
(AverageMeter). These run host-side on gathered predictions, exactly like the
reference's post-``distributed_concat`` evaluation
(traintest_ft_base.py:292-352).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
from scipy import stats as _scipy_stats
from sklearn import metrics as _sk


def d_prime(auc: float) -> float:
    """Parity: src/utilities/stats.py:6-9."""
    return _scipy_stats.norm().ppf(auc) * np.sqrt(2.0)


def calculate_stats(output: np.ndarray, target: np.ndarray,
                    sample_curves_every: int = 1000) -> List[Dict]:
    """Per-class statistics. Parity: src/utilities/stats.py:11-69.

    output/target: [num_samples, num_classes]. Returns a list of per-class
    dicts with AP, auc, sampled precision/recall/fpr/fnr curves, and the
    (global, not class-wise) argmax accuracy replicated per class.
    """
    classes_num = target.shape[-1]
    acc = _sk.accuracy_score(np.argmax(target, 1), np.argmax(output, 1))
    out = []
    for k in range(classes_num):
        avg_precision = _sk.average_precision_score(
            target[:, k], output[:, k], average=None)
        try:
            auc = _sk.roc_auc_score(target[:, k], output[:, k], average=None)
            if np.isnan(auc):
                # modern sklearn returns nan for single-class targets where
                # the reference's sklearn raised; same fallback either way
                raise ValueError("undefined AUC (single-class target)")
            precisions, recalls, _ = _sk.precision_recall_curve(
                target[:, k], output[:, k])
            fpr, tpr, _ = _sk.roc_curve(target[:, k], output[:, k])
            s = sample_curves_every
            d = {"precisions": precisions[0::s], "recalls": recalls[0::s],
                 "AP": avg_precision, "fpr": fpr[0::s],
                 "fnr": 1.0 - tpr[0::s], "auc": auc, "acc": acc}
        except ValueError:
            d = {"precisions": -1, "recalls": -1, "AP": avg_precision,
                 "fpr": -1, "fnr": -1, "auc": -1, "acc": acc}
        out.append(d)
    return out


def mean_ap(stats: List[Dict]) -> float:
    return float(np.mean([s["AP"] for s in stats]))


def mean_auc(stats: List[Dict]) -> float:
    return float(np.mean([s["auc"] for s in stats]))


class AverageMeter:
    """Parity: src/utilities/util.py AverageMeter (val/avg/sum/count)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count

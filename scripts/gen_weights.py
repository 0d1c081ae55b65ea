"""Generate per-sample balance weights for class-balanced finetuning.

The reference's AS-2M recipe feeds a precomputed weights CSV to a
WeightedRandomSampler (run_cavmae_ft_base.py:184-200 + yb_sampler.py); the
generator itself is not in the reference tree. Standard AudioSet practice
(and the CAV-MAE lineage): a sample's weight is the sum of its labels'
inverse frequencies, so rare-class clips are drawn more often.

Usage:
  python scripts/gen_weights.py INDEX LABEL_CSV OUT_CSV
"""

import sys


def compute_weights(index_path: str, label_csv: str):
    import numpy as np

    from avsiam_tpu.data.indices import make_index_dict, open_index
    idx = open_index(index_path)
    label_map = make_index_dict(label_csv)
    n_class = len(label_map)
    counts = np.zeros(n_class, dtype=np.int64)
    sample_labels = []
    for i in range(len(idx)):
        rec = idx[i]
        ids = [label_map[m] for m in rec.labels.split(",") if m in label_map]
        sample_labels.append(ids)
        for k in ids:
            counts[k] += 1
    inv = 1.0 / np.maximum(counts, 1)
    weights = np.array([sum(inv[k] for k in ids) if ids else inv.min()
                        for ids in sample_labels])
    return weights


def main():
    index_path, label_csv, out_csv = sys.argv[1:4]
    import numpy as np
    w = compute_weights(index_path, label_csv)
    np.savetxt(out_csv, w, delimiter=",")
    print(f"wrote {len(w)} weights to {out_csv} "
          f"(min {w.min():.3g} max {w.max():.3g})")


if __name__ == "__main__":
    main()

#!/bin/bash
# Long-horizon on-chip training soak (round 4): multi-hundred-step fresh-data
# pretrain through the REAL cli.pretrain runner (orbax checkpoints,
# result.csv, metrics.jsonl), split across two invocations so the second
# exercises --resume mid-run, followed by a retrieval-proxy eval from the
# final checkpoint.
#
# Synthetic clips are deterministic per path (data/dataset.py:_stable_hash),
# audio and video independent per clip -> the learnable signal is PAIR
# MEMORIZATION: over repeated epochs the contrastive head must push loss_c
# below the ln(B) uniform plateau on TRAIN clips, and train-clip retrieval
# R@K must beat chance, while held-out clips stay at chance (random pairs
# carry no mutual information -- documented, expected).
#
# Usage: EXP=/root/soak_r04 bash scripts/soak_long.sh
# Reference evidence target: the loss curves of a real pretrain run
# (traintest_cavmae_base.py:192-252); artifact committed under
# docs/artifacts/soak_r04/.
set -e
EXP=${EXP:-/root/soak_r04}
N=${N:-4800}        # train clips -> N/B steps/epoch
NVAL=${NVAL:-128}   # held-out clips for eval_loss
B=${B:-32}
EPOCHS1=${EPOCHS1:-2}
EPOCHS2=${EPOCHS2:-4}
export AVSIAM_SMALLN=${AVSIAM_SMALLN:-pallas}
export AVSIAM_SP_ROWS=${AVSIAM_SP_ROWS:-8192}
export PYTHONPATH="$PYTHONPATH:$(dirname "$0")/.."
mkdir -p "$EXP"

python - "$EXP" "$N" "$NVAL" <<'EOF'
import json, sys
exp, n, nval = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
def idx(path, lo, hi):
    json.dump({"data": [{"wav": f"/synth/clip{i:06d}.wav",
                         "labels": f"/m/{i % 8}"} for i in range(lo, hi)]},
              open(path, "w"))
idx(f"{exp}/train.json", 0, n)
idx(f"{exp}/val.json", n, n + nval)          # held out
idx(f"{exp}/ret_train.json", 0, nval)        # retrieval proxy on TRAIN clips
with open(f"{exp}/labels.csv", "w") as f:
    f.write("index,mid,display_name\n")
    for i in range(8):
        f.write(f"{i},/m/{i},c{i}\n")
EOF

COMMON=(--data-train "$EXP/train.json" --data-val "$EXP/val.json"
        --label-csv "$EXP/labels.csv" --n_class 8
        --frame_source synthetic --batch-size "$B" --lr 2e-4
        --n-print-steps 25 --exp-dir "$EXP/exp")

echo "== phase 1: epochs 1..$EPOCHS1 =="
python -m avsiam_tpu.cli.pretrain "${COMMON[@]}" --n-epochs "$EPOCHS1"

echo "== phase 2: --resume, epochs $((EPOCHS1+1))..$EPOCHS2 =="
python -m avsiam_tpu.cli.pretrain "${COMMON[@]}" --n-epochs "$EPOCHS2" --resume

echo "== retrieval proxy from the final checkpoint =="
python -m avsiam_tpu.cli.retrieval \
  --data-eval "$EXP/ret_train.json" --label-csv "$EXP/labels.csv" \
  --n_class 8 --frame_source synthetic --batch-size "$B" \
  --pretrain_path "$EXP/exp/models/audio_model.$EPOCHS2" \
  --exp-dir "$EXP/ret" --frame_use 5
echo "soak_long OK: $EXP"

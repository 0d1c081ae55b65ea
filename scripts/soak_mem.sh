#!/bin/bash
# Soak leg 2 (round 4): contrastive pair-memorization through the REAL
# cli.pretrain runner on the real chip. Companion to scripts/soak_long.sh
# (leg 1, fresh-data scale); see docs/artifacts/soak_r04/README.md.
#
# 64 synthetic clips x 96 epochs at B=32 -> 192 steps, 96 sights/clip —
# past the ~40-sight threshold at which the round-2 repeated-batch probe
# memorized pairs through this same two-pass step. Constant lr
# (--lrscheduler_start 1000: the MultiStepLR decay never fires inside the
# run; a decaying lr stalls memorization — see the README). --data-val is
# the TRAIN set itself: eval_loss_c dropping below ln(32) IS the
# memorization evidence, and makes best_audio_model track it (random
# held-out pairs carry no signal for this leg — leg 1 covers held-out
# generalization of the MAE losses). --val_interval 8: at 2 steps/epoch
# the per-epoch eval + the best_audio_model save it triggers (~800 MB
# D2H through the tunnel, 45-100 s measured) would dominate wall-clock;
# the per-epoch train loss_c in metrics.jsonl is the primary curve.
# --frame_use 5 pins the training frame: with the reference's
# random-of-10 frame draw each clip presents 10 distinct noise frames,
# multiplying the pair-memorization load ~10x — measured: 96 random-frame
# sights stay at the ln(32) plateau (docs/artifacts/soak_r04).
#
# Usage: EXP=/root/soak_mem bash scripts/soak_mem.sh
# Reference evidence target: traintest_cavmae_base.py:192-252 loss curves.
set -e
EXP=${EXP:-/root/soak_mem}
N=${N:-64}            # train clips; B=32 -> 2 steps/epoch
B=${B:-32}
EPOCHS=${EPOCHS:-96}  # 96 sights/clip
export AVSIAM_SMALLN=${AVSIAM_SMALLN:-pallas}
export AVSIAM_SP_ROWS=${AVSIAM_SP_ROWS:-8192}
export PYTHONPATH="$PYTHONPATH:$(dirname "$0")/.."
mkdir -p "$EXP"

python - "$EXP" "$N" <<'EOF'
import json, sys
exp, n = sys.argv[1], int(sys.argv[2])
def idx(path, lo, hi):
    json.dump({"data": [{"wav": f"/synth/clip{i:06d}.wav",
                         "labels": f"/m/{i % 8}"} for i in range(lo, hi)]},
              open(path, "w"))
idx(f"{exp}/train.json", 0, n)
idx(f"{exp}/ret_train.json", 0, 32)          # retrieval gallery: train clips
with open(f"{exp}/labels.csv", "w") as f:
    f.write("index,mid,display_name\n")
    for i in range(8):
        f.write(f"{i},/m/{i},c{i}\n")
EOF

echo "== leg 2: $EPOCHS epochs x $((N / B)) steps on $N train clips =="
python -m avsiam_tpu.cli.pretrain \
  --data-train "$EXP/train.json" --data-val "$EXP/train.json" \
  --label-csv "$EXP/labels.csv" --n_class 8 \
  --frame_source synthetic --batch-size "$B" --lr 2e-4 \
  --lrscheduler_start 1000 \
  --n-print-steps 8 --n-epochs "$EPOCHS" --exp-dir "$EXP/exp" \
  --save_model False --train_state_every 48 --keep_train_states 1 \
  --val_interval 8 --frame_use 5

echo "== retrieval proxy on the 32-clip train gallery (best_audio_model) =="
python -m avsiam_tpu.cli.retrieval \
  --data-eval "$EXP/ret_train.json" --label-csv "$EXP/labels.csv" \
  --n_class 8 --frame_source synthetic --batch-size "$B" \
  --pretrain_path "$EXP/exp/models/best_audio_model" \
  --exp-dir "$EXP/ret" --frame_use 5
echo "soak_mem OK: $EXP"

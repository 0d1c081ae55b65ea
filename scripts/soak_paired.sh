#!/bin/bash
# Soak leg 3 (round 4): contrastive GENERALIZATION through the real
# cli.pretrain runner on the real chip, on 'synthetic_paired' data (audio
# tone-bank amplitudes == frame band intensities, per-clip latent;
# data/dataset.py). Unlike legs 1-2's independent-noise clips — where the
# contrastive head provably collapses to the uniform ln(B) solution
# (scripts/soak.py:64-66, confirmed twice through the CLI in
# docs/artifacts/soak_r04) — paired clips carry learnable cross-modal
# structure, so train loss_c must sink below ln(B) AND the held-out eval
# loss_c / retrieval R@K must follow: generalization, not memorization.
#
# Usage: EXP=/root/soak_paired bash scripts/soak_paired.sh
# Reference evidence target: traintest_cavmae_base.py:192-252 loss curves.
set -e
EXP=${EXP:-/root/soak_paired}
N=${N:-256}           # train clips; B=32 -> 8 steps/epoch
NVAL=${NVAL:-64}      # held-out clips (eval + retrieval gallery)
B=${B:-32}
EPOCHS=${EPOCHS:-24}  # 192 steps
export AVSIAM_SMALLN=${AVSIAM_SMALLN:-pallas}
export AVSIAM_SP_ROWS=${AVSIAM_SP_ROWS:-8192}
export PYTHONPATH="$PYTHONPATH:$(dirname "$0")/.."
mkdir -p "$EXP"

python - "$EXP" "$N" "$NVAL" <<'EOF'
import json, sys
exp, n, nval = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
def idx(path, lo, hi):
    json.dump({"data": [{"wav": f"/paired/clip{i:06d}.wav",
                         "labels": f"/m/{i % 8}"} for i in range(lo, hi)]},
              open(path, "w"))
idx(f"{exp}/train.json", 0, n)
idx(f"{exp}/val.json", n, n + nval)      # held out
with open(f"{exp}/labels.csv", "w") as f:
    f.write("index,mid,display_name\n")
    for i in range(8):
        f.write(f"{i},/m/{i},c{i}\n")
EOF

echo "== leg 3: $EPOCHS epochs x $((N / B)) steps, paired data =="
python -m avsiam_tpu.cli.pretrain \
  --data-train "$EXP/train.json" --data-val "$EXP/val.json" \
  --label-csv "$EXP/labels.csv" --n_class 8 \
  --frame_source synthetic_paired --batch-size "$B" --lr 2e-4 \
  --lrscheduler_start 1000 \
  --n-print-steps 8 --n-epochs "$EPOCHS" --exp-dir "$EXP/exp" \
  --save_model False --train_state_every 48 --keep_train_states 1 \
  --val_interval 4 --frame_use 5

echo "== retrieval on the HELD-OUT 64-clip gallery (best_audio_model) =="
python -m avsiam_tpu.cli.retrieval \
  --data-eval "$EXP/val.json" --label-csv "$EXP/labels.csv" \
  --n_class 8 --frame_source synthetic_paired --batch-size "$B" \
  --pretrain_path "$EXP/exp/models/best_audio_model" \
  --exp-dir "$EXP/ret" --frame_use 5
echo "soak_paired OK: $EXP"

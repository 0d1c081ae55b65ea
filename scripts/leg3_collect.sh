#!/bin/bash
# Collect the leg-3 paired-soak evidence (VERDICT r4 items 1b/2-adjacent):
# after scripts/soak_paired.sh (+ any --resume extension) finishes, run the
# held-out retrieval from the best checkpoint and copy the artifact set the
# soak README cites into docs/artifacts/soak_r04/leg3_paired/.
#
# Usage: EXP=/root/soak_leg3 bash scripts/leg3_collect.sh
set -eo pipefail
EXP=${EXP:-/root/soak_leg3}
RET=${RET:-$EXP/ret}
REPO=$(cd "$(dirname "$0")/.." && pwd)
DEST="$REPO/docs/artifacts/soak_r04/leg3_paired"
export AVSIAM_SMALLN=${AVSIAM_SMALLN:-pallas}
export AVSIAM_SP_ROWS=${AVSIAM_SP_ROWS:-8192}
export PYTHONPATH="$PYTHONPATH:$REPO"

if [ ! -f "$RET/retrieval_result.csv" ]; then
  echo "== retrieval on the HELD-OUT gallery (best_audio_model) =="
  python -m avsiam_tpu.cli.retrieval \
    --data-eval "$EXP/val.json" --label-csv "$EXP/labels.csv" \
    --n_class 8 --frame_source synthetic_paired --batch-size 32 \
    --pretrain_path "$EXP/exp/models/best_audio_model" \
    --exp-dir "$RET" --frame_use 5
else
  echo "reusing existing $RET/retrieval_result.csv"
fi

mkdir -p "$DEST"
cp "$EXP/exp/result.csv" "$DEST/result.csv"
cp "$EXP/exp/args.json" "$DEST/args.json"
cp "$RET/retrieval_result.csv" "$DEST/retrieval_heldout.csv"
for log in /root/soak_leg3.log /root/soak_leg3_resume.log; do
  [ -f "$log" ] && cp "$log" "$DEST/$(basename "$log" .log).run.log"
done

python - "$EXP" "$DEST" <<'EOF'
import csv, sys
exp, dest = sys.argv[1], sys.argv[2]
with open(f"{exp}/exp/result.csv") as f:
    rows = list(csv.DictReader(f))
# loss_c curve: train contrastive (nats) per epoch + held-out eval
# contrastive. result.csv's eval_loss_c is the 0.01-weighted term from the
# eval forward (the model's default contrast weight; the train column is the
# pass-1 unweighted loss) — unscale it here so both columns are in nats and
# directly comparable to the ln(B)=ln(32)=3.4657 uniform plateau.
with open(f"{dest}/loss_c_curve.csv", "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["epoch", "train_loss_c", "eval_loss_c", "eval_c_acc"])
    for r in rows:
        w.writerow([r["epoch"], r["loss_c"],
                    f'{float(r["eval_loss_c"]) * 100.0:.6f}'
                    if r["eval_loss_c"] else "",
                    r["eval_c_acc"]])
first, last = rows[0], rows[-1]
evals = [r for r in rows if r["eval_loss_c"]]
print(f"epochs {first['epoch']}..{last['epoch']}; "
      f"train loss_c {first['loss_c']} -> {last['loss_c']} (ln32=3.4657)")
print(f"held-out eval loss_c {float(evals[0]['eval_loss_c'])*100:.4f} -> "
      f"{float(evals[-1]['eval_loss_c'])*100:.4f}; "
      f"eval c_acc {evals[0]['eval_c_acc']} -> {evals[-1]['eval_c_acc']} "
      f"(chance 0.03125)")
EOF
echo "leg3_collect OK -> $DEST"

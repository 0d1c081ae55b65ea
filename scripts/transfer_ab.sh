#!/bin/bash
# Pretrain -> downstream transfer A/B (round 5): does a pretrained init beat
# scratch on HELD-OUT data, end to end through the real CLI/orbax stack?
# This is the reference's whole point — its FT runner loads the pretrain
# checkpoint (run_cavmae_ft_base.py:243-258) and its pretrain loop watches
# probe mAP rise per epoch (traintest_cavmae_base.py:250-252).
#
# Data: 'synthetic_paired' clips (data/dataset.py:_paired_latent — audio tone
# amplitudes == frame band intensities, one 8-dim latent per clip). The label
# is argmax(latent): derivable from EITHER modality's content, so a model
# must read the media (not memorize paths) and scratch vs pretrained is a
# fair content-learning comparison. FT train/val/eval clips are all DISJOINT
# from the pretraining clips (pretrain saw clip000000-255; see
# scripts/soak_paired.sh).
#
# Usage: PRETRAIN_CKPT=/root/soak_leg3/exp/models/best_audio_model \
#        EXP=/root/transfer_ab bash scripts/transfer_ab.sh
set -eo pipefail
EXP=${EXP:-/root/transfer_ab}
PRETRAIN_CKPT=${PRETRAIN_CKPT:?path to pretrain orbax params dir}
NTRAIN=${NTRAIN:-128}   # FT labeled train clips (clip000400-...)
NVAL=${NVAL:-64}        # FT val clips (per-epoch best-model selection)
NEVAL=${NEVAL:-64}      # final held-out test clips
B=${B:-16}
EPOCHS=${EPOCHS:-12}
LR=${LR:-1e-4}
export AVSIAM_SMALLN=${AVSIAM_SMALLN:-pallas}
export AVSIAM_SP_ROWS=${AVSIAM_SP_ROWS:-8192}
export PYTHONPATH="$PYTHONPATH:$(dirname "$0")/.."
mkdir -p "$EXP"

python - "$EXP" "$NTRAIN" "$NVAL" "$NEVAL" <<'EOF'
import json, sys, zlib
import numpy as np

exp, ntrain, nval, neval = sys.argv[1], *map(int, sys.argv[2:5])

def label(path):
    # must mirror data/dataset.py:_paired_latent: sigmoid(randn(8)) seeded by
    # crc32(path+"z"); argmax(sigmoid(z)) == argmax(z)
    z = np.random.RandomState(
        zlib.crc32((path + "z").encode("utf-8")) % (2 ** 31)).randn(8)
    return int(np.argmax(z))

def idx(path, lo, hi):
    recs = []
    for i in range(lo, hi):
        wav = f"/paired/clip{i:06d}.wav"
        recs.append({"wav": wav, "labels": f"/m/{label(wav)}"})
    json.dump({"data": recs}, open(path, "w"))
    counts = np.bincount([int(r["labels"][3:]) for r in recs], minlength=8)
    print(f"{path}: n={hi-lo} class counts {counts.tolist()}")

# all three splits disjoint from pretraining's clip000000-000319
idx(f"{exp}/ft_train.json", 400, 400 + ntrain)
idx(f"{exp}/ft_val.json", 600, 600 + nval)
idx(f"{exp}/ft_eval.json", 700, 700 + neval)
with open(f"{exp}/labels.csv", "w") as f:
    f.write("index,mid,display_name\n")
    for i in range(8):
        f.write(f"{i},/m/{i},c{i}\n")
EOF

run_ft () {  # $1 = run name, $2 = pretrain_path
  echo "== FT run '$1' (pretrain_path=$2) =="
  python -m avsiam_tpu.cli.finetune \
    --data_train "$EXP/ft_train.json" --data_val "$EXP/ft_val.json" \
    --data_eval "$EXP/ft_eval.json" \
    --label_csv "$EXP/labels.csv" --n_class 8 \
    --frame_source synthetic_paired --batch_size "$B" \
    --pretrain_path "$2" \
    --metrics acc --loss CE --label_smooth 0.0 \
    --lr "$LR" --head_lr 50 --mm_lr 100 --ftmode mm_grad \
    --lrscheduler_start 1000 \
    --n_epochs "$EPOCHS" --n_print_steps 8 \
    --save_model False --train_state_every "$EPOCHS" --keep_train_states 1 \
    --exp_dir "$EXP/$1" 2>&1 | tee "$EXP/$1.log"
}

run_ft pretrained "$PRETRAIN_CKPT"
run_ft scratch None

echo "== A/B summary =="
python - "$EXP" <<'EOF'
import csv, sys
exp = sys.argv[1]
for name in ("pretrained", "scratch"):
    with open(f"{exp}/{name}/result.csv") as f:
        rows = list(csv.DictReader(f))
    best = max(float(r["acc"]) for r in rows if r.get("acc"))
    print(f"{name}: best val acc {best:.4f} over {len(rows)} epochs")
    # the final held-out eval line is printed by cli.finetune itself (tee'd
    # into the per-run log); grep 'eval set:' in $exp/<name>.log
EOF

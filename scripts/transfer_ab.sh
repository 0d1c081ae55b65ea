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
NTRAIN=${NTRAIN:-256}   # FT labeled train clips (clip000400-...)
NVAL=${NVAL:-64}        # FT val clips (per-epoch best-model selection)
NEVAL=${NEVAL:-64}      # final held-out test clips
B=${B:-16}
EPOCHS=${EPOCHS:-24}
# Recipe history (the early stop at 3 non-improving epochs is reference
# parity, traintest_ft_base.py:249-251, so the recipe must improve
# monotonically from epoch 1):
#   v1 LR=1e-4 head x50 mm x100, acc: head 5e-3/mm 1e-2 diverged (CE 9.7
#      after 8 steps), both legs early-stopped at chance.
#   v2 LR=1e-5 head x50 mm x100, mAP: learning was real (acc 0.08->0.17,
#      val_loss 3.39->2.32) but mAP drifted DOWN from its epoch-1 noise
#      peak and early-stopped the run at epoch 4.
#   v3 (current defaults): fast head (1e-3), gentle backbone (mm 1e-4),
#      acc selection — the head converges within the patience window.
LR=${LR:-1e-5}
HEAD_LR=${HEAD_LR:-100}
MM_LR=${MM_LR:-10}
METRICS=${METRICS:-acc}
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

# All three splits disjoint from pretraining's clip000000-000319 AND from
# each other (round-5 fix: the first committed ranges overlapped train
# 400-655 with val 600-663 by 56 clips, biasing best-epoch selection —
# the held-out eval range was always disjoint; ranges now chain off
# ntrain so no overlap is possible at any NTRAIN/NVAL/NEVAL).
v0 = 400 + ntrain + 8
e0 = v0 + nval + 8
idx(f"{exp}/ft_train.json", 400, 400 + ntrain)
idx(f"{exp}/ft_val.json", v0, v0 + nval)
idx(f"{exp}/ft_eval.json", e0, e0 + neval)
with open(f"{exp}/labels.csv", "w") as f:
    f.write("index,mid,display_name\n")
    for i in range(8):
        f.write(f"{i},/m/{i},c{i}\n")
EOF

# The axon pool serializes device claims: a client started while the
# previous one's claim lingers blocks silently in backend init (observed
# ~35 min worst case before the claim expires). Poll with a tiny throwaway
# client until the device answers, so each leg starts against a free claim.
wait_tpu () {
  for i in $(seq 1 30); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp
print('tpu-free', float(jax.device_get(jnp.sum(jnp.ones((8,8))))))" \
        2>/dev/null | grep -q tpu-free; then
      return 0
    fi
    echo "wait_tpu: attempt $i — claim still held ($(date +%H:%M:%S))"
  done
  echo "wait_tpu: device never freed" >&2
  return 1
}

# Both legs + the linear-probe leg run in ONE process / one device claim
# (scripts/transfer_ab_driver.py) — separate CLI processes stall for tens
# of minutes between legs while the previous claim lingers. SOAK_EXP, if
# set, adds a one-epoch pretrain resume with the FT indices as probe data
# (exercises loops.linear_probe on the device).
wait_tpu
python scripts/transfer_ab_driver.py "$EXP" "$PRETRAIN_CKPT" "$B" \
  "$EPOCHS" "$LR" "$HEAD_LR" "$MM_LR" "$METRICS" ${SOAK_EXP:+"$SOAK_EXP"} \
  2>&1 | tee "$EXP/driver.log"

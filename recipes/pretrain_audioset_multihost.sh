#!/bin/bash
# Multi-host AudioSet-2M pretraining — the reference's flagship deployment
# (egs/audioset/run_pretrain_base.sh:3-5,75: srun torchrun --nnodes=2
# --nproc_per_node=8, 16 ranks over NCCL), TPU-native.
#
# On a TPU pod slice, jax.distributed discovers the topology automatically:
# launch this SAME script on every host (e.g. via
# `gcloud compute tpus tpu-vm ssh ... --worker=all --command=...`) with NO
# rendezvous flags — each host feeds its rank-block of the global batch
# (data/samplers.py) and jax.make_array_from_process_local_data assembles
# the global arrays; gradient psum + the contrastive all-gather ride ICI.
#
# Off-pod (e.g. CPU hosts, or the 2-process CPU test environment), pass the
# torchrun-style rendezvous explicitly per process:
#   JAX_COORDINATOR_ADDRESS=host0:29400 JAX_NUM_PROCESSES=2 \
#   JAX_PROCESS_ID=$RANK bash recipes/pretrain_audioset_multihost.sh
# (or the equivalent --coordinator_address/--num_processes/--process_id
# flags).
#
# The global batch (64, parity with 16 ranks x bs 4) must divide
# process_count; every other hyperparameter matches recipes/
# pretrain_audioset.sh.
set -e
EXP_DIR=${EXP_DIR:-./exp/pretrain_as2m_multihost}

exec bash "$(dirname "$0")/pretrain_audioset.sh" \
  --exp-dir "$EXP_DIR" \
  ${JAX_COORDINATOR_ADDRESS:+--coordinator_address "$JAX_COORDINATOR_ADDRESS"} \
  ${JAX_NUM_PROCESSES:+--num_processes "$JAX_NUM_PROCESSES"} \
  ${JAX_PROCESS_ID:+--process_id "$JAX_PROCESS_ID"} \
  "$@"

"""Representation-level pretrain-vs-scratch A/B, single process/claim.

The full-FT A/B (scripts/transfer_ab.sh) measures the reference WORKFLOW
from each init; on `synthetic_paired` data its FT task (argmax of the
tone-bank latent) is near-linearly decodable from the raw input — argmax
of k per-band energies IS a k-way linear classifier — so a scratch ViT
learns it about as fast as a pretrained one and the workflow A/B cannot
separate the inits (docs/artifacts/transfer_r05). What pretraining
actually buys is in the REPRESENTATION, and that is what this driver
measures, pretrained vs random init, everything else identical:

  1. Held-out retrieval (cli.retrieval, the reference's src/retrieval.py
     surface): audio<->video R@K needs cross-modal alignment, which no
     random init has and no label leaks — chance R@1 = 1/N.
  2. Linear probe (loops.linear_probe, the reference's per-epoch
     linear_val, traintest_cavmae_base.py:266-378): frozen base + linear
     head on the FT splits.
  3. Low-data FT (cli.finetune, 48 labeled clips): the workflow A/B in
     the regime where representations should matter most.

Usage: python scripts/transfer_repr.py EXP PRETRAIN_CKPT HELDOUT_JSON \
           FT_TRAIN_JSON FT_VAL_JSON FT_EVAL_JSON FT48_JSON LABELS_CSV
(FT48_JSON is a 48-clip subset of FT_TRAIN_JSON for the low-data leg;
see docs/artifacts/transfer_r05/README.md for the invocation)
"""

import csv
import gc
import json
import os
import sys


def read_retrieval_csv(exp_dir):
    with open(os.path.join(exp_dir, "retrieval_result.csv")) as f:
        return {r["direction"]: {k: float(v) for k, v in r.items()
                                 if k != "direction"}
                for r in csv.DictReader(f)}


def main():
    (exp, ckpt, heldout, ft_train, ft_val, ft_eval, ft48,
     labels) = sys.argv[1:9]
    os.makedirs(exp, exist_ok=True)
    summary = {}

    # ---- leg 1: held-out retrieval, pretrained vs random init ----
    from avsiam_tpu.cli import retrieval
    for name, pp in (("pretrained", ckpt), ("random", "None")):
        print(f"== retrieval '{name}' ==", flush=True)
        retrieval.main([
            "--data-eval", heldout, "--label-csv", labels, "--n_class", "8",
            "--frame_source", "synthetic_paired", "--batch-size", "32",
            "--pretrain_path", pp, "--exp-dir", f"{exp}/ret_{name}",
            "--frame_use", "5"])
        summary[f"retrieval_{name}"] = read_retrieval_csv(f"{exp}/ret_{name}")
        gc.collect()

    # ---- leg 2: linear probe, pretrained vs random pretrain params ----
    import jax
    import jax.numpy as jnp
    from avsiam_tpu.cli.common import dataset_from_args
    from avsiam_tpu.configs import (CAVMAEConfig, OptimizerConfig,
                                    PretrainConfig)
    from avsiam_tpu.models import CAVMAEPretrain
    from avsiam_tpu.train.loops import linear_probe
    from avsiam_tpu.utils.checkpoint import restore_params_from_path

    args = retrieval.build_parser().parse_args([
        "--data-train", ft_train, "--data-val", ft_val,
        "--label-csv", labels, "--n_class", "8",
        "--frame_source", "synthetic_paired", "--batch-size", "16",
        "--exp-dir", exp])
    train_ds = dataset_from_args(args, ft_train, train=True, frame_use=5)
    val_ds = dataset_from_args(args, ft_val, train=False, frame_use=5)
    mcfg = CAVMAEConfig(dtype=jnp.bfloat16)
    pre_cfg = PretrainConfig(model=mcfg, opt=OptimizerConfig(),
                             batch_size=16, exp_dir=exp)

    rng = jax.random.PRNGKey(0)
    a = jnp.zeros((1, mcfg.vit.audio_length, mcfg.vit.mel_bins))
    v = jnp.zeros((1, 3, mcfg.vit.img_size, mcfg.vit.img_size))
    model = CAVMAEPretrain(mcfg)
    random_params = jax.jit(
        lambda r, a, v: model.init({"params": r, "mask": r, "perm": r},
                                   a, v))(rng, a, v)["params"]
    for name, params in (("pretrained", restore_params_from_path(ckpt)),
                         ("random", jax.device_get(random_params))):
        print(f"== linear probe '{name}' ==", flush=True)
        summary[f"probe_{name}"] = linear_probe(
            params, pre_cfg, train_ds, val_ds, n_class=8)
        gc.collect()

    # ---- leg 3: low-data FT workflow A/B (48 labeled clips) ----
    from avsiam_tpu.cli import finetune
    common = [
        "--data_train", ft48, "--data_val", ft_val,
        "--data_eval", ft_eval, "--label_csv", labels, "--n_class", "8",
        "--frame_source", "synthetic_paired", "--batch_size", "16",
        "--metrics", "acc", "--loss", "CE", "--label_smooth", "0.0",
        "--lr", "1e-5", "--head_lr", "100", "--mm_lr", "10",
        "--ftmode", "mm_grad", "--lrscheduler_start", "1000",
        "--n_epochs", "24", "--n_print_steps", "8",
        "--save_model", "False", "--train_state_every", "24",
        "--keep_train_states", "1",
    ]
    for name, pp in (("pretrained", ckpt), ("scratch", "None")):
        print(f"== low-data FT leg '{name}' ==", flush=True)
        out = finetune.main(common + ["--pretrain_path", pp,
                                      "--exp_dir", f"{exp}/ft48_{name}"])
        summary[f"ft48_{name}"] = {
            "best_epoch": out.get("best_epoch"),
            "best_val": out.get("best"),
            "eval_acc": (out["eval_stats"][0]["acc"]
                         if out.get("eval_stats") else None),
        }
        del out
        gc.collect()

    print("TRANSFER_REPR_SUMMARY " + json.dumps(summary), flush=True)
    with open(os.path.join(exp, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()

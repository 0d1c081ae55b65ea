"""Pretrain->downstream transfer A/B, single process / single device claim.

Runs BOTH finetune legs (pretrained init vs scratch) and then a one-epoch
pretrain resume with linear-probe data in ONE python process. One process
matters on this host: the axon pool serializes device claims and a claim can
linger for tens of minutes after a client exits, so chaining separate CLI
processes stalls between legs (see CLAUDE.md gotchas). In-process, the
second leg also reuses the first leg's jitted programs (identical shapes),
so it starts stepping immediately.

Reference evidence target: the FT runner loading the pretrain checkpoint
(/root/reference/src/run_cavmae_ft_base.py:243-258) and the per-epoch
linear probe during pretraining (traintest_cavmae_base.py:250-252).

Usage (data files prepared by scripts/transfer_ab.sh):
  python scripts/transfer_ab_driver.py EXP PRETRAIN_CKPT B EPOCHS LR \
      HEAD_LR MM_LR METRICS [SOAK_EXP]
SOAK_EXP, if given, must be a pretrain --exp_dir with a train_state to
resume; the driver runs one more pretrain epoch there with the FT train/val
indices as probe data, exercising loops.linear_probe on the device.
"""

import gc
import json
import sys


def main():
    (exp, ckpt, b, epochs, lr, head_lr, mm_lr, metrics) = sys.argv[1:9]
    soak_exp = sys.argv[9] if len(sys.argv) > 9 else None

    from avsiam_tpu.cli import finetune

    common = [
        "--data_train", f"{exp}/ft_train.json",
        "--data_val", f"{exp}/ft_val.json",
        "--data_eval", f"{exp}/ft_eval.json",
        "--label_csv", f"{exp}/labels.csv", "--n_class", "8",
        "--frame_source", "synthetic_paired", "--batch_size", b,
        "--metrics", metrics, "--loss", "CE", "--label_smooth", "0.0",
        "--lr", lr, "--head_lr", head_lr, "--mm_lr", mm_lr,
        "--ftmode", "mm_grad", "--lrscheduler_start", "1000",
        "--n_epochs", epochs, "--n_print_steps", "8",
        "--save_model", "False", "--train_state_every", epochs,
        "--keep_train_states", "1",
    ]
    summary = {}
    for name, pp in (("pretrained", ckpt), ("scratch", "None")):
        print(f"== FT leg '{name}' (pretrain_path={pp}) ==", flush=True)
        out = finetune.main(common + ["--pretrain_path", pp,
                                      "--exp_dir", f"{exp}/{name}"])
        summary[name] = {
            "best_epoch": out.get("best_epoch"),
            "best_val": out.get("best"),
            "eval_acc": (out["eval_stats"][0]["acc"]
                         if out.get("eval_stats") else None),
        }
        del out
        gc.collect()

    if soak_exp:
        print("== linear probe leg (pretrain resume + probe) ==", flush=True)
        from avsiam_tpu.cli import pretrain
        import csv as _csv
        import os
        with open(os.path.join(soak_exp, "result.csv")) as f:
            last_epoch = int(list(_csv.DictReader(f))[-1]["epoch"])
        out = pretrain.main([
            "--data-train", f"{os.path.dirname(soak_exp)}/train.json",
            "--data-val", f"{os.path.dirname(soak_exp)}/val.json",
            "--label-csv", f"{exp}/labels.csv", "--n_class", "8",
            "--frame_source", "synthetic_paired", "--batch-size", "32",
            "--lr", "2e-4", "--lrscheduler_start", "1000",
            "--n-print-steps", "8", "--n-epochs", str(last_epoch + 1),
            "--exp-dir", soak_exp, "--save_model", "False",
            "--train_state_every", "48", "--keep_train_states", "1",
            "--val_interval", "1", "--frame_use", "5", "--resume",
            "--probe_data_train", f"{exp}/ft_train.json",
            "--probe_data_val", f"{exp}/ft_val.json",
        ])
        row = out["rows"][-1] if out.get("rows") else {}
        summary["probe"] = {k: v for k, v in row.items()
                            if k.startswith("probe_")}
        del out
        gc.collect()

    print("TRANSFER_AB_SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()

"""ReduceLROnPlateau parity (the reference's lr_adapt path) + drop-in
acceptance of the reference recipes' verbatim command lines.

Parity targets: traintest_ft_base.py:99-100,266-270 and
traintest_cavmae_base.py:69-71,236-237 construct
``torch.optim.lr_scheduler.ReduceLROnPlateau(mode='max', factor=0.5,
patience=args.lr_patience)`` and step it per epoch on the eval metric.
PlateauScheduler is fuzzed update-for-update against torch itself.
"""

import numpy as np
import pytest

from avsiam_tpu.configs import OptimizerConfig
from avsiam_tpu.train.optim import PlateauScheduler, plateau_scheduler


def _torch_lrs(metrics, lr, **kw):
    torch = pytest.importorskip("torch")  # skip, not error, without torch
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=lr)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, **kw)
    out = []
    for m in metrics:
        sched.step(m)
        out.append(opt.param_groups[0]["lr"])
    return out


@pytest.mark.parametrize("mode", ["max", "min"])
@pytest.mark.parametrize("patience,cooldown,threshold_mode",
                         [(0, 0, "rel"), (1, 0, "rel"), (2, 0, "rel"),
                          (1, 2, "rel"), (1, 0, "abs")])
def test_plateau_matches_torch(mode, patience, cooldown, threshold_mode):
    rng = np.random.RandomState(hash((mode, patience, cooldown)) % 2**31)
    for trial in range(5):
        # random walks with plateaus: metric sequences both improving and not
        metrics = np.cumsum(rng.randn(30) * 0.1) + rng.choice([0.0, 0.5])
        if trial % 2:
            metrics[10:20] = metrics[10]  # hard plateau segment
        ours = PlateauScheduler(1e-3, mode=mode, factor=0.5,
                                patience=patience, cooldown=cooldown,
                                threshold_mode=threshold_mode)
        want = _torch_lrs(metrics, 1e-3, mode=mode, factor=0.5,
                          patience=patience, cooldown=cooldown,
                          threshold_mode=threshold_mode)
        got = [ours.step(m) for m in metrics]
        np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_plateau_factory_reference_settings():
    """plateau_scheduler builds exactly the scheduler the reference loops do:
    mode='max', factor=0.5, patience from the config, torch defaults else."""
    s = plateau_scheduler(OptimizerConfig(lr=1e-4, lr_adapt=True,
                                          lr_patience=1))
    assert s.mode == "max" and s.factor == 0.5 and s.patience == 1
    # with patience 1: two consecutive non-improving epochs halve the lr
    assert s.step(0.5) == 1e-4      # first metric becomes best
    assert s.step(0.4) == 1e-4      # bad epoch 1
    assert s.step(0.4) == 5e-5      # bad epoch 2 > patience -> halve
    assert s.step(0.6) == 5e-5      # new best; lr stays reduced (torch)


def test_finetune_loop_lr_adapt(tmp_path):
    """Integration: run_finetune under lr_adapt uses the plateau schedule —
    each epoch's logged lr must equal a replay of PlateauScheduler over the
    preceding epochs' mAP values (the loop steps on the main metric,
    traintest_ft_base.py:266-270)."""
    import json
    from tests.test_loops_cli import TINY_AUDIO, TINY_VIT, _ds
    from avsiam_tpu.configs import CAVMAEFTConfig, FinetuneConfig
    from avsiam_tpu.train.loops import run_finetune

    data = {"data": [{"wav": f"/fake/{i}.wav",
                      "labels": "/m/0" if i % 2 else "/m/1"}
                     for i in range(8)]}
    p = tmp_path / "idx.json"
    p.write_text(json.dumps(data))
    csvp = tmp_path / "labels.csv"
    csvp.write_text("index,mid,display_name\n0,/m/0,a\n1,/m/1,b\n2,/m/2,c\n")
    idx = (str(p), str(csvp))
    cfg = FinetuneConfig(
        model=CAVMAEFTConfig(vit=TINY_VIT, label_dim=3, num_eval_frames=2),
        audio=TINY_AUDIO,
        opt=OptimizerConfig(lr=1e-4, lr_adapt=True, lr_patience=0),
        batch_size=4, n_epochs=3, n_print_steps=1,
        exp_dir=str(tmp_path / "ft"))
    out = run_finetune(cfg, _ds(idx), _ds(idx, train=False),
                       max_steps_per_epoch=1, log=lambda *a: None)
    assert not out.get("diverged")
    sched = plateau_scheduler(cfg.opt)
    for row in out["rows"]:
        assert row["lr"] == pytest.approx(sched.lr)
        sched.step(row["mAP"])
    # patience 0 on noisy tiny-data mAP: at least one reduction must fire
    # OR mAP improved monotonically (possible but then lr stays constant) —
    # assert the lr column is exactly the replayed schedule either way (above)


# --- verbatim reference command lines (paths swapped) parse and map ---

# egs/audioset/run_pretrain_base.sh:75-88 with its header variable values
# (lines 16-43) substituted; only the data/exp paths are swapped.
PRETRAIN_ARGV = (
    "--model cav-mae --dataset audioset "
    "--data-train tr.json --data-val te.json --exp-dir EXP "
    "--label-csv lbl.csv --n_class 527 "
    "--lr 2e-4 --n-epochs 25 --batch-size 4 --save_model True "
    "--mixup 0.0 --bal None "
    "--lrscheduler_start 10 --lrscheduler_decay 0.5 --lrscheduler_step 5 "
    "--dataset_mean -5.081 --dataset_std 4.4849 --target_length 1024 "
    "--noise True --warmup True "
    "--lr_adapt False "
    "--norm_pix_loss True "
    "--pretrain_path None "
    "--mae_loss_weight 0 --contrast_loss_weight 1 --num_workers 6 "
    "--tr_pos False --masking_ratio 0.25 --masking_ratio_a 0.25 "
    "--mask_mode unstructured --wandb 1 "
    "--model_name ddp-A5000_ACAV-Mixed0050-5+MAE_ratio_SQL").split()

# egs/audioset/run_base_ft.sh:86-99 with header values (lines 20-53)
FT_ARGV = (
    "--model cav-mae --dataset audioset_20k "
    "--data_train tr.json --data_val te.json --exp_dir EXP "
    "--label_csv lbl.csv --n_class 527 "
    "--lr 1e-4 --n_epochs 15 --batch_size 8 --save_model True "
    "--freqm 48 --timem 192 --mixup 0.5 --bal None "
    "--label_smooth 0.1 "
    "--lrscheduler_start 2 --lrscheduler_decay 0.75 --lrscheduler_step 1 "
    "--dataset_mean -5.081 --dataset_std 4.4849 --target_length 1024 "
    "--noise True "
    "--loss BCE --metrics mAP --warmup True "
    "--wa True --wa_start 10 --wa_end 15 --lr_adapt False "
    "--pretrain_path None --ftmode mm_grad "
    "--freeze_base False --head_lr 100 --mm_lr 100 "
    "--num_workers 8 --skip_frame_agg False --wandb 0 "
    "--model_name as20k-mixed+MAE-0050-5 --dis_w 0.0 --dis_w_2 0.0").split()


def test_reference_pretrain_command_line_parses():
    from avsiam_tpu.cli.pretrain import build_parser
    args = build_parser().parse_args(PRETRAIN_ARGV)
    assert args.lr == 2e-4 and args.n_epochs == 25
    assert args.lr_adapt is False and args.warmup is True
    assert args.save_model is True and args.wandb == 1
    assert args.mae_loss_weight == 0.0 and args.contrast_loss_weight == 1.0
    assert args.norm_pix_loss is True and args.tr_pos is False


def test_reference_ft_command_line_parses():
    from avsiam_tpu.cli.finetune import build_parser
    args = build_parser().parse_args(FT_ARGV)
    assert args.head_lr == 100 and args.mm_lr == 100
    assert args.lr_adapt is False and args.lr_patience == 1  # ft default
    assert args.wa is True and args.wa_start == 10 and args.wa_end == 15
    assert args.skip_frame_agg is False and args.dis_w == 0.0
    assert args.bal == "None"  # string, must NOT trigger weighted sampling


def test_optimizer_from_args_maps_lr_adapt():
    from avsiam_tpu.cli.finetune import build_parser
    from avsiam_tpu.cli.common import optimizer_from_args
    args = build_parser().parse_args(
        FT_ARGV + ["--lr_adapt", "True", "--lr_patience", "3"])
    opt = optimizer_from_args(args)
    assert opt.lr_adapt is True and opt.lr_patience == 3

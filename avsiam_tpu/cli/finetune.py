"""Finetuning runner. Parity surface: src/run_cavmae_ft_base.py.

Example (smoke run on synthetic data):
  python -m avsiam_tpu.cli.finetune --data_train idx.json --data_val idx.json \
      --n_epochs 1 --batch_size 2 --frame_source synthetic \
      --max_steps_per_epoch 2 --exp_dir ./exp/ft_smoke
"""

from __future__ import annotations

import argparse
import ast
import os


from avsiam_tpu.cli.common import (add_common_args, audio_config_from_args,
                                   dataset_from_args, dump_args, jnp_dtype,
                                   mesh_from_args, optimizer_from_args)
from avsiam_tpu.configs import FinetuneConfig
from avsiam_tpu.train.loops import run_finetune


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("avsiam-tpu finetune")
    add_common_args(p, ft=True)
    p.add_argument("--ftmode", type=str, default="mm_grad")
    p.add_argument("--ftmode_test", type=str, default=None)
    p.add_argument("--head_lr", type=float, default=50.0)
    p.add_argument("--mm_lr", type=float, default=100.0)
    p.add_argument("--freeze_base", type=ast.literal_eval, default=False)
    p.add_argument("--label_smooth", type=float, default=0.1)
    p.add_argument("--pretrain_path", type=str, default="None")
    p.add_argument("--wa", type=ast.literal_eval, default=False)
    p.add_argument("--wa_start", type=int, default=1)
    p.add_argument("--wa_end", type=int, default=10)
    p.add_argument("--weight_file", type=str, default=None,
                   help="CSV of per-sample balance weights (with --bal)")
    # inert reference flags, accepted so egs/audioset/run_base_ft.sh's
    # verbatim command line parses: skip_frame_agg is only read in the dead
    # post-exit() ensemble block (run_cavmae_ft_base.py:283-369); dis_w /
    # dis_w_2 are parsed and never read anywhere
    p.add_argument("--skip_frame_agg", type=ast.literal_eval, default=False,
                   help="no-op: only used in the reference's dead code")
    p.add_argument("--dis_w", type=float, default=0.0,
                   help="no-op: parsed but never read by the reference")
    p.add_argument("--dis_w_2", type=float, default=0.0,
                   help="no-op: parsed but never read by the reference")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest train_state checkpoint")
    p.add_argument("--parity_optimizer", type=ast.literal_eval, default=True,
                   help="gated Adam reproducing DDP unused-param skip "
                        "semantics under mm_grad routing (False = plain "
                        "optax: faster, non-parity dynamics)")
    return p


def _load_init_params(args, cfg: FinetuneConfig):
    """Load a pretraining checkpoint: torch .pth (reference format) or an
    orbax dir saved by our pretrainer. Parity: run_cavmae_ft_base.py:243-258
    (non-strict load through the DataParallel shim)."""
    path = args.pretrain_path
    if not path or path == "None":
        return None
    import jax
    import jax.numpy as jnp
    from avsiam_tpu.models import CAVMAEFinetune
    model = CAVMAEFinetune(cfg.model)
    rng = jax.random.PRNGKey(0)
    a = jnp.zeros((1, cfg.model.vit.audio_length, cfg.model.vit.mel_bins))
    v = jnp.zeros((1, 1, 3, cfg.model.vit.img_size, cfg.model.vit.img_size))
    fresh = jax.jit(lambda r, a, v: model.init(r, a, v, cfg.ftmode, False))(
        rng, a, v)["params"]
    if path.endswith(".pth"):
        from avsiam_tpu.utils.torch_import import (import_cavmae_ft,
                                                   load_torch_checkpoint)
        sd = load_torch_checkpoint(path)
        params, missing, unused = import_cavmae_ft(
            sd, jax.device_get(fresh), depth=cfg.model.vit.depth)
        print(f"loaded {path}: {len(missing)} fresh-init params, "
              f"{len(unused)} unused torch keys")
        return params
    from avsiam_tpu.utils.checkpoint import (restore_params_from_path,
                                             transfer_pretrain_to_ft)
    pre = restore_params_from_path(path)
    return transfer_pretrain_to_ft(pre, jax.device_get(fresh))


def main(argv=None):
    from avsiam_tpu.cli.common import apply_platform_override
    apply_platform_override()
    args = build_parser().parse_args(argv)
    dump_args(args, args.exp_dir)
    from avsiam_tpu.cli.common import setup_wandb, balance_weights_from_args
    setup_wandb(args)
    from avsiam_tpu.configs import replace
    from avsiam_tpu.models.variants import finetune_config
    model_cfg = finetune_config(args.model, label_dim=args.n_class,
                                dtype=jnp_dtype(args.dtype),
                                attn_impl=args.attn_impl,
                                mlp_impl=args.mlp_impl)
    model_cfg = replace(model_cfg, vit=replace(
        model_cfg.vit, audio_length=args.target_length))
    mel = model_cfg.vit.mel_bins
    mesh = mesh_from_args(args)
    from avsiam_tpu.configs import MeshConfig
    cfg = FinetuneConfig(
        mesh=MeshConfig(data=mesh.shape["data"], model=mesh.shape["model"]),
        model=model_cfg,
        audio=audio_config_from_args(args, train=True, num_mel_bins=mel),
        opt=optimizer_from_args(args), batch_size=args.batch_size,
        n_epochs=args.n_epochs, head_lr=args.head_lr, mm_lr=args.mm_lr,
        freeze_base=bool(args.freeze_base), ftmode=args.ftmode,
        ftmode_test=args.ftmode_test,
        loss=args.loss, metrics=args.metrics, label_smooth=args.label_smooth,
        parity_optimizer=bool(args.parity_optimizer),
        n_print_steps=args.n_print_steps, seed=args.seed,
        exp_dir=args.exp_dir, save_model=bool(args.save_model),
        keep_train_states=args.keep_train_states,
        train_state_every=args.train_state_every)
    nf = model_cfg.num_eval_frames
    train_ds = dataset_from_args(args, args.data_train, train=True,
                                 label_smooth=args.label_smooth,
                                 num_mel_bins=mel,
                                 im_res=model_cfg.vit.img_size, num_frames=nf)
    val_ds = (dataset_from_args(args, args.data_val, train=False,
                                num_mel_bins=mel,
                                im_res=model_cfg.vit.img_size, num_frames=nf)
              if args.data_val else None)
    weights = balance_weights_from_args(args, len(train_ds))
    init_params = _load_init_params(args, cfg)
    out = run_finetune(cfg, train_ds, val_ds, init_params=init_params,
                       mesh=mesh,
                       balance_weights=weights, wa=bool(args.wa),
                       wa_start=args.wa_start, wa_end=args.wa_end,
                       resume=args.resume,
                       max_steps_per_epoch=args.max_steps_per_epoch)
    print("finetune done:", {k: out.get(k) for k in ("best_epoch", "best")})
    if args.data_eval and not out.get("diverged"):
        # final held-out evaluation with the BEST checkpoint (the reference's
        # separate --data_eval test split)
        from avsiam_tpu.eval.metrics import mean_ap, mean_auc
        from avsiam_tpu.models import CAVMAEFinetune
        from avsiam_tpu.train.finetune import make_ft_eval_step
        from avsiam_tpu.train.loops import validate_ft
        from avsiam_tpu.utils.checkpoint import restore_params
        eval_ds = dataset_from_args(args, args.data_eval, train=False,
                                    num_mel_bins=mel,
                                    im_res=model_cfg.vit.img_size,
                                    num_frames=nf)
        best_dir = os.path.join(cfg.exp_dir, "models", "best_audio_model")
        if os.path.isdir(best_dir):
            best = restore_params(cfg.exp_dir, "best_audio_model",
                                  like=out["state"].params)
        else:
            # best_audio_model only exists when --data_val drove per-epoch
            # selection; without it, evaluate the final params
            print("no best checkpoint (no --data_val); evaluating final "
                  "params on --data_eval")
            best = out["state"].params
        stats, loss = validate_ft(make_ft_eval_step(out["model"], cfg), best,
                                  eval_ds, cfg,
                                  max_steps=args.max_steps_per_epoch)
        print(f"eval set: mAP {mean_ap(stats):.4f} AUC {mean_auc(stats):.4f} "
              f"acc {stats[0]['acc']:.4f} loss {loss:.4f}")
        out["eval_stats"] = stats
    return out


if __name__ == "__main__":
    main()

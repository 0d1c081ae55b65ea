"""Pretraining runner. Parity surface: src/run_cavmae_pretrain_base.py.

Example (smoke run on synthetic data):
  python -m avsiam_tpu.cli.pretrain --data-train idx.json --n-epochs 1 \
      --batch-size 4 --frame_source synthetic --max_steps_per_epoch 2 \
      --exp-dir ./exp/smoke
"""

from __future__ import annotations

import argparse

from avsiam_tpu.cli.common import (add_common_args, audio_config_from_args,
                                   dataset_from_args, dump_args, jnp_dtype,
                                   mesh_from_args, optimizer_from_args)
from avsiam_tpu.configs import PretrainConfig
from avsiam_tpu.train.loops import run_pretrain


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("avsiam-tpu pretrain")
    add_common_args(p, ft=False)
    p.add_argument("--contrast_loss_weight", type=float, default=0.01)
    p.add_argument("--mae_loss_weight", type=float, default=3.0)
    p.add_argument("--masking_ratio", type=float, default=0.75)
    p.add_argument("--masking_ratio_a", type=float, default=0.75)
    p.add_argument("--mask_mode", type=str, default="unstructured",
                   choices=["unstructured", "time", "freq", "tf"])
    p.add_argument("--mmixed_impl", type=str, default="exact",
                   choices=["padded", "exact", "bucketed", "packed", "tconcat"])
    p.add_argument("--pretrain_path", type=str, default="None")
    # inert reference flags, accepted so egs/audioset/run_pretrain_base.sh's
    # verbatim command line parses: norm_pix_loss reaches CAVMAE_BASE but its
    # use is commented out (cav_mae_base.py:673-676); tr_pos is a constructor
    # arg with no effect in CAVMAE_BASE (its pos embeds are buffers from timm
    # + always-trainable decoder nn.Parameters, cav_mae_base.py:312-314)
    import ast
    p.add_argument("--norm_pix_loss", type=ast.literal_eval, default=False,
                   help="no-op: commented out in the reference model")
    p.add_argument("--tr_pos", type=ast.literal_eval, default=False,
                   help="no-op in CAVMAE_BASE (see audio-only model for the "
                        "live tr_pos)")
    # linear-probe datasets (the reference builds separate AS-20K loaders,
    # run_cavmae_pretrain_base.py:146-163)
    p.add_argument("--probe_data_train", type=str, default=None)
    p.add_argument("--probe_data_val", type=str, default=None)
    p.add_argument("--frame_use", type=int, default=-1,
                   help="pin the training frame index (-1 = random of 10, "
                        "the reference behavior); opt-in determinism for "
                        "probes")
    p.add_argument("--val_interval", type=int, default=1,
                   help="validate every N epochs (always on the last; "
                        "1 = reference behavior)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest train_state checkpoint")
    p.add_argument("--weight_file", type=str, default=None,
                   help="CSV of per-sample balance weights (with --bal bal; "
                        "the reference pretrain runner's DistributedProxy"
                        "Sampler path, run_cavmae_pretrain_base.py:128)")
    return p


def _load_init_params(args, cfg: PretrainConfig):
    """Initial parameters for pretraining. The reference's *default* start is
    a timm ViT-B in21k checkpoint surgically adapted for audio
    (cav_mae_base.py:236-303); ``--pretrain_path`` points at either that
    torch .pth trunk or an orbax params dir saved by a previous pretrain."""
    path = args.pretrain_path
    if not path or path == "None":
        return None
    import jax
    import jax.numpy as jnp

    from avsiam_tpu.models import CAVMAEPretrain
    model = CAVMAEPretrain(cfg.model)
    rng = jax.random.PRNGKey(0)
    a = jnp.zeros((2, cfg.model.vit.audio_length, cfg.model.vit.mel_bins))
    v = jnp.zeros((2, 3, cfg.model.vit.img_size, cfg.model.vit.img_size))
    fresh = jax.jit(lambda r, a, v: model.init(
        r, a, v, cfg.masking_ratio_a, cfg.masking_ratio,
        mae_loss_weight=1.0, contrast_loss_weight=1.0))(
            {"params": rng, "mask": rng, "perm": rng}, a, v)["params"]
    if path.endswith(".pth"):
        from avsiam_tpu.utils.torch_import import (build_pretrain_from_timm,
                                                   load_torch_checkpoint)
        sd = load_torch_checkpoint(path)
        params = build_pretrain_from_timm(
            sd, jax.device_get(fresh), depth=cfg.model.vit.depth,
            num_audio_tokens=cfg.model.vit.num_audio_tokens)
        print(f"initialized pretrain trunk from timm checkpoint {path}")
        return params
    from avsiam_tpu.utils.checkpoint import restore_params_from_path
    params = restore_params_from_path(path, like=jax.device_get(fresh))
    print(f"initialized pretrain params from {path}")
    return params


def main(argv=None):
    from avsiam_tpu.cli.common import apply_platform_override
    apply_platform_override()
    args = build_parser().parse_args(argv)
    dump_args(args, args.exp_dir)
    from avsiam_tpu.cli.common import setup_wandb, balance_weights_from_args
    setup_wandb(args)
    from avsiam_tpu.configs import replace
    from avsiam_tpu.models.variants import pretrain_config
    model_cfg = pretrain_config(args.model, dtype=jnp_dtype(args.dtype),
                                attn_impl=args.attn_impl,
                                mmixed_impl=args.mmixed_impl,
                                mlp_impl=args.mlp_impl)
    # the audio token grid follows --target_length (reference fixes 1024)
    model_cfg = replace(model_cfg, vit=replace(
        model_cfg.vit, audio_length=args.target_length))
    mel = model_cfg.vit.mel_bins
    mesh = mesh_from_args(args)
    from avsiam_tpu.configs import MeshConfig
    cfg = PretrainConfig(
        mesh=MeshConfig(data=mesh.shape["data"], model=mesh.shape["model"]),
        model=model_cfg,
        audio=audio_config_from_args(args, train=True, num_mel_bins=mel),
        opt=optimizer_from_args(args), batch_size=args.batch_size,
        n_epochs=args.n_epochs, masking_ratio=args.masking_ratio,
        masking_ratio_a=args.masking_ratio_a, mask_mode=args.mask_mode,
        contrast_loss_weight=args.contrast_loss_weight,
        mae_loss_weight=args.mae_loss_weight,
        n_print_steps=args.n_print_steps, seed=args.seed,
        exp_dir=args.exp_dir, save_model=bool(args.save_model),
        keep_train_states=args.keep_train_states,
        train_state_every=args.train_state_every,
        val_interval=args.val_interval)
    train_ds = dataset_from_args(args, args.data_train, train=True,
                                 num_mel_bins=mel,
                                 im_res=model_cfg.vit.img_size,
                                 frame_use=args.frame_use)
    val_ds = (dataset_from_args(args, args.data_val, train=False,
                                num_mel_bins=mel,
                                im_res=model_cfg.vit.img_size)
              if args.data_val else None)
    probe_train = (dataset_from_args(args, args.probe_data_train, train=True,
                                     num_mel_bins=mel,
                                     im_res=model_cfg.vit.img_size)
                   if args.probe_data_train else None)
    probe_val = (dataset_from_args(args, args.probe_data_val, train=False,
                                   num_mel_bins=mel,
                                   im_res=model_cfg.vit.img_size)
                 if args.probe_data_val else None)
    weights = balance_weights_from_args(args, len(train_ds))
    out = run_pretrain(cfg, train_ds, val_ds,
                       probe_train_ds=probe_train, probe_val_ds=probe_val,
                       probe_n_class=args.n_class,
                       init_params=_load_init_params(args, cfg),
                       balance_weights=weights,
                       mesh=mesh, resume=args.resume,
                       max_steps_per_epoch=args.max_steps_per_epoch)
    print("pretrain done:", {k: out[k] for k in ("best_epoch",)
                             if k in out})
    return out


if __name__ == "__main__":
    main()

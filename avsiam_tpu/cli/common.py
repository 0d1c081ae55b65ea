"""Shared CLI plumbing: argparse -> config dataclasses, dataset construction,
arg dumps (args.json parity with run_cavmae_pretrain_base.py:205-208)."""

from __future__ import annotations

import argparse
import ast
import json
import os
from avsiam_tpu.configs import AudioConfig, OptimizerConfig
from avsiam_tpu.data.dataset import AVDataset


def apply_platform_override():
    """Honor AVSIAM_PLATFORM=cpu|tpu|... before any device is touched.

    Needed because some environments force a platform programmatically at
    interpreter start (a sitecustomize hook), which plain JAX_PLATFORMS env
    vars cannot undo — jax.config.update before first device use can. Called
    at the top of every CLI main."""
    plat = os.environ.get("AVSIAM_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    _enable_compile_cache()


def _enable_compile_cache():
    """Persistent XLA compilation cache for the CLI runners.

    A full train-step compile costs 3-8 minutes on a remote-compile TPU
    backend; reruns of the same config (restarts, --resume, recipe sweeps)
    should not pay it twice. Default dir ~/.cache/avsiam_jax, override with
    AVSIAM_COMPILE_CACHE=<dir>, disable with AVSIAM_COMPILE_CACHE= (empty).
    Safe across concurrent processes (JAX writes entries atomically)."""
    cache = os.environ.get("AVSIAM_COMPILE_CACHE",
                           os.path.expanduser("~/.cache/avsiam_jax"))
    if not cache:
        return
    import jax
    # CPU compiles are seconds, and XLA:CPU AOT cache entries replay with
    # machine-feature mismatch warnings (risking SIGILL on heterogeneous
    # hosts) — only accelerator backends benefit. Check the jax.config value
    # first (a sitecustomize hook may have set the platform programmatically,
    # same reason apply_platform_override exists), then the env var. Neither
    # forces backend init, so `--help` stays instant.
    plat = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    if plat.startswith("cpu"):
        return
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knob: run uncached


def add_common_args(p: argparse.ArgumentParser, ft: bool = False):
    """Flag names mirror the reference runners (run_cavmae_pretrain_base.py:
    47-105 uses dashed names; run_cavmae_ft_base.py:62-141 underscored).
    Both spellings are accepted here."""
    def arg(*names, **kw):
        p.add_argument(*names, **kw)

    sep = "_" if ft else "-"
    arg(f"--data{sep}train", dest="data_train", type=str, default="")
    arg(f"--data{sep}val", dest="data_val", type=str, default="")
    arg(f"--data{sep}eval", dest="data_eval", type=str, default=None)
    arg(f"--label{sep}csv", dest="label_csv", type=str, default=None)
    arg("--n_class", type=int, default=527)
    arg("--model", type=str, default="cav-mae-base")
    arg("--dataset", type=str, default="audioset")
    arg("--dataset_mean", type=float, default=-5.081)
    arg("--dataset_std", type=float, default=4.4849)
    arg("--target_length", type=int, default=1024)
    arg("--noise", type=ast.literal_eval, default=False)
    arg(f"--exp{sep}dir", dest="exp_dir", type=str, default="./exp")
    arg("--lr", "--learning-rate", dest="lr", type=float, default=1e-4)
    arg("-b", "--batch-size", "--batch_size", dest="batch_size", type=int,
        default=12)
    arg("-w", "--num_workers", type=int, default=2)
    arg("--n-epochs", "--n_epochs", dest="n_epochs", type=int, default=10)
    arg("--metrics", type=str, default="mAP", choices=["mAP", "acc"])
    arg("--loss", type=str, default="BCE", choices=["BCE", "CE"])
    arg("--lrscheduler_start", type=int, default=10)
    arg("--lrscheduler_step", type=int, default=5)
    arg("--lrscheduler_decay", type=float, default=0.5)
    # adaptive-lr path + the reference's parsed-but-inert flags, so the
    # verbatim recipe command lines (egs/audioset/run_base_ft.sh:86-99,
    # run_pretrain_base.sh:75-88) parse and run here unchanged:
    arg("--lr_adapt", type=ast.literal_eval, default=False,
        help="ReduceLROnPlateau(mode=max, factor=0.5, patience=lr_patience) "
             "instead of MultiStepLR (traintest_ft_base.py:99-104)")
    arg("--lr_patience", type=int, default=1 if ft else 2,
        help="epochs to wait before halving lr under --lr_adapt")
    arg("--warmup", type=ast.literal_eval, default=True,
        help="no-op: parsed but never used by the reference either "
             "(run_cavmae_ft_base.py:88)")
    arg("--optim", type=str, default="adam", choices=["sgd", "adam"],
        help="no-op: the reference parses this but hard-codes Adam in both "
             "loops (traintest_cavmae_base.py:64-66, traintest_ft_base.py:78)")
    arg("--save_model", type=ast.literal_eval, default=True,
        help="save per-epoch audio_model.{e} checkpoints "
             "(traintest_cavmae_base.py:232)")
    arg("--keep_train_states", type=int, default=1,
        help="trailing train_state.{e} resume checkpoints to keep "
             "(~2.9 GB each at ViT-B; resume reads only the newest; "
             "<=0 keeps all)")
    arg("--train_state_every", type=int, default=1,
        help="save the resume train_state every N epochs (final epoch "
             "always saved; 1 = per-epoch, the reference behavior)")
    arg("--wandb", type=int, default=0,
        help="enable wandb logging (project 'uavm', rank 0 only)")
    arg("--model_name", type=str, default="",
        help="wandb run name (run_cavmae_ft_base.py:157)")
    arg("--n-print-steps", "--n_print_steps", dest="n_print_steps", type=int,
        default=100)
    arg("--mixup", type=float, default=0.0)
    arg("--bal", type=str, default=None)
    arg("--freqm", type=int, default=0)
    arg("--timem", type=int, default=0)
    arg("--seed", type=int, default=87)
    arg("--frame_source", type=str, default="frames",
        choices=["frames", "video", "synthetic", "synthetic_paired"])
    arg("--max_steps_per_epoch", type=int, default=None,
        help="cap steps per epoch (smoke runs)")
    arg("--dtype", type=str, default="bfloat16",
        choices=["bfloat16", "float32"])
    arg("--attn_impl", type=str, default="auto",
        choices=["auto", "pallas", "xla"])
    # 'auto' resolves to 'fres' on TPU (fastest measured parity-grade MLP:
    # Pallas fwd + XLA bwd, BENCH_NOTES.md round 3: +9% step throughput)
    # and 'dense' (plain XLA) elsewhere
    arg("--mlp_impl", type=str, default="auto",
        choices=["auto", "dense", "remat_g", "remat_all", "fused", "fbwd",
                 "fres", "lnfres"])
    # device-mesh layout (the reference's torchrun world, SURVEY.md 2.5):
    # data axis = DP (default all devices), model axis = optional TP headroom
    arg("--mesh_data", type=int, default=-1,
        help="mesh 'data' axis size; -1 = n_devices / mesh_model")
    arg("--mesh_model", type=int, default=1,
        help="mesh 'model' axis size (tensor parallelism)")
    # multi-process (multi-host) rendezvous, the torchrun surface of
    # run_pretrain_base.sh:75; on TPU pods jax.distributed autodetects and
    # none of these are needed. Env fallbacks: JAX_NUM_PROCESSES,
    # JAX_PROCESS_ID, JAX_COORDINATOR_ADDRESS.
    arg("--num_processes", type=int, default=None,
        help="total process count (WORLD_SIZE equivalent)")
    arg("--process_id", type=int, default=None,
        help="this process's id (RANK equivalent)")
    arg("--coordinator_address", type=str, default=None,
        help="host:port of process 0 (MASTER_ADDR:PORT equivalent)")
    return p


def mesh_from_args(args):
    """Initialize the distributed runtime and build the device mesh every
    runner trains over (replaces torchrun + init_distributed_mode,
    run_cavmae_pretrain_base.py:114 / utils.py:283-299)."""
    from avsiam_tpu.configs import MeshConfig
    from avsiam_tpu.parallel.dist import (initialize_multihost,
                                          setup_rank0_printing)
    from avsiam_tpu.parallel.mesh import make_mesh
    info = initialize_multihost(
        coordinator_address=getattr(args, "coordinator_address", None),
        num_processes=getattr(args, "num_processes", None),
        process_id=getattr(args, "process_id", None))
    setup_rank0_printing()
    mesh = make_mesh(MeshConfig(data=args.mesh_data, model=args.mesh_model))
    print(f"mesh: data={mesh.shape['data']} model={mesh.shape['model']} "
          f"processes={info['process_count']}")
    return mesh


def audio_config_from_args(args, train: bool,
                           num_mel_bins: int = 128) -> AudioConfig:
    return AudioConfig(
        target_length=args.target_length, num_mel_bins=num_mel_bins,
        norm_mean=args.dataset_mean, norm_std=args.dataset_std,
        freqm=args.freqm if train else 0, timem=args.timem if train else 0,
        mixup=args.mixup if train else 0.0,
        noise=bool(args.noise) if train else False)


def optimizer_from_args(args) -> OptimizerConfig:
    if getattr(args, "optim", "adam") == "sgd":
        # faithful to the reference: --optim is accepted but both loops
        # construct torch.optim.Adam unconditionally
        print("warning: --optim sgd accepted but ignored (the reference "
              "hard-codes Adam in its loops; so do we)")
    return OptimizerConfig(
        lr=args.lr, lrscheduler_start=args.lrscheduler_start,
        lrscheduler_step=args.lrscheduler_step,
        lrscheduler_decay=args.lrscheduler_decay,
        lr_adapt=bool(getattr(args, "lr_adapt", False)),
        lr_patience=getattr(args, "lr_patience", 2))


def dataset_from_args(args, path: str, train: bool, label_smooth: float = 0.0,
                      num_mel_bins: int = 128, im_res: int = 224,
                      num_frames: int = 10, frame_use: int = -1) -> AVDataset:
    return AVDataset(path, audio_config_from_args(args, train, num_mel_bins),
                     label_csv=args.label_csv, n_class=args.n_class,
                     mode="train" if train else "eval",
                     frame_source=args.frame_source, im_res=im_res,
                     num_frames=num_frames, frame_use=frame_use,
                     label_smooth=label_smooth if train else 0.0)


def dump_args(args, exp_dir: str):
    os.makedirs(exp_dir, exist_ok=True)
    with open(os.path.join(exp_dir, "args.json"), "w") as f:
        json.dump({k: v for k, v in vars(args).items()
                   if isinstance(v, (int, float, str, bool, type(None)))},
                  f, indent=1)


def jnp_dtype(name: str):
    import jax.numpy as jnp
    return jnp.bfloat16 if name == "bfloat16" else jnp.float32


def setup_wandb(args, project: str = "uavm"):
    """Shared --wandb env wiring: MetricsLogger attaches wandb when
    WANDB_PROJECT is set; 'uavm' is the reference's project name
    (run_cavmae_pretrain_base.py:118, run_cavmae_ft_base.py:157)."""
    if not getattr(args, "wandb", False):
        return
    os.environ.setdefault("WANDB_PROJECT", project)
    if getattr(args, "model_name", None):
        os.environ.setdefault("WANDB_NAME", args.model_name)


def balance_weights_from_args(args, n_samples: int):
    """Per-sample balanced-sampling weights, or None.

    Reference semantics: ONLY the literal --bal 'bal' activates balanced
    sampling (run_cavmae_ft_base.py:184 ``if args.bal == 'bal'``); the
    recipes pass the STRING "None" when off, which must not be truthy.
    The reference loads the weights CSV whenever bal is set
    (run_cavmae_ft_base.py:184-200) — silently training unweighted would
    change dynamics with no signal to the user, hence the loud failures.
    The length must match the training index exactly: a short file would
    silently zero the tail's sampling probability, a long one draws
    out-of-range dataset indices mid-epoch.
    """
    if args.bal == "bal":
        if not args.weight_file:
            raise SystemExit("--bal requires --weight_file (per-sample "
                             "balance weights CSV; scripts/gen_weights.py)")
        import numpy as np
        w = np.atleast_1d(np.loadtxt(args.weight_file, delimiter=","))
        if w.ndim != 1 or len(w) != n_samples:
            raise SystemExit(
                f"--weight_file {args.weight_file}: {w.shape} weights for "
                f"{n_samples} training samples — must be one weight per "
                "sample (regenerate with scripts/gen_weights.py)")
        return w
    if args.bal not in (None, "", "None", "none", "False"):
        print(f"warning: --bal {args.bal!r} != 'bal'; unbalanced sampling "
              "(reference semantics: only 'bal' activates)")
    if args.weight_file:
        print("warning: --weight_file given without --bal bal; weighted "
              "sampling is OFF")
    return None

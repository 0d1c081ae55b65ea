"""Standalone retrieval evaluation. Parity surface: src/retrieval.py.

Extracts per-modality embeddings with the finetune model's 'retrieval' mode
(audio tokens + frame-5 video tokens, cav_mae_base.py:920), mean-pools,
and reports R@1/R@5/R@10/MedianR in both directions; writes
retrieval_result.csv (retrieval.py:127-149).
"""

from __future__ import annotations

import argparse
import csv
import os

import numpy as np

from avsiam_tpu.cli.common import (add_common_args, audio_config_from_args,
                                   dataset_from_args, jnp_dtype)
from avsiam_tpu.configs import CAVMAEFTConfig
from avsiam_tpu.data.samplers import batched, eval_shard_indices
from avsiam_tpu.eval.retrieval import retrieval_metrics


def build_parser():
    p = argparse.ArgumentParser("avsiam-tpu retrieval")
    add_common_args(p, ft=False)
    p.add_argument("--pretrain_path", type=str, default="None")
    p.add_argument("--directions", type=str, default="audio,video")
    p.add_argument("--frame_use", type=int, default=5)
    return p


def extract_features(args, model_cfg: CAVMAEFTConfig, params, ds,
                     max_batches=None):
    import jax
    import jax.numpy as jnp
    from avsiam_tpu.data.dataset import make_eval_transform
    from avsiam_tpu.models import CAVMAEFinetune

    model = CAVMAEFinetune(model_cfg)
    transform = make_eval_transform(
        audio_config_from_args(args, train=False,
                               num_mel_bins=model_cfg.vit.mel_bins),
        im_res=model_cfg.vit.img_size)

    @jax.jit
    def feat(params, a, v):
        a_tok, v_tok = model.apply({"params": params}, a, v, "retrieval")
        return jnp.mean(a_tok, axis=1), jnp.mean(v_tok, axis=1)

    a_all, v_all = [], []
    idx_batches = batched(eval_shard_indices(len(ds)), args.batch_size,
                          drop_last=False)
    rng = np.random.RandomState(0)
    for bi, idx in enumerate(idx_batches):
        if max_batches and bi >= max_batches:
            break
        fb, img, _ = transform(*ds.batch(idx, rng, frames_per_sample=1))
        fa, fv = feat(params, fb, img)
        a_all.append(np.asarray(jax.device_get(fa)))
        v_all.append(np.asarray(jax.device_get(fv)))
    return np.concatenate(a_all), np.concatenate(v_all)


def main(argv=None):
    from avsiam_tpu.cli.common import apply_platform_override
    apply_platform_override()
    args = build_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    from avsiam_tpu.configs import replace
    from avsiam_tpu.models.variants import finetune_config
    model_cfg = finetune_config(args.model, label_dim=args.n_class,
                                dtype=jnp_dtype(args.dtype),
                                attn_impl=args.attn_impl,
                                mlp_impl=args.mlp_impl)
    model_cfg = replace(model_cfg, vit=replace(
        model_cfg.vit, audio_length=args.target_length))
    # loader-side frame selection (the reference's val_audio_conf
    # frame_use, retrieval.py:100-103): one frame decoded + encoded per clip
    ds = dataset_from_args(args, args.data_eval or args.data_val, train=False,
                           num_mel_bins=model_cfg.vit.mel_bins,
                           im_res=model_cfg.vit.img_size,
                           frame_use=args.frame_use)

    from avsiam_tpu.models import CAVMAEFinetune
    model = CAVMAEFinetune(model_cfg)
    rng = jax.random.PRNGKey(0)
    a = jnp.zeros((1, model_cfg.vit.audio_length, model_cfg.vit.mel_bins))
    v = jnp.zeros((1, 10, 3, model_cfg.vit.img_size, model_cfg.vit.img_size))
    params = jax.jit(lambda r, a, v: model.init(r, a, v, "retrieval"))(
        rng, a, v)["params"]
    if args.pretrain_path and args.pretrain_path != "None":
        if args.pretrain_path.endswith(".pth"):
            from avsiam_tpu.utils.torch_import import (import_cavmae_ft,
                                                       load_torch_checkpoint)
            sd = load_torch_checkpoint(args.pretrain_path)
            params, _, _ = import_cavmae_ft(sd, jax.device_get(params),
                                            depth=model_cfg.vit.depth)
        else:
            # orbax checkpoint from our pretrainer or finetuner
            from avsiam_tpu.utils.checkpoint import (
                restore_params_from_path, transfer_pretrain_to_ft)
            loaded = restore_params_from_path(args.pretrain_path)
            if "ast" in loaded or "decoder" in loaded:  # pretrain ckpt
                params = transfer_pretrain_to_ft(loaded,
                                                 jax.device_get(params))
            else:  # finetune ckpt: same tree
                params = loaded

    fa, fv = extract_features(args, model_cfg, params, ds)
    rows = []
    for direction in args.directions.split(","):
        m = retrieval_metrics(fa, fv, direction)
        print(f"{direction}: R@1 {m['R1']:.4f} R@5 {m['R5']:.4f} "
              f"R@10 {m['R10']:.4f} MR {m['MR']:.1f}")
        rows.append({"direction": direction, **m})
    os.makedirs(args.exp_dir, exist_ok=True)
    with open(os.path.join(args.exp_dir, "retrieval_result.csv"), "w",
              newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    return rows


if __name__ == "__main__":
    main()

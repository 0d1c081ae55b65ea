"""PyTorch checkpoint import: reference state_dicts -> avsiam_tpu param trees.

Covers three surfaces:
* ``import_cavmae_pretrain`` — a reference CAVMAE_BASE state_dict (optionally
  'module.'-prefixed from DDP, run_cavmae_ft_base.py:49-56
  ``remove_data_parallel``) -> CAVMAEPretrain params.
* ``import_cavmae_ft`` — CAVMAEFT_BASE state_dict -> CAVMAEFinetune params.
  Non-strict like the reference (run_cavmae_ft_base.py:243-258): missing keys
  keep their fresh init, extra keys are reported.
* ``vit_surgery_from_timm`` — a raw timm ViT-B state_dict -> SiameseViT
  params, replicating the reference's init-time weight surgery
  (cav_mae_base.py:236-303): per-block norms deep-copied into the _a/_v norm
  sets, audio patch embed = RGB-mean of the video one, audio pos embed =
  nearest-resample of the 196-token grid to 512 tokens, norm_a = copy of norm.

Tensor layout transforms:
* torch Linear weight [out, in] -> Dense kernel [in, out]
* patch-embed Conv2d weight [D, C, p, p] -> Dense kernel [(p, q, c), D]
  (matches ops/patchify.py token layout)
* LayerNorm weight/bias -> scale/bias under the 'ln' scope
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
from flax import traverse_util

from avsiam_tpu.models.pos_embed import interp_pos_embed_tokens


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def strip_module_prefix(sd: Dict) -> Dict:
    """DataParallel 'module.' prefix removal (run_cavmae_ft_base.py:49-56)."""
    return {(k[len("module."):] if k.startswith("module.") else k): v
            for k, v in sd.items()}


def linear(sd, prefix):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def layernorm(sd, prefix):
    return {"ln": {"scale": _np(sd[f"{prefix}.weight"]),
                   "bias": _np(sd[f"{prefix}.bias"])}}


def patch_embed(sd, prefix):
    w = _np(sd[f"{prefix}.proj.weight"])  # [D, C, p, p]
    kernel = w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0])
    return {"proj": {"kernel": kernel, "bias": _np(sd[f"{prefix}.proj.bias"])}}


def block(sd, prefix, norm_sets=("", "_a", "_v")):
    out = {}
    for s in norm_sets:
        for n in ("norm1", "norm2"):
            key = f"{prefix}.{n}{s}.weight"
            if key in sd:
                out[f"{n}{s}"] = layernorm(sd, f"{prefix}.{n}{s}")
    out["attn"] = {"qkv": linear(sd, f"{prefix}.attn.qkv"),
                   "proj": linear(sd, f"{prefix}.attn.proj")}
    out["mlp"] = {"fc1": linear(sd, f"{prefix}.mlp.fc1"),
                  "fc2": linear(sd, f"{prefix}.mlp.fc2")}
    return out


def _vit_trunk(sd, prefix: str, depth: int) -> Dict:
    """A surgically-modified trunk (vit_base / ast_base) from reference keys."""
    p = prefix
    tree = {
        "patch_embed": patch_embed(sd, f"{p}.patch_embed"),
        "patch_embed_a": patch_embed(sd, f"{p}.patch_embed_a"),
        "pos_embed": _np(sd[f"{p}.pos_embed"]),
        "pos_embed_a": _np(sd[f"{p}.pos_embed_a"]),
        "norm": layernorm(sd, f"{p}.norm"),
        "norm_a": layernorm(sd, f"{p}.norm_a"),
    }
    for i in range(depth):
        tree[f"blocks_{i}"] = block(sd, f"{p}.blocks.{i}")
    return tree


def import_cavmae_pretrain(sd: Dict, depth: int = 12,
                           decoder_depth: int = 8) -> Dict:
    """Reference CAVMAE_BASE state_dict -> CAVMAEPretrain params tree."""
    sd = strip_module_prefix(sd)
    params = {
        "vit": _vit_trunk(sd, "vit_base", depth),
        "ast": _vit_trunk(sd, "ast_base", depth),
        "mm_layer_1": block(sd, "mm_layer_1"),
        "mm_layer_2": block(sd, "mm_layer_2"),
        "decoder": {
            "embed": linear(sd, "decoder_embed"),
            "pos_embed_a": _np(sd["decoder_pos_embed_a"]),
            "pos_embed_v": _np(sd["decoder_pos_embed_v"]),
            "mask_token": _np(sd["mask_token"]),
            "modality_a": _np(sd["decoder_modality_a"]),
            "modality_v": _np(sd["decoder_modality_v"]),
            "norm": layernorm(sd, "decoder_norm"),
            "pred_a": linear(sd, "decoder_pred_a"),
            "pred_v": linear(sd, "decoder_pred_v"),
        },
    }
    for i in range(decoder_depth):
        params["decoder"][f"blocks_{i}"] = block(sd, f"decoder_blocks.{i}")
    return params


def mlp_head(sd, prefix):
    """nn.Sequential(LayerNorm, Linear): '.0' is the LN, '.1' the Linear."""
    return {"ln": layernorm(sd, f"{prefix}.0"),
            "linear": linear(sd, f"{prefix}.1")}


def import_cavmae_ft(sd: Dict, fresh_params: Dict, depth: int = 12
                     ) -> Tuple[Dict, list, list]:
    """Reference CAVMAEFT_BASE (or a pretrain ckpt, non-strict) state_dict
    merged over fresh CAVMAEFinetune params.

    Returns (params, missing_paths, unused_torch_keys). Mirrors the non-strict
    ``load_state_dict(strict=False)`` of run_cavmae_ft_base.py:243-258.
    """
    sd = strip_module_prefix(sd)
    imported = {"vit": _vit_trunk(sd, "vit_base", depth)}
    for name in ("mm_layer_1", "mm_layer_2"):
        if f"{name}.attn.qkv.weight" in sd:
            imported[name] = block(sd, name)
    for name in ("mlp_head", "mlp_head_a", "mlp_head_mm", "mlp_head_mm_v2"):
        if f"{name}.0.weight" in sd:
            imported[name] = mlp_head(sd, name)

    flat_new = traverse_util.flatten_dict(imported, sep="/")
    flat = dict(traverse_util.flatten_dict(fresh_params, sep="/"))
    missing = [k for k in flat if k not in flat_new]
    for k, v in flat_new.items():
        if k in flat:
            assert flat[k].shape == tuple(v.shape), \
                f"shape mismatch at {k}: {flat[k].shape} vs {v.shape}"
            flat[k] = v.astype(np.float32)
    used_prefixes = ("vit_base.", "mm_layer_", "mlp_head")
    unused = [k for k in sd if not k.startswith(used_prefixes)]
    return traverse_util.unflatten_dict(flat, sep="/"), missing, unused


def vit_surgery_from_timm(sd: Dict, depth: int = 12,
                          num_audio_tokens: int = 512) -> Dict:
    """Raw timm ViT-B/16 state_dict -> SiameseViT params via the reference's
    surgery (cav_mae_base.py:264-303)."""
    sd = strip_module_prefix(sd)
    pe = patch_embed(sd, "patch_embed")
    w = pe["proj"]["kernel"]  # [(p,q,c), D]
    p2 = w.shape[0] // 3
    # audio patch embed = mean over the channel axis of the (p,q,c) layout
    w_a = w.reshape(p2, 3, w.shape[1]).mean(axis=1)
    pos = _np(sd["pos_embed"])  # [1, 197, D]
    pos_a = np.asarray(interp_pos_embed_tokens(pos[:, 1:], num_audio_tokens))
    tree = {
        "patch_embed": pe,
        "patch_embed_a": {"proj": {"kernel": w_a,
                                   "bias": pe["proj"]["bias"].copy()}},
        "pos_embed": pos,
        "pos_embed_a": pos_a,
        "norm": layernorm(sd, "norm"),
        "norm_a": layernorm(sd, "norm"),  # copy (cav_mae_base.py:299)
    }
    for i in range(depth):
        b = block(sd, f"blocks.{i}", norm_sets=("",))
        # duplicate the pretrained norms into the modality sets (:264-269)
        for n in ("norm1", "norm2"):
            b[f"{n}_a"] = {"ln": {k: v.copy() for k, v in b[n]["ln"].items()}}
            b[f"{n}_v"] = {"ln": {k: v.copy() for k, v in b[n]["ln"].items()}}
        tree[f"blocks_{i}"] = b
    return tree


def build_pretrain_from_timm(sd: Dict, fresh_params: Dict, depth: int = 12,
                             num_audio_tokens: int = 512) -> Dict:
    """Initialize CAVMAEPretrain params from a timm ViT checkpoint exactly as
    the reference constructor does: vit = surgically-modified timm weights,
    ast = deepcopy(vit) (cav_mae_base.py:303), mm layers = copies of vit
    block 11 (:306-307), decoder keeps its fresh (zero/random) init."""
    import copy as _copy
    vit = vit_surgery_from_timm(sd, depth=depth,
                                num_audio_tokens=num_audio_tokens)
    params = dict(fresh_params)
    params["vit"] = vit
    params["ast"] = _copy.deepcopy(vit)
    params["mm_layer_1"] = _copy.deepcopy(vit[f"blocks_{depth - 1}"])
    params["mm_layer_2"] = _copy.deepcopy(vit[f"blocks_{depth - 1}"])
    return params


def load_torch_checkpoint(path: str) -> Dict:
    import torch
    return torch.load(path, map_location="cpu", weights_only=True)

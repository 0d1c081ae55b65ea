"""Checkpoint save/restore via Orbax.

TPU-native replacement for the reference's ``torch.save(state_dict)`` +
non-strict reload scheme (traintest_cavmae_base.py:227-234,
traintest_ft_base.py:253-264, run_cavmae_ft_base.py:243-258):

* per-epoch + best checkpoints under ``{exp_dir}/models/``
* cross-model reuse pretrain -> finetune via shared param subtree names
  ('vit', 'mm_layer_*'), mirroring the reference's shared-name state_dict
  reuse (traintest_cavmae_base.py:269-280)
* checkpoint weight averaging across an epoch range (``wa_model``,
  run_cavmae_ft_base.py:169-180)
* torch .pth import lives in utils/torch_import.py
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import traverse_util


def _path(exp_dir: str, name) -> str:
    return os.path.join(os.path.abspath(exp_dir), "models", str(name))


def save_params(exp_dir: str, name, params) -> str:
    """Save a param tree (e.g. 'audio_model.3' for epoch 3, 'best_audio_model')."""
    path = _path(exp_dir, name)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(params), force=True)
    return path


def restore_params(exp_dir: str, name, like=None):
    path = _path(exp_dir, name)
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                            jax.device_get(like))
            return ckptr.restore(path, target)
        return ckptr.restore(path)


def restore_params_from_path(path: str, like=None):
    """Restore a params dir given its FULL path (``<exp>/models/<name>``) —
    the single place that knows the exp-dir/models/name layout; every CLI's
    checkpoint loading goes through here."""
    exp_dir, name = os.path.split(path.rstrip("/"))
    exp_dir = os.path.dirname(exp_dir)  # strip 'models/'
    return restore_params(exp_dir, name, like=like)


def average_checkpoints(exp_dir: str, start_epoch: int, end_epoch: int,
                        like=None):
    """Uniform weight averaging over epoch checkpoints [start, end].
    Parity: wa_model (run_cavmae_ft_base.py:169-180)."""
    acc = None
    n = 0
    for e in range(start_epoch, end_epoch + 1):
        p = restore_params(exp_dir, f"audio_model.{e}", like=like)
        flat = traverse_util.flatten_dict(p, sep="/")
        if acc is None:
            acc = {k: np.asarray(v, dtype=np.float64) for k, v in flat.items()}
        else:
            for k in acc:
                acc[k] += np.asarray(flat[k], dtype=np.float64)
        n += 1
    assert n > 0
    out = {k: (v / n).astype(np.float32) for k, v in acc.items()}
    return traverse_util.unflatten_dict(out, sep="/")


def save_train_state(exp_dir: str, name, state) -> str:
    """Save a full train state (params + optimizer state(s) + step) for
    resume. Parity: the reference keeps ``best_optim_state.pth`` next to the
    model checkpoint (traintest_ft_base.py:256-258)."""
    path = _path(exp_dir, name)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(dict(state._asdict())), force=True)
    return path


def prune_train_states(exp_dir: str, keep: int) -> None:
    """Delete all but the ``keep`` newest ``train_state.{epoch}`` resume
    checkpoints under ``exp_dir/models``. Resume reads only the newest one
    (train/loops.py:_latest_train_state_epoch), and the reference keeps a
    single overwritten optim state file (traintest_cavmae_base.py:233), so
    pruning bounds the ~2.9 GB/epoch disk growth without losing anything a
    resume can use. ``keep <= 0`` keeps everything. Call from the main
    process only, after the epoch's save has completed."""
    if keep <= 0:
        return
    import re
    import shutil
    mdir = os.path.join(exp_dir, "models")
    if not os.path.isdir(mdir):
        return
    epochs = sorted(
        int(m.group(1)) for n in os.listdir(mdir)
        if (m := re.fullmatch(r"train_state\.(\d+)", n)))
    for e in epochs[:-keep] if keep < len(epochs) else []:
        shutil.rmtree(os.path.join(mdir, f"train_state.{e}"),
                      ignore_errors=True)


def restore_train_state(exp_dir: str, name, like):
    """Restore into the structure of ``like`` (a TrainState namedtuple)."""
    path = _path(exp_dir, name)
    target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                    jax.device_get(dict(like._asdict())))
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, target)
    return type(like)(**restored)


def transfer_pretrain_to_ft(pretrain_params: Dict, ft_params: Dict,
                            refresh_fusion: bool = False) -> Dict:
    """Load pretraining weights into a finetune model.

    Default (reference active path, run_cavmae_ft_base.py:248-257): the
    non-strict load carries the PRETRAIN checkpoint's mm_layer_1/2 into the
    FT model — ``__create_fusion__`` is commented out there. Pass
    ``refresh_fusion=True`` for the __create_fusion__ behavior
    (cav_mae_base.py:823-825): re-copy the fusion layers from encoder blocks
    10/11 of the transferred trunk.
    """
    import copy as _copy
    out = dict(ft_params)
    out["vit"] = jax.tree_util.tree_map(lambda x: x, pretrain_params["vit"])
    if refresh_fusion:
        depth = max(int(k.split("_")[1]) for k in out["vit"]
                    if k.startswith("blocks_")) + 1
        out["mm_layer_1"] = _copy.deepcopy(out["vit"][f"blocks_{depth - 2}"])
        out["mm_layer_2"] = _copy.deepcopy(out["vit"][f"blocks_{depth - 1}"])
    elif "mm_layer_1" in pretrain_params:
        out["mm_layer_1"] = pretrain_params["mm_layer_1"]
        out["mm_layer_2"] = pretrain_params["mm_layer_2"]
    return out

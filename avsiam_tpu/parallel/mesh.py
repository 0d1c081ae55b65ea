"""Device mesh construction and sharding rules.

The reference's only parallelism is multi-node data-parallel over NCCL
(SURVEY.md section 2.5). TPU-natively, that maps to a 2D ``Mesh(('data',
'model'))``: batches shard over 'data' (gradient psum + contrastive all-gather
ride ICI), and the optional 'model' axis gives Megatron-style tensor
parallelism of the attention/MLP weights for larger variants (ViT-H) — XLA
inserts the all-reduces from the param shardings alone (GSPMD).
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from avsiam_tpu.configs import MeshConfig
from avsiam_tpu.train.param_groups import label_tree

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: Optional[MeshConfig] = None, devices=None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    avail = len(devices)
    model = max(1, cfg.model)
    data = cfg.data if cfg.data > 0 else avail // model
    n = data * model
    assert n <= avail, f"mesh {data}x{model} needs {n} > {avail} devices"
    devices = devices[:n]  # explicit sub-meshes (e.g. 1x1 on an 8-CPU host)
    if n == 1:
        arr = np.array(devices).reshape(1, 1)
    else:
        arr = mesh_utils.create_device_mesh((data, model), devices=devices)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for input batches."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


_TP_RULES = (
    # Megatron attention/MLP sharding: column-parallel qkv/fc1 (output dim),
    # row-parallel proj/fc2 (input dim). Biases follow the output dim.
    (re.compile(r"attn/qkv/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r"attn/qkv/bias$"), P(MODEL_AXIS)),
    (re.compile(r"attn/proj/kernel$"), P(MODEL_AXIS, None)),
    (re.compile(r"mlp/fc1/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r"mlp/fc1/bias$"), P(MODEL_AXIS)),
    (re.compile(r"mlp/fc2/kernel$"), P(MODEL_AXIS, None)),
)


def param_pspec(path: str) -> P:
    for pat, spec in _TP_RULES:
        if pat.search(path):
            return spec
    return P()


def param_shardings(mesh: Mesh, params):
    """NamedSharding tree for a param tree: TP rules if the mesh has a
    nontrivial 'model' axis, fully replicated otherwise."""
    if mesh.shape[MODEL_AXIS] == 1:
        return jax.tree_util.tree_map(lambda _: replicated(mesh), params)
    return label_tree(params, lambda p: NamedSharding(mesh, param_pspec(p)))

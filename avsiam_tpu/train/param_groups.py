"""Parameter-path predicates: per-pass touched sets and finetune LR groups.

The reference relies on DDP(find_unused_parameters=True)
(traintest_cavmae_base.py:59) so each optimizer pass only updates parameters
reachable from that pass's loss. JAX gradients are functional — untouched
parameters get exact zero gradients, which would still advance Adam moments and
apply weight decay. We reproduce the skip-update semantics with
``optax.masked`` over these statically-derived touched sets (verified against
auto-derived nonzero-gradient patterns in tests/test_param_groups.py).

Path convention: '/'-joined flax param paths, e.g.
``vit/blocks_3/attn/qkv/kernel``.
"""

from __future__ import annotations

import re
from typing import Callable, Dict

import jax
from flax import traverse_util

_BLOCK_SHARED_NORM = re.compile(r"blocks_\d+/norm[12]/")
_BLOCK_MOD_NORM = re.compile(r"blocks_\d+/norm[12]_[av]/")
_NORM_PLAIN = re.compile(r"(^|/)norm[12]/")
_NORM_V = re.compile(r"(^|/)norm[12]_v/")
_NORM_A = re.compile(r"(^|/)norm[12]_a/")


def touched_contrastive(path: str) -> bool:
    """Pass 1 (mmixed contrastive, cav_mae_base.py:508-594,722-729): only the
    vit trunk is used, with 'a'/'v' norm routing (shared norms unused)."""
    if not path.startswith("vit/"):
        return False
    return not _BLOCK_SHARED_NORM.search(path)


def touched_mae(path: str) -> bool:
    """Pass 2 (MAE, cav_mae_base.py:441-504,694-707): vit embeds + video 'v'
    blocks + vit.norm; ast blocks with SHARED norms + ast.norm_a; mm layers
    with 'a' norms; full decoder (blocks use shared norms)."""
    if path.startswith("vit/"):
        if _BLOCK_SHARED_NORM.search(path) or _BLOCK_MOD_NORM.search(path):
            # block norms: only norm{1,2}_v are on the video path
            return bool(_NORM_V.search(path))
        if path.startswith("vit/norm_a/"):
            return False  # audio final norm comes from ast in this pass
        return True
    if path.startswith("ast/"):
        if "patch_embed" in path or "pos_embed" in path:
            return False  # embeddings always computed via vit
        if _BLOCK_MOD_NORM.search(path):
            return False  # ast blocks run with modality=None
        if path.startswith("ast/norm/"):
            return False  # ast.norm (video) never used
        return True
    if path.startswith("mm_layer_"):
        if _NORM_PLAIN.search(path) or _NORM_V.search(path):
            return False  # mm layers run with 'a' norms
        return True
    if path.startswith("decoder/"):
        return not _BLOCK_MOD_NORM.search(path)  # decoder blocks run shared
    return False


def ft_touched(path: str, branch: str) -> bool:
    """Finetune mm_grad touched sets per stochastic loss branch
    (traintest_ft_base.py:149-157 under find_unused_parameters=True):
    'av' -> fused path (both encoder routes + mm layers + mlp_head_mm),
    'a' -> audio route + mlp_head_a, 'v' -> video route + mlp_head."""
    if path.startswith("mlp_head_mm_v2"):
        return False  # dead head, never in any loss graph
    if path.startswith("mlp_head_mm"):
        return branch == "av"
    if path.startswith("mlp_head_a"):
        return branch == "a"
    if path.startswith("mlp_head/"):
        return branch == "v"
    if path.startswith("mm_layer"):
        # mm layers run with 'a' norms (cav_mae_base.py:1020-1021)
        return branch == "av" and not (_NORM_PLAIN.search(path)
                                       or _NORM_V.search(path))
    if path.startswith("vit/"):
        audio_part = (path.startswith("vit/patch_embed_a/")
                      or path == "vit/pos_embed_a"
                      or path.startswith("vit/norm_a/")
                      or bool(_NORM_A.search(path)))
        video_part = (path.startswith("vit/patch_embed/")
                      or path == "vit/pos_embed"
                      or path.startswith("vit/norm/")
                      or bool(_NORM_V.search(path)))
        shared_norm = bool(_BLOCK_SHARED_NORM.search(path))
        shared_weight = not (audio_part or video_part or shared_norm)
        if branch == "av":
            return not shared_norm
        if branch == "a":
            return audio_part or shared_weight
        return video_part or shared_weight
    return False


def ft_group(path: str) -> str:
    """Finetune 3-group LR labeling (traintest_ft_base.py:50-83):
    'mlp' for mlp_head* params, 'mm' for mm_layer* params, 'base' otherwise.
    """
    top = path.split("/", 1)[0]
    if top.startswith("mlp_head"):
        return "mlp"
    if top.startswith("mm_layer"):
        return "mm"
    return "base"


def label_tree(params, fn: Callable[[str], object]):
    """Map a path->label function over a nested param dict."""
    flat = traverse_util.flatten_dict(params, sep="/")
    labeled = {k: fn(k) for k in flat}
    return traverse_util.unflatten_dict(labeled, sep="/")


def mask_tree(params, predicate: Callable[[str], bool]):
    return label_tree(params, predicate)


def derive_touched_mask(grads) -> Dict:
    """Auto-derivation used by tests: leaf -> True iff any element nonzero."""
    return jax.tree_util.tree_map(lambda g: bool((abs(g) > 0).any()), grads)

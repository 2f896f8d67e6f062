"""Model introspection: intermediate-activation capture and parameter
inventory.

Functional replacement for the reference's Keras-graph introspection
(``run_graph`` mrcnn/model.py:2786-2851, ``get_trainable_layers``
mrcnn/model.py:2858-2872, ``ancestor`` mrcnn/model.py:2826-2843): flax's
``capture_intermediates`` hands back every submodule's outputs by path, and
the param tree itself is the layer inventory.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def run_graph(
    model,
    variables: Dict,
    images,
    method=None,
    filter_regex: Optional[str] = None,
    train: bool = False,
) -> Dict[str, Any]:
    """Run a forward method capturing every intermediate activation.

    Returns {path: array} for each submodule output whose path matches
    ``filter_regex`` (all if None) — the TPU analogue of the reference's
    named-tensor fetch (mrcnn/model.py:2786-2851).
    """
    from .mask_rcnn import MaskRCNN

    method = method or MaskRCNN.features
    out, state = model.apply(
        variables, images, train, method=method, capture_intermediates=True
    )
    flat: Dict[str, Any] = {}

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}/{k}" if prefix else str(k))
        elif isinstance(tree, (tuple, list)):
            for i, v in enumerate(tree):
                walk(v, f"{prefix}[{i}]")
        else:
            flat[prefix] = tree

    walk(state.get("intermediates", {}))
    if filter_regex:
        pat = re.compile(filter_regex)
        flat = {k: v for k, v in flat.items() if pat.search(k)}
    return {"outputs": out, "intermediates": flat}


def get_trainable_layers(params, layers: str = "all") -> List[str]:
    """Parameter paths that train under a stage selector
    (reference: mrcnn/model.py:2858-2872)."""
    from ..train.trainer import trainable_mask

    mask = trainable_mask(params, layers)
    out = []
    for path, v in jax.tree_util.tree_leaves_with_path(mask):
        if v:
            out.append("/".join(str(getattr(k, "key", k)) for k in path))
    return sorted(set(out))


def count_params(params) -> Dict[str, int]:
    """Total + per-top-level-module parameter counts."""
    counts: Dict[str, int] = {"total": 0}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        top = str(getattr(path[0], "key", path[0]))
        n = int(np.prod(np.asarray(leaf).shape))
        counts[top] = counts.get(top, 0) + n
        counts["total"] += n
    return counts

"""Checkpoint save/restore with by-name partial loading.

Replaces the reference's Keras h5 weight files and ``load_weights(by_name,
exclude=...)`` semantics (reference: mrcnn/model.py:2168-2239, 2357-2393):

* epoch-stamped checkpoints ``mask_rcnn_<name>_NNNN`` under a run dir;
* :func:`find_last` locates the newest checkpoint;
* :func:`partial_restore` merges a stored param tree into freshly
  initialized params by path name, skipping excluded patterns and
  shape-mismatched leaves (the mechanism behind retraining with a
  different class count or input channel count,
  reference usage: scripts/run.py:1737-1740).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from .. import logger


def checkpoint_name(model_name: str, epoch: int) -> str:
    return f"mask_rcnn_{model_name.lower()}_{epoch:04d}"


def save_checkpoint(ckpt_dir: str, model_name: str, epoch: int, variables: Dict) -> str:
    """Save the variable tree (params [+ batch_stats]) for one epoch."""
    path = os.path.abspath(os.path.join(ckpt_dir, checkpoint_name(model_name, epoch)))
    ckptr = ocp.StandardCheckpointer()
    host_vars = jax.tree_util.tree_map(np.asarray, variables)
    ckptr.save(path, host_vars, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str) -> Dict:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def restore_weights(
    variables: Dict, path: str, exclude: Optional[Sequence[str]] = None
) -> Tuple[Dict, List[str], List[str]]:
    """Restore weights into an initialized tree from either an orbax
    checkpoint directory or a reference-format Keras ``.h5`` file.

    The reference's ``load_weights(filepath, by_name=True, exclude=...)``
    accepts the published ``.h5`` artifacts directly (reference:
    mrcnn/model.py:2197-2239, used at scripts/run.py:1737-1740 and
    scripts/train_all.py:475-488) — this is the equivalent single entry
    point behind every ``--weights`` CLI flag. Returns
    ``(merged_variables, loaded_names, skipped_names)``.
    """
    if path.endswith((".h5", ".hdf5")):
        from .keras_import import restore_from_keras_h5

        return restore_from_keras_h5(variables, path, exclude=exclude)
    stored = load_checkpoint(path)
    return partial_restore(variables, stored, exclude=exclude)


def find_last(ckpt_dir: str) -> Optional[str]:
    """Newest checkpoint in a run dir (reference: mrcnn/model.py:2168-2195)."""
    if not os.path.isdir(ckpt_dir):
        return None
    names = sorted(
        n
        for n in os.listdir(ckpt_dir)
        if n.startswith("mask_rcnn_") and not n.endswith("_state")
    )
    return os.path.join(ckpt_dir, names[-1]) if names else None


def epoch_from_path(path: str) -> int:
    """Parse the epoch counter out of a checkpoint path for resume
    (reference set_log_dir regex: mrcnn/model.py:2357-2383)."""
    m = re.search(r"mask_rcnn_[\w\-.]+_(\d{4})", os.path.basename(path.rstrip("/")))
    return int(m.group(1)) if m else 0


def save_train_state(ckpt_dir: str, model_name: str, epoch: int, state) -> str:
    """Save the FULL TrainState (params, batch_stats, optimizer state,
    step) for exact resume — an improvement over the reference's
    weights-only checkpoints (reference: mrcnn/model.py:2461-2462, which
    reset optimizer moments on resume)."""
    import jax

    path = os.path.abspath(
        os.path.join(ckpt_dir, checkpoint_name(model_name, epoch) + "_state")
    )
    payload = {
        "step": np.asarray(state.step),
        "params": jax.tree_util.tree_map(np.asarray, state.params),
        "batch_stats": jax.tree_util.tree_map(np.asarray, state.batch_stats),
        "opt_state": jax.tree_util.tree_map(np.asarray, state.opt_state),
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def load_train_state(path: str, template_state):
    """Restore a TrainState saved by :func:`save_train_state`. The
    template (a freshly-created TrainState with the same config) provides
    the tree structure for the optimizer state."""
    import jax

    template = {
        "step": np.asarray(template_state.step),
        "params": jax.tree_util.tree_map(np.asarray, template_state.params),
        "batch_stats": jax.tree_util.tree_map(np.asarray, template_state.batch_stats),
        "opt_state": jax.tree_util.tree_map(np.asarray, template_state.opt_state),
    }
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), template)
    return type(template_state)(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(template_state.opt_state),
            jax.tree_util.tree_leaves(restored["opt_state"]),
        ),
    )


def _flatten(tree: Any, prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}" if prefix else str(k)))
    else:
        out[prefix] = tree
    return out


def partial_restore(
    init_variables: Dict,
    stored_variables: Dict,
    exclude: Optional[Sequence[str]] = None,
    verbose: bool = True,
) -> Tuple[Dict, List[str], List[str]]:
    """Merge stored leaves into init variables by path name.

    Skips paths matching any ``exclude`` regex and leaves whose shapes
    disagree (logged). Returns (merged, loaded_paths, skipped_paths).
    """
    exclude = [re.compile(p) for p in (exclude or [])]
    stored_flat = _flatten(stored_variables)
    loaded: List[str] = []
    skipped: List[str] = []

    def merge(init_tree: Any, prefix: str = "") -> Any:
        if isinstance(init_tree, dict):
            return {
                k: merge(v, f"{prefix}/{k}" if prefix else str(k))
                for k, v in init_tree.items()
            }
        path = prefix
        if any(p.search(path) for p in exclude):
            skipped.append(path)
            return init_tree
        if path not in stored_flat:
            skipped.append(path)
            return init_tree
        stored_leaf = stored_flat[path]
        if hasattr(init_tree, "shape") and tuple(stored_leaf.shape) != tuple(init_tree.shape):
            skipped.append(path)
            return init_tree
        loaded.append(path)
        return np.asarray(stored_leaf, dtype=init_tree.dtype) if hasattr(init_tree, "dtype") else stored_leaf

    merged = merge(init_variables)
    if verbose:
        logger.info("partial_restore: loaded %d leaves, skipped %d", len(loaded), len(skipped))
        for s in skipped[:20]:
            logger.debug("  skipped: %s", s)
    return merged, loaded, skipped

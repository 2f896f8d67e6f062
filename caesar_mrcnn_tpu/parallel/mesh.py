"""Data parallelism over a jax device mesh.

Replaces the reference's in-graph Keras multi-GPU ``ParallelModel``
(reference: mrcnn/parallel_model.py:30-104 — CPU-side input split, per-GPU
towers, CPU merge) with the TPU-native formulation: a 1-D ``Mesh`` over the
``data`` axis, batch arrays sharded with ``NamedSharding``, parameters
replicated, and gradient reduction performed by XLA-inserted collectives
over ICI when the jitted train step consumes sharded inputs and produces
replicated outputs.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the first n) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch dict onto the mesh, sharded along the batch axis.

    The per-device slice count must divide the global batch
    (the ``IMAGES_PER_GPU * GPU_COUNT`` contract,
    reference: mrcnn/config.py:227).
    """
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)

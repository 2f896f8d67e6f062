"""Multi-host communication for host-side (Python object) data.

Replaces the reference's mpi4py usage (reference: scripts/run.py:71-81
import-time init, mrcnn/sfinder.py:940-988 pickled send/recv gather,
Barrier calls at sfinder.py:556,632,955,986) with jax.distributed over DCN:

* :class:`SerialComm` — the graceful single-process fallback (the
  reference's MPI-absent mode, scripts/run.py:76-81);
* :class:`JaxDistComm` — object gather via pickled uint8 arrays through
  ``multihost_utils.process_allgather``, barriers via
  ``sync_global_devices``.

Device-side collectives (gradient psum etc.) never pass through here —
they are XLA collectives over ICI inside jitted programs (parallel/mesh.py).
"""

from __future__ import annotations

import pickle
from typing import Any, List, Optional

import numpy as np

from .. import logger


class SerialComm:
    """Single-process no-op communicator."""

    rank = 0
    size = 1

    def barrier(self) -> None:
        pass

    def gather(self, obj: Any) -> Optional[List[Any]]:
        """Gather to rank 0; returns list on master, None elsewhere."""
        return [obj]

    def allgather(self, obj: Any) -> List[Any]:
        return [obj]


class JaxDistComm:
    """Multi-host communicator over jax.distributed (DCN).

    Requires ``jax.distributed.initialize()`` to have been called by the
    launcher. Objects are pickled into padded uint8 arrays and exchanged
    with ``process_allgather``.
    """

    def __init__(self):
        import jax

        self._jax = jax
        self.rank = jax.process_index()
        self.size = jax.process_count()

    def barrier(self) -> None:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("caesar_mrcnn_tpu.barrier")

    def allgather(self, obj: Any) -> List[Any]:
        from jax.experimental import multihost_utils

        payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
        # 1) agree on max length
        lengths = multihost_utils.process_allgather(
            np.array([payload.size], dtype=np.int64)
        ).reshape(-1)
        max_len = int(lengths.max())
        padded = np.zeros(max_len, dtype=np.uint8)
        padded[: payload.size] = payload
        # 2) exchange payloads
        gathered = multihost_utils.process_allgather(padded)
        gathered = np.asarray(gathered).reshape(self.size, max_len)
        return [
            pickle.loads(gathered[i, : int(lengths[i])].tobytes())
            for i in range(self.size)
        ]

    def gather(self, obj: Any) -> Optional[List[Any]]:
        out = self.allgather(obj)
        return out if self.rank == 0 else None


def get_comm():
    """Best communicator for this process: multi-host when initialized,
    serial otherwise."""
    try:
        import jax

        if jax.process_count() > 1:
            return JaxDistComm()
    except Exception:  # noqa: BLE001
        logger.debug("jax.distributed not initialized; using SerialComm")
    return SerialComm()

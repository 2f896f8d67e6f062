"""Subprocess worker for the two-PROCESS data-parallel TRAIN test.

Launched by tests/test_parallel.py::test_dp_train_two_processes as
``python tests/dp_train_worker.py <port> <process_id>``. Each of the two
processes exposes 4 virtual CPU devices and joins ``jax.distributed``, so
the 1-D data mesh spans 8 devices across 2 processes; one sharded train
step runs with gradient reduction crossing the process boundary (the
multi-host extension of the reference's single-process in-graph DP,
reference: mrcnn/parallel_model.py:30-104; SURVEY.md §2.3 DP row).

Prints ``DP_TRAIN_<pid>_OK total_loss=<value>``; the parent test asserts
both ranks agree with each other and with the single-process 8-device run
of the identical problem.
"""

import os
import sys

port, pid = sys.argv[1], int(sys.argv[2])

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax  # noqa: E402

# The env var alone is overridden by the axon plugin (CLAUDE.md gotcha).
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
assert jax.local_device_count() == 4 and jax.device_count() == 8

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__ as ge  # noqa: E402
from caesar_mrcnn_tpu.parallel.mesh import make_mesh  # noqa: E402
from caesar_mrcnn_tpu.train.trainer import make_train_step  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

mesh = make_mesh()  # 8 GLOBAL devices: 4 local + 4 on the peer process


def to_global(x, spec):
    """Host array (identical on both processes) -> global jax.Array."""
    x = np.asarray(x)
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


# Establish the 8-device Gloo clique NOW, immediately after initialize()
# (which is itself a connect barrier, so inter-process skew here is ~1 s —
# just this trivial jit). Anything heavier first (model init used to run
# here) can skew the two workers past Gloo's 30 s GetKeyValue deadline on
# a contended 1-CPU host; the context created here is cached and reused
# by the train step's reductions.
_warm = jax.jit(
    lambda x: x.sum(),
    in_shardings=NamedSharding(mesh, P("data")),
    out_shardings=NamedSharding(mesh, P()),
)
np.asarray(_warm(to_global(np.ones(8, np.float32), P("data"))))

cfg, model, state, tx, anchors, batch = ge.build_tiny_train_problem(8)
step = make_train_step(model, tx, anchors, mesh=mesh)
state_g = jax.tree_util.tree_map(lambda x: to_global(x, P()), state)
batch_g = {k: to_global(v, P("data")) for k, v in batch.items()}
rng_g = to_global(np.asarray(jax.random.PRNGKey(1)), P())

with mesh:
    new_state, losses = step(state_g, batch_g, rng_g)
    total = float(np.asarray(losses["total_loss"]))
    # the optimizer state advanced identically on both processes
    step_no = int(np.asarray(new_state.step))

assert np.isfinite(total), total
assert step_no == 1
print(f"DP_TRAIN_{pid}_OK total_loss={total:.6f}")

"""Data parallelism over the virtual 8-device CPU mesh + comm abstraction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caesar_mrcnn_tpu.parallel.dist import SerialComm, get_comm
from caesar_mrcnn_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_tree,
    shard_batch,
)


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.shape == (8,)
    assert mesh.axis_names == ("data",)


def test_shard_batch_places_on_axis():
    mesh = make_mesh()
    batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
    sharded = shard_batch(batch, mesh)
    shard_shapes = [s.data.shape for s in sharded["x"].addressable_shards]
    assert all(s == (1, 2) for s in shard_shapes)
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])


def test_sharded_reduction_matches_serial():
    """A jitted mean over a sharded batch equals the host mean — XLA inserts
    the cross-device reduction (the DP-gradient pattern)."""
    mesh = make_mesh()
    x = np.random.RandomState(0).rand(8, 64).astype(np.float32)
    xs = shard_batch({"x": x}, mesh)["x"]

    f = jax.jit(lambda a: jnp.mean(a * a))
    out = float(f(xs))
    assert abs(out - float(np.mean(x * x))) < 1e-6


def test_dp_train_step_on_mesh():
    """Full sharded Mask R-CNN train step on 8 virtual devices (the
    ParallelModel replacement; smoke-test role of the reference's MNIST
    __main__, reference: mrcnn/parallel_model.py:107-175)."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_serial_comm():
    comm = SerialComm()
    assert comm.gather({"a": 1}) == [{"a": 1}]
    assert comm.allgather(5) == [5]
    comm.barrier()


def test_get_comm_falls_back_serial():
    comm = get_comm()
    assert comm.size == 1  # single-process test environment


def test_jaxdistcomm_two_processes(tmp_path):
    """JaxDistComm with process_count=2 for real: two CPU subprocesses join
    via jax.distributed (Gloo) and round-trip unequal-size pickled objects
    through allgather/gather/barrier — the path the tiled multi-host merge
    uses (reference: mrcnn/sfinder.py:940-988)."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:  # free port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "dcn_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=180)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"DCN_WORKER_{i}_OK" in out

"""Subprocess worker for the two-process tiled SFinder test.

Launched as ``python tests/dcn_sfinder_worker.py <port> <process_id>
<workdir>``. Runs the COMPLETE distributed tiled source-finding path
(reference run_parallel: mrcnn/sfinder.py:549-636): round-robin tile
ownership across 2 real processes, per-rank tile detection with a
threshold fake detector, pickled catalog gather to rank 0 over
jax.distributed, and the cross-tile merge of a boundary-straddling
source on the master.
"""

import os
import sys

port, pid, workdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # axon plugin gotcha (CLAUDE.md)
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "tests"))

from caesar_mrcnn_tpu.analysis.sfinder import SFinder  # noqa: E402
from caesar_mrcnn_tpu.config import detector_config  # noqa: E402
from caesar_mrcnn_tpu.parallel.dist import JaxDistComm  # noqa: E402
from caesar_mrcnn_tpu.utils import fits as F  # noqa: E402
from test_sfinder import FakeDetector  # noqa: E402

os.chdir(workdir)
mosaic = os.path.join(workdir, "mosaic.fits")
if pid == 0:
    rng = np.random.RandomState(0)
    data = rng.normal(0.0, 0.01, (256, 256)).astype(np.float32)
    data[40:60, 40:60] += 10.0      # blob A inside tile (0, 0)
    data[100:120, 120:140] += 10.0  # blob B straddles the x=128 boundary
    F.write_fits(data, mosaic, header={
        "CRPIX1": 128.0, "CRPIX2": 128.0, "CRVAL1": 150.0, "CRVAL2": 2.0,
        "CDELT1": -2.8e-4, "CDELT2": 2.8e-4, "BMAJ": 1.5e-3, "BMIN": 1.2e-3,
    })

cfg = detector_config(
    num_classes=4,
    class_names=("bkg", "sidelobe", "source", "galaxy"),
    score_thr=0.5,
    images_per_device=2,
    num_devices=1,
    split_img_in_tiles=True,
    tile_xsize=128,
    tile_ysize=128,
)
comm = JaxDistComm()
assert comm.size == 2 and comm.rank == pid
comm.barrier()  # mosaic written before anyone reads

sf = SFinder(FakeDetector(), cfg, comm=comm)
catalog = sf.run_tiled(mosaic)

if pid == 0:
    objs = catalog["objs"]
    assert len(objs) == 2, [o.get("name") for o in objs]
    merged = [o for o in objs if o.get("merged")]
    assert len(merged) == 1 and merged[0]["n_merged"] == 2
    assert merged[0]["x1"] == 120 and merged[0]["x2"] == 139
    assert os.path.isfile(f"catalog_{sf.image_id}.json")
else:
    assert catalog == {}  # non-master ranks return nothing

comm.barrier()
print(f"SFINDER_WORKER_{pid}_OK")

"""caesar_mrcnn_tpu — TPU-native radio-astronomy source detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
SKA-INAF/caesar-mrcnn (Mask R-CNN instance segmentation of radio objects in
FITS images) built for TPU hardware: statically-shaped jit-compiled model
graph, vmap-batched per-image logic, Pallas/XLA kernels for NMS and ROIAlign,
and pjit/Mesh data parallelism.

Reference behavior parity targets are documented per-module with
``/root/reference/<path>:<line>`` citations.
"""

import logging

__version__ = "0.1.0"

# Module-level logger mirroring the reference's global logger
# (reference: mrcnn/__init__.py:11-19).
logger = logging.getLogger("caesar_mrcnn_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)s - %(message)s", "%Y-%m-%d %H:%M:%S")
    )
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)

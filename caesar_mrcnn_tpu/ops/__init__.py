"""Device kernels: static-shape NMS and multilevel ROIAlign."""

from .nms import nms_padded  # noqa: F401
from .roi_align import crop_and_resize, multilevel_roi_align  # noqa: F401

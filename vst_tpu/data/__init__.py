"""Data pipeline (layer L4): flow file I/O, datasets, host→device prefetch.

Design difference vs the reference: datasets are plain-Python index + load
logic returning NHWC numpy arrays; occlusion masks CAN be computed host-side
(numpy, for parity) but the recommended path computes them in-graph on
device (vst_tpu.ops.flow_warp_mask) so training never bounces flow math
through CPU workers.
"""

from vst_tpu.data import flowio
from vst_tpu.data.flow_np import flow_warp_mask_np, resize_flow_np
from vst_tpu.data.pipeline import BatchLoader, device_prefetch

__all__ = [
    "flowio",
    "flow_warp_mask_np",
    "resize_flow_np",
    "BatchLoader",
    "device_prefetch",
]

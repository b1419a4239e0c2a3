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
from vst_tpu.data.datasets import (
    Coco2014,
    CocoWikiArt,
    FlyingThings3D,
    ImageFolderCrop,
    Monkaa,
    SceneFlowCombined,
    VidevoFlow,
    VidevoFrames,
    VidevoWikiArt,
    calculate_optical_flow,
    get_frames,
)
from vst_tpu.data.flowio import (
    read_flo,
    read_float3,
    read_pfm,
    read_sintel_flo,
    write_flo,
    write_pfm,
)

__all__ = [
    "flowio",
    "flow_warp_mask_np",
    "resize_flow_np",
    "BatchLoader",
    "device_prefetch",
    "Coco2014",
    "CocoWikiArt",
    "FlyingThings3D",
    "ImageFolderCrop",
    "Monkaa",
    "SceneFlowCombined",
    "VidevoFlow",
    "VidevoFrames",
    "VidevoWikiArt",
    "calculate_optical_flow",
    "get_frames",
    "read_flo",
    "read_float3",
    "read_pfm",
    "read_sintel_flo",
    "write_flo",
    "write_pfm",
]

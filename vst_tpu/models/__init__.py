"""Stylization models and frozen feature extractors (layers L1/L2).

All models are pure functions over flat parameter dicts whose keys are the
reference implementation's PyTorch ``state_dict`` names (values stored in
TPU-native layouts: conv weights HWIO).  This makes reference ``.pth``
checkpoints convert losslessly — see vst_tpu/compat.
"""

from vst_tpu.models import vgg, reconet, rtnstv, adaattn

__all__ = ["vgg", "reconet", "rtnstv", "adaattn"]

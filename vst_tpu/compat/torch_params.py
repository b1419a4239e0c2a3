"""Array-layout conversion between torch state_dicts and vst_tpu params.

vst_tpu params use the SAME key names as the reference models' torch
``state_dict``s, so conversion is purely a per-array layout change:

- Conv2d weights:          torch OIHW ↔ ours HWIO
- ConvTranspose2d weights: torch (I, O, kh, kw) ↔ ours HWIO, spatially
  flipped (ready for the input-dilated-conv formulation in
  vst_tpu.ops.conv_transpose2d)
- everything else (biases, InstanceNorm affine): unchanged

The only ConvTranspose2d layers in the whole suite are RTNSTV's Deconv
blocks (RTNSTV/network.py:48-60), whose keys contain ".deconv." — that is
the default transpose-detection rule.
"""

from collections.abc import Callable

import numpy as np


def _default_is_transpose(key: str) -> bool:
    return ".deconv." in key


def torch_to_jax_arrays(
    state: dict,
    is_transpose: Callable[[str], bool] = _default_is_transpose,
) -> dict:
    """Convert a torch state_dict (tensors or ndarrays) to vst_tpu layout."""
    out = {}
    for key, val in state.items():
        arr = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val)
        if arr.ndim == 4:
            if is_transpose(key):
                arr = arr[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()
            else:
                arr = arr.transpose(2, 3, 1, 0).copy()
        out[key] = arr
    return out


def jax_to_torch_arrays(
    params: dict,
    is_transpose: Callable[[str], bool] = _default_is_transpose,
) -> dict:
    """Convert vst_tpu params to torch state_dict layout (numpy arrays)."""
    out = {}
    for key, val in params.items():
        arr = np.asarray(val)
        if arr.ndim == 4:
            if is_transpose(key):
                arr = arr.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1].copy()
            else:
                arr = arr.transpose(3, 2, 0, 1).copy()
        out[key] = arr
    return out


def load_pth(path: str, **kwargs) -> dict:
    """Load a torch ``.pth`` state_dict and convert to vst_tpu params."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return torch_to_jax_arrays(state, **kwargs)


def save_pth(params: dict, path: str, **kwargs) -> None:
    """Save vst_tpu params as a torch-loadable ``.pth`` state_dict."""
    import torch

    state = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in jax_to_torch_arrays(params, **kwargs).items()}
    torch.save(state, path)

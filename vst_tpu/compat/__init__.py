"""PyTorch interop: ``.pth`` checkpoints ↔ vst_tpu param dicts.

North-star requirement (BASELINE.md): reference checkpoints must work
unchanged through converters.
"""

from vst_tpu.compat.torch_params import (
    jax_to_torch_arrays,
    torch_to_jax_arrays,
    load_pth,
    save_pth,
)

__all__ = [
    "jax_to_torch_arrays",
    "torch_to_jax_arrays",
    "load_pth",
    "save_pth",
]

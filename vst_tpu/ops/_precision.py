"""Matmul precision policy.

TPU MXUs natively multiply in bfloat16; float32 matmuls/convs default to a
single bf16 pass unless asked otherwise.  Parity with the PyTorch reference
(which computes convs in true fp32 on CUDA/CPU) requires HIGHEST precision
for float32 inputs.  bfloat16 inputs — the performance path — keep DEFAULT,
which is already the native MXU mode.
"""

import jax.numpy as jnp
from jax import lax


def matmul_precision(dtype) -> lax.Precision:
    if dtype == jnp.float32 or dtype == jnp.float64:
        return lax.Precision.HIGHEST
    return lax.Precision.DEFAULT


def conv_accum_dtype(dtype):
    """preferred_element_type for convs: full-f32 accumulation for float32
    inputs; None for bf16 (the MXU still accumulates f32 internally and
    rounds the output) — conv_general_dilated's gradient rejects a
    preferred_element_type that differs from the operand dtype.  float64
    (x64-mode parity tests) must not narrow to f32."""
    import jax.numpy as jnp

    if dtype == jnp.float64:
        return jnp.float64
    if dtype == jnp.float32:
        return jnp.float32
    return None


def accum_dtype(dtype):
    """preferred_element_type for dot_general/einsum accumulation: at least
    f32, and the operand dtype itself when it is wider (float64)."""
    import jax.numpy as jnp

    if dtype == jnp.float64:
        return jnp.float64
    return jnp.float32

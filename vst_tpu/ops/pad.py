"""Reflection padding (NHWC).

Parity target: ``torch.nn.ReflectionPad2d`` as used by every conv block in the
reference (e.g. ReCoNet/network.py:63-75, RTNSTV/network.py:10-26,
AdaAttN/network.py:11-21).
"""

import jax.numpy as jnp


def reflection_pad2d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect-pad the two spatial dims of an NHWC tensor by ``pad`` pixels.

    Matches torch's ReflectionPad2d (edge pixel not repeated).
    """
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")

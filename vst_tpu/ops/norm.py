"""Instance normalization (NHWC).

Parity target: ``torch.nn.InstanceNorm2d`` with its defaults — eps=1e-5,
biased variance, no running stats — in both affine=True (stylizer blocks,
e.g. ReCoNet/network.py:92, RTNSTV/network.py:17) and affine=False
(AdaAttN's norm_q/k/v, AdaAttN/network.py:178-183) forms.

Statistics are computed in float32 regardless of input dtype so bfloat16
activations normalize stably.
"""

import jax.numpy as jnp


def instance_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Normalize each (sample, channel) plane over H, W.

    x: (N, H, W, C).  scale/bias: (C,) or None (affine=False).
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    out = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    if scale is not None:
        out = out * scale.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)

"""Parameter initialization matching torch layer defaults.

torch.nn.Conv2d initializes weights with kaiming_uniform_(a=√5), which
reduces to U(-1/√fan_in, 1/√fan_in), and biases with the same bound;
InstanceNorm2d affine params start at weight=1, bias=0.  Matching the
distributions keeps from-scratch training comparable to the reference.
"""

import math

import jax
import jax.numpy as jnp


def conv_init(key, k: int, in_ch: int, out_ch: int, dtype=jnp.float32):
    """HWIO conv weight + bias with torch Conv2d default init."""
    wkey, bkey = jax.random.split(key)
    fan_in = in_ch * k * k
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(wkey, (k, k, in_ch, out_ch), dtype, -bound, bound)
    b = jax.random.uniform(bkey, (out_ch,), dtype, -bound, bound)
    return w, b


def conv_transpose_init(key, k: int, in_ch: int, out_ch: int, dtype=jnp.float32):
    """HWIO (pre-flipped) transpose-conv weight + bias.

    torch ConvTranspose2d computes fan_in from the (in, out, kh, kw) weight's
    dim 1 → fan_in = out_ch·k·k.
    """
    wkey, bkey = jax.random.split(key)
    fan_in = out_ch * k * k
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(wkey, (k, k, in_ch, out_ch), dtype, -bound, bound)
    b = jax.random.uniform(bkey, (out_ch,), dtype, -bound, bound)
    return w, b


def instance_norm_init(ch: int, dtype=jnp.float32):
    return jnp.ones((ch,), dtype), jnp.zeros((ch,), dtype)

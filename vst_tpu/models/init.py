"""Parameter initialization matching torch layer defaults — host-side numpy.

torch.nn.Conv2d initializes weights with kaiming_uniform_(a=√5), which
reduces to U(-1/√fan_in, 1/√fan_in), and biases with the same bound;
InstanceNorm2d affine params start at weight=1, bias=0.  Matching the
distributions keeps from-scratch training comparable to the reference.

Init runs entirely on the host with numpy: on tunneled TPU platforms every
tiny jax.random dispatch costs a remote compile, which made device-side init
take minutes.  ``as_rng`` accepts an int seed, a numpy Generator, or a JAX
PRNGKey (hashed to a seed) so call sites can keep PRNGKey-style APIs.
"""

import math

import numpy as np


def as_rng(key) -> np.random.Generator:
    if isinstance(key, np.random.Generator):
        return key
    if isinstance(key, (int, np.integer)):
        return np.random.default_rng(int(key))
    # JAX PRNGKey (typed or raw uint32): hash its key data to a seed.
    import jax

    data = np.asarray(jax.random.key_data(key)).astype(np.uint64)
    seed = int(data.sum() + 0x9E3779B9 * data.size)
    return np.random.default_rng(seed)


def conv_init(key, k: int, in_ch: int, out_ch: int, dtype=np.float32):
    """HWIO conv weight + bias with torch Conv2d default init."""
    rng = as_rng(key)
    fan_in = in_ch * k * k
    bound = 1.0 / math.sqrt(fan_in)
    w = rng.uniform(-bound, bound, (k, k, in_ch, out_ch)).astype(dtype)
    b = rng.uniform(-bound, bound, (out_ch,)).astype(dtype)
    return w, b


def conv_transpose_init(key, k: int, in_ch: int, out_ch: int, dtype=np.float32):
    """HWIO (pre-flipped) transpose-conv weight + bias.

    torch ConvTranspose2d computes fan_in from the (in, out, kh, kw) weight's
    dim 1 → fan_in = out_ch·k·k.
    """
    rng = as_rng(key)
    fan_in = out_ch * k * k
    bound = 1.0 / math.sqrt(fan_in)
    w = rng.uniform(-bound, bound, (k, k, in_ch, out_ch)).astype(dtype)
    b = rng.uniform(-bound, bound, (out_ch,)).astype(dtype)
    return w, b


def instance_norm_init(ch: int, dtype=np.float32):
    return np.ones((ch,), dtype), np.zeros((ch,), dtype)

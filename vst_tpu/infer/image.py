"""Single-image stylization (parity: ReCoNet/inference/infer.py,
RTNSTV/infer.py, AdaAttN/infer_image.py)."""

import functools

import jax
import jax.numpy as jnp

from vst_tpu.models import adaattn as adaattn_m
from vst_tpu.models import reconet as reconet_m
from vst_tpu.models import rtnstv as rtnstv_m
from vst_tpu.models import vgg as vgg_m

RECONET_FORWARD = {
    "reconet": reconet_m.reconet,
    "sd1": reconet_m.reconet_sd1,
    "sd2": reconet_m.reconet_sd2,
}


@functools.partial(jax.jit, static_argnames=("family",))
def stylize_reconet(params, x, family: str = "reconet"):
    """x: (N, H, W, 3·frames) 0–255 → clamped styled frames
    (ReCoNet/utilities.py:217-219)."""
    return jnp.clip(RECONET_FORWARD[family](params, x)[-1], 0, 255)


@jax.jit
def stylize_rtnstv(params, x):
    return jnp.clip(rtnstv_m.stylizing_network(params, x), 0, 255)


@functools.partial(jax.jit, static_argnames=("activation",))
def stylize_adaattn(vgg_params, params, content, style,
                    activation: str = "softmax"):
    """Arbitrary-style transfer (AdaAttN/infer_image.py:55-60)."""
    fc = vgg_m.vgg19_adaattn_features(vgg_params, content)
    fs = vgg_m.vgg19_adaattn_features(vgg_params, style)
    cs = adaattn_m.stylizing_network(params, fc, fs, activation)
    return jnp.clip(cs, 0, 255)


def stylize_spatial_sharded(params, x, mesh, family: str = "reconet",
                            axis: str = "space"):
    """High-resolution stylization with the image H axis sharded across a
    mesh (XLA inserts conv halo exchanges over ICI) — the serving path for
    frames that exceed one chip's comfortable working set (e.g. 4K).

    x: (N, H, W, 3) with H divisible by the mesh axis size.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    params_r = jax.device_put(params, NamedSharding(mesh, P()))
    xs = jax.device_put(x, NamedSharding(mesh, P(None, axis, None, None)))
    if family == "rtnstv":
        return stylize_rtnstv(params_r, xs)
    return stylize_reconet(params_r, xs, family)

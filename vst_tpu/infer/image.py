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


def _compute_dtype(params):
    dt = jax.tree.leaves(params)[0].dtype
    return dt if jnp.issubdtype(dt, jnp.floating) else jnp.float32


def _finish(styled, uint8_out, wire="rgb"):
    """Clamp to 0–255; optionally truncate to uint8 ON DEVICE so the
    device→host link carries 1 byte/channel instead of 4 (the truncating
    cast matches the reference's numpy uint8 conversion,
    ReCoNet/utilities.py:217-219).  ``wire="i420"`` additionally packs to
    YUV 4:2:0 on device (ops/yuv.py) — 1.5 B/px on the link."""
    styled = jnp.clip(styled, 0, 255)
    if wire == "i420":
        from vst_tpu.ops.yuv import rgb_to_i420

        return rgb_to_i420(styled)
    return styled.astype(jnp.uint8) if uint8_out else styled


@functools.partial(jax.jit, static_argnames=("family", "uint8_out", "wire",
                                             "fused_res"))
def stylize_reconet(params, x, family: str = "reconet",
                    uint8_out: bool = False, wire: str = "rgb",
                    fused_res: bool | None = None):
    """x: (N, H, W, 3·frames) 0–255 (any dtype, incl. uint8 — cast to the
    params' compute dtype on device, so hosts can ship raw uint8 frames)
    → clamped styled frames (ReCoNet/utilities.py:217-219).

    ``fused_res``: force the fused res-stack kernel on/off; None consults
    the serving gate (models/reconet.py::fused_res_serving)."""
    x = x.astype(_compute_dtype(params))
    if fused_res is None:
        fused_res = reconet_m.fused_res_serving(x.dtype)
    styled = RECONET_FORWARD[family](params, x, fused_res=fused_res)[-1]
    return _finish(styled, uint8_out, wire)


@functools.partial(jax.jit, static_argnames=("uint8_out", "wire"))
def stylize_rtnstv(params, x, uint8_out: bool = False, wire: str = "rgb"):
    x = x.astype(_compute_dtype(params))
    return _finish(rtnstv_m.stylizing_network(params, x), uint8_out, wire)


@functools.partial(jax.jit, static_argnames=("activation",))
def stylize_adaattn(vgg_params, params, content, style,
                    activation: str = "softmax"):
    """Arbitrary-style transfer (AdaAttN/infer_image.py:55-60)."""
    fc = vgg_m.vgg19_adaattn_features(vgg_params, content)
    fs = vgg_m.vgg19_adaattn_features(vgg_params, style)
    cs = adaattn_m.stylizing_network(params, fc, fs, activation)
    return jnp.clip(cs, 0, 255)


@functools.partial(jax.jit, static_argnames=("activation",))
def adaattn_style_state(vgg_params, params, style,
                        activation: str = "softmax"):
    """Encode one style (batch 1) into the reusable per-style attention
    state (models/adaattn.py::style_state) — one VGG pass + g/h convs
    total, however many contents it is then applied to."""
    fs = vgg_m.vgg19_adaattn_features(vgg_params, style)
    return adaattn_m.style_state(params, fs, activation)


@functools.partial(jax.jit, static_argnames=("activation",))
def stylize_adaattn_cached(vgg_params, params, content, state,
                           activation: str = "softmax"):
    """stylize_adaattn against a precomputed ``adaattn_style_state`` —
    identical output, none of the per-call style-side work (used by
    ``infer_image --all-pairs``, AdaAttN/infer_image_all.py:18-57)."""
    fc = vgg_m.vgg19_adaattn_features(vgg_params, content)
    cs = adaattn_m.stylizing_network_cached(params, fc, state, activation)
    return jnp.clip(cs, 0, 255)


_ADA_SHARDED_CACHE = {}


def stylize_adaattn_sharded(vgg_params, params, content, style, mesh,
                            activation: str = "cosine", axis: str = "space"):
    """Full AdaAttN pipeline — VGG19 encode + sequence-parallel cosine
    attention + decoder — as ONE jitted multi-device program.

    The content frame's H axis is sharded over ``axis``: the VGG convs and
    decoder run spatially sharded (XLA inserts halo exchanges over ICI),
    and the attention runs in the sequence-parallel linear form (one psum
    of the small key moments — vst_tpu.parallel.attention).  This is the
    serving path for resolutions beyond one chip's working set; numerics
    match the single-device linear form (tested in test_parallel.py).

    Requirements: content H divisible by 16·axis_size (so every VGG tap's
    token count splits evenly); style may be batch-1 (broadcast to the
    content batch on device, encoded once).  Both activations shard:
    cosine (the video model, AdaAttN/train_video.py:39) via the linear
    form's single key-moment psum, softmax (the image model,
    train_image.py:33) via ring attention over ppermuted K/V blocks.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    key = (mesh, activation, axis)
    run = _ADA_SHARDED_CACHE.get(key)
    if run is None:

        @jax.jit
        def run(vgg_params, params, content, style):
            fc = vgg_m.vgg19_adaattn_features(
                vgg_params, content.astype(jnp.float32))
            fs0 = vgg_m.vgg19_adaattn_features(
                vgg_params, style.astype(jnp.float32))
            n = content.shape[0]
            fs = {k: jnp.broadcast_to(v, (n,) + v.shape[1:])
                  for k, v in fs0.items()}
            cs = adaattn_m.stylizing_network(params, fc, fs, activation,
                                             mesh=mesh, mesh_axis=axis)
            return jnp.clip(cs, 0, 255)

        _ADA_SHARDED_CACHE[key] = run
    rep = NamedSharding(mesh, P())
    return run(
        jax.device_put(vgg_params, rep), jax.device_put(params, rep),
        jax.device_put(content, NamedSharding(mesh, P(None, axis, None, None))),
        jax.device_put(style, rep))


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

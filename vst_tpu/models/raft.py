"""RAFT optical flow (Teed & Deng, ECCV 2020) — native JAX implementation.

The reference uses torchvision's frozen ``raft_large`` to generate flow for
the AdaAttN Sintel dataset (AdaAttN/datasets.py:73-96) and the video
experiments (exps_video.py:42) — running it on the GPU inside DataLoader
workers.  Here RAFT is an ordinary in-graph jittable function, so flow
generation fuses into the same XLA program as warping/masking.

Architecture (raft-large configuration):
- feature encoder (instance norm): 7×7/2 conv → residual layers
  64,64 / 96,96(↓2) / 128,128(↓2) → 1×1 conv to 256, at 1/8 resolution
- context encoder: same shape with batch norm (inference statistics),
  output split into hidden (tanh, 128) and context (relu, 128)
- 4-level all-pairs correlation pyramid (⟨f1, f2⟩/√D, 2× average pooling),
  radius-4 bilinear lookup → 4·9² correlation features per pixel
- recurrent update: motion encoder → two separable (1×5)/(5×1) ConvGRUs →
  flow head; convex 8× upsampling with a predicted 3×3 combination mask.

Weight interop: the architecture is pinned to torchvision's ``raft_large``
bit layout — see ``vst_tpu.compat.raft_torchvision`` for the state_dict key
table and ``tests/test_raft.py::TestTorchvisionParity`` for full-model
parity against the functional-torch oracle (weights copied both ways).
Pretrained weights can't be downloaded here (zero egress);
``compat.raft_torchvision.load_raft_pth`` converts a mounted checkpoint.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from vst_tpu.models.init import as_rng
from vst_tpu.ops import conv2d, instance_norm

HIDDEN = 128
CONTEXT = 128
CORR_LEVELS = 4
CORR_RADIUS = 4


# ------------------------------------------------------------ param init

def _conv_p(rng, name, cin, cout, k):
    fan_in = cin * k * k
    bound = 1.0 / np.sqrt(fan_in)
    return {
        f"{name}.weight": rng.uniform(-bound, bound,
                                      (k, k, cin, cout)).astype(np.float32),
        f"{name}.bias": rng.uniform(-bound, bound, cout).astype(np.float32),
    }


def _norm_p(name, ch, kind):
    if kind == "instance":
        return {}
    return {
        f"{name}.weight": np.ones(ch, np.float32),
        f"{name}.bias": np.zeros(ch, np.float32),
        f"{name}.running_mean": np.zeros(ch, np.float32),
        f"{name}.running_var": np.ones(ch, np.float32),
    }


_ENCODER_LAYERS = [  # (layer name, in, out, stride)
    ("layer1.0", 64, 64, 1), ("layer1.1", 64, 64, 1),
    ("layer2.0", 64, 96, 2), ("layer2.1", 96, 96, 1),
    ("layer3.0", 96, 128, 2), ("layer3.1", 128, 128, 1),
]


def _encoder_params(rng, prefix, out_ch, norm_kind):
    p = {}
    p.update(_conv_p(rng, f"{prefix}.conv1", 3, 64, 7))
    p.update(_norm_p(f"{prefix}.norm1", 64, norm_kind))
    for name, cin, cout, stride in _ENCODER_LAYERS:
        base = f"{prefix}.{name}"
        p.update(_conv_p(rng, f"{base}.conv1", cin, cout, 3))
        p.update(_norm_p(f"{base}.norm1", cout, norm_kind))
        p.update(_conv_p(rng, f"{base}.conv2", cout, cout, 3))
        p.update(_norm_p(f"{base}.norm2", cout, norm_kind))
        if stride != 1 or cin != cout:
            p.update(_conv_p(rng, f"{base}.downsample", cin, cout, 1))
            p.update(_norm_p(f"{base}.downsample_norm", cout, norm_kind))
    p.update(_conv_p(rng, f"{prefix}.conv2", 128, out_ch, 1))
    return p


def init_raft(seed=0) -> dict:
    rng = as_rng(seed)
    p = {}
    p.update(_encoder_params(rng, "fnet", 256, "instance"))
    p.update(_encoder_params(rng, "cnet", HIDDEN + CONTEXT, "batch"))
    corr_ch = CORR_LEVELS * (2 * CORR_RADIUS + 1) ** 2
    p.update(_conv_p(rng, "update.enc.convc1", corr_ch, 256, 1))
    p.update(_conv_p(rng, "update.enc.convc2", 256, 192, 3))
    p.update(_conv_p(rng, "update.enc.convf1", 2, 128, 7))
    p.update(_conv_p(rng, "update.enc.convf2", 128, 64, 3))
    p.update(_conv_p(rng, "update.enc.conv", 192 + 64, 128 - 2, 3))
    gin = HIDDEN + (CONTEXT + 128)
    for tag, kh, kw in (("h", 1, 5), ("v", 5, 1)):
        for gate in ("z", "r", "q"):
            name = f"update.gru.conv{gate}{tag}"
            fan = gin * kh * kw
            bound = 1.0 / np.sqrt(fan)
            p[f"{name}.weight"] = rng.uniform(
                -bound, bound, (kh, kw, gin, HIDDEN)).astype(np.float32)
            p[f"{name}.bias"] = rng.uniform(-bound, bound,
                                            HIDDEN).astype(np.float32)
    p.update(_conv_p(rng, "update.flow.conv1", HIDDEN, 256, 3))
    p.update(_conv_p(rng, "update.flow.conv2", 256, 2, 3))
    p.update(_conv_p(rng, "update.mask.conv1", HIDDEN, 256, 3))
    p.update(_conv_p(rng, "update.mask.conv2", 256, 64 * 9, 1))
    return p


# ------------------------------------------------------------- encoders

def _norm(params, name, x, kind):
    if kind == "instance":
        return instance_norm(x)
    mean = params[f"{name}.running_mean"]
    var = params[f"{name}.running_var"]
    scale = params[f"{name}.weight"]
    bias = params[f"{name}.bias"]
    inv = scale * jax.lax.rsqrt(var + 1e-5)
    return (x - mean) * inv + bias


def _res_block(params, base, x, stride, kind):
    y = conv2d(x, params[f"{base}.conv1.weight"],
               params[f"{base}.conv1.bias"], stride=stride, padding=1)
    y = jax.nn.relu(_norm(params, f"{base}.norm1", y, kind))
    y = conv2d(y, params[f"{base}.conv2.weight"],
               params[f"{base}.conv2.bias"], stride=1, padding=1)
    y = jax.nn.relu(_norm(params, f"{base}.norm2", y, kind))
    if f"{base}.downsample.weight" in params:
        x = conv2d(x, params[f"{base}.downsample.weight"],
                   params[f"{base}.downsample.bias"], stride=stride)
        x = _norm(params, f"{base}.downsample_norm", x, kind)
    return jax.nn.relu(x + y)


def _encoder(params, prefix, x, kind):
    x = conv2d(x, params[f"{prefix}.conv1.weight"],
               params[f"{prefix}.conv1.bias"], stride=2, padding=3)
    x = jax.nn.relu(_norm(params, f"{prefix}.norm1", x, kind))
    for name, _, _, stride in _ENCODER_LAYERS:
        x = _res_block(params, f"{prefix}.{name}", x, stride, kind)
    return conv2d(x, params[f"{prefix}.conv2.weight"],
                  params[f"{prefix}.conv2.bias"])


# ----------------------------------------------------------- correlation

def build_corr_pyramid(f1, f2, num_levels=CORR_LEVELS):
    """All-pairs correlation pyramid.

    f1/f2: (N, H, W, C) at 1/8 resolution → list of (N·H·W, h_l, w_l)
    volumes, level 0 full resolution, each next 2× average-pooled.
    """
    n, h, w, c = f1.shape
    a = f1.reshape(n, h * w, c).astype(jnp.float32)
    b = f2.reshape(n, h * w, c).astype(jnp.float32)
    corr = jnp.einsum("npc,nqc->npq", a, b,
                      preferred_element_type=jnp.float32) / jnp.sqrt(
        jnp.float32(c))
    corr = corr.reshape(n * h * w, h, w)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        hh, ww = corr.shape[1] // 2, corr.shape[2] // 2
        corr = corr[:, :hh * 2, :ww * 2]
        corr = corr.reshape(corr.shape[0], hh, 2, ww, 2).mean(axis=(2, 4))
        pyramid.append(corr)
    return pyramid


def _sample_bilinear_pixel(img, xy):
    """img: (B, h, w); xy: (B, P, 2) pixel coords → (B, P); zeros padding."""
    b, h, w = img.shape
    x = xy[..., 0]
    y = xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    flat = img.reshape(b, h * w)
    out = jnp.zeros(x.shape, jnp.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0.astype(jnp.int32) + dx
            yi = y0.astype(jnp.int32) + dy
            wgt = (wx if dx else 1 - wx) * (wy if dy else 1 - wy)
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            vals = jnp.take_along_axis(flat, idx, axis=1)
            out = out + vals * jnp.where(valid, wgt, 0.0)
    return out


def lookup_corr(pyramid, coords, radius=CORR_RADIUS):
    """Sample (2r+1)² correlation windows around ``coords`` at each level.

    coords: (N, H, W, 2) current target positions in level-0 pixel units.
    Returns (N, H, W, num_levels·(2r+1)²).
    """
    n, h, w, _ = coords.shape
    r = radius
    # Window enumeration matches torchvision CorrBlock.index_pyramid:
    # meshgrid(di, dj, indexing="ij") with delta[..., 0] paired with x —
    # flat index i·(2r+1)+j has (dx, dy) = (di[i], dj[j]), x-offset MAJOR.
    # This ordering is load-bearing for pretrained-weight parity (it fixes
    # which update.enc.convc1 input channel sees which window offset).
    d = jnp.stack(jnp.meshgrid(
        jnp.arange(-r, r + 1, dtype=jnp.float32),
        jnp.arange(-r, r + 1, dtype=jnp.float32), indexing="ij"),
        axis=-1).reshape(-1, 2)                    # (P, 2) as (dx, dy)
    out = []
    for lvl, corr in enumerate(pyramid):
        c = coords.reshape(n * h * w, 1, 2) / (2.0 ** lvl)
        pts = c + d[None]
        out.append(_sample_bilinear_pixel(corr, pts))
    feat = jnp.concatenate(out, axis=-1)
    return feat.reshape(n, h, w, -1)


# ---------------------------------------------------------------- update

def _motion_encoder(params, corr_feat, flow):
    c = jax.nn.relu(conv2d(corr_feat, params["update.enc.convc1.weight"],
                           params["update.enc.convc1.bias"]))
    c = jax.nn.relu(conv2d(c, params["update.enc.convc2.weight"],
                           params["update.enc.convc2.bias"], padding=1))
    f = jax.nn.relu(conv2d(flow, params["update.enc.convf1.weight"],
                           params["update.enc.convf1.bias"], padding=3))
    f = jax.nn.relu(conv2d(f, params["update.enc.convf2.weight"],
                           params["update.enc.convf2.bias"], padding=1))
    m = jax.nn.relu(conv2d(jnp.concatenate([c, f], axis=-1),
                           params["update.enc.conv.weight"],
                           params["update.enc.conv.bias"], padding=1))
    return jnp.concatenate([m, flow], axis=-1)       # 128 channels


def _sep_conv_gru(params, h, x):
    # (1,5) then (5,1) — asymmetric padding via explicit pad tuples
    n, hh, ww, _ = h.shape
    h = _gru_pass_asym(params, "h", (0, 2), h, x)
    h = _gru_pass_asym(params, "v", (2, 0), h, x)
    return h


def _gru_pass_asym(params, tag, pad_hw, h, x):
    ph, pw = pad_hw

    def cv(name, inp):
        from jax import lax

        return lax.conv_general_dilated(
            inp, params[f"{name}.weight"], (1, 1),
            [(ph, ph), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + params[f"{name}.bias"]

    hx = jnp.concatenate([h, x], axis=-1)
    z = jax.nn.sigmoid(cv(f"update.gru.convz{tag}", hx))
    r = jax.nn.sigmoid(cv(f"update.gru.convr{tag}", hx))
    q = jnp.tanh(cv(f"update.gru.convq{tag}",
                    jnp.concatenate([r * h, x], axis=-1)))
    return (1 - z) * h + z * q


def _flow_head(params, h):
    y = jax.nn.relu(conv2d(h, params["update.flow.conv1.weight"],
                           params["update.flow.conv1.bias"], padding=1))
    return conv2d(y, params["update.flow.conv2.weight"],
                  params["update.flow.conv2.bias"], padding=1)


def _upsample_mask(params, h):
    y = jax.nn.relu(conv2d(h, params["update.mask.conv1.weight"],
                           params["update.mask.conv1.bias"], padding=1))
    return 0.25 * conv2d(y, params["update.mask.conv2.weight"],
                         params["update.mask.conv2.bias"])


def convex_upsample(flow, mask):
    """8× convex upsampling: softmax-weighted 3×3 neighborhood combination.

    flow: (N, H, W, 2) coarse; mask: (N, H, W, 9·64) → (N, 8H, 8W, 2).

    Mask channel layout matches torchvision's ``upsample_flow``
    (``up_mask.view(b, 1, 9, 8, 8, h, w)``): channel = k·64 + a·8 + b with
    k the 3×3 neighbor (row-major, F.unfold order), (a, b) the sub-pixel
    (row, col).  Load-bearing for pretrained update.mask.conv2 weights.
    """
    n, h, w, _ = flow.shape
    m = mask.reshape(n, h, w, 9, 8, 8)
    m = jax.nn.softmax(m, axis=3)
    fp = jnp.pad(8.0 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.stack(
        [fp[:, dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)],
        axis=-2)                                    # (N, H, W, 9, 2)
    up = jnp.einsum("nhwkab,nhwkc->nhwabc", m, patches)
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(n, 8 * h, 8 * w, 2)
    return up


# ----------------------------------------------------------------- model

@functools.partial(jax.jit, static_argnames=("iters",))
def raft_flow(params, img1, img2, iters: int = 12):
    """Estimate optical flow img1→img2.

    img1/img2: (N, H, W, 3) in [-1, 1] (the reference's raftTransforms,
    AdaAttN/utilities.py:21-28), H and W divisible by 8.
    Returns the final upsampled (N, H, W, 2) flow (the reference always
    takes ``raft(...)[-1]``; all iterates are traced internally).
    """
    n, h, w, _ = img1.shape
    f1 = _encoder(params, "fnet", img1, "instance")
    f2 = _encoder(params, "fnet", img2, "instance")
    pyramid = build_corr_pyramid(f1, f2)

    ctx = _encoder(params, "cnet", img1, "batch")
    hidden = jnp.tanh(ctx[..., :HIDDEN])
    context = jax.nn.relu(ctx[..., HIDDEN:])

    h8, w8 = h // 8, w // 8
    gx, gy = jnp.meshgrid(jnp.arange(w8, dtype=jnp.float32),
                          jnp.arange(h8, dtype=jnp.float32))
    coords0 = jnp.broadcast_to(jnp.stack([gx, gy], -1)[None],
                               (n, h8, w8, 2))
    coords1 = coords0

    def body(carry, _):
        hidden, coords1 = carry
        corr_feat = lookup_corr(pyramid, coords1)
        flow = coords1 - coords0
        motion = _motion_encoder(params, corr_feat, flow)
        inp = jnp.concatenate([context, motion], axis=-1)
        hidden = _sep_conv_gru(params, hidden, inp)
        delta = _flow_head(params, hidden)
        coords1 = coords1 + delta
        return (hidden, coords1), None

    (hidden, coords1), _ = jax.lax.scan(body, (hidden, coords1), None,
                                        length=iters)
    mask = _upsample_mask(params, hidden)
    return convex_upsample(coords1 - coords0, mask)

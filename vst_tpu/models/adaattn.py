"""AdaAttN arbitrary-style model (layer L2).

Parity target: AdaAttN/network.py:11-251.  Parameter keys equal the torch
``state_dict`` names of ``StylizingNetwork`` (1×1 attention convs
"adaattn.<i>.{f,g,h}.*", decoder convs "decoder.conv<k>[...].conv[.conv].*").

Attention math (AdaAttN/network.py:191-220): with Q from the IN-normalized
multi-scale content pyramid, K from the style pyramid, V from style features,
    A = act(QᵀK);  M = A·Vᵀ;  S = sqrt(A·V² − M²);  out = S·IN(c) + M.

TPU-first design — three evaluation strategies for the same math:

- ``exact``   — materializes the (n×m) attention map; used for parity tests
  and small inputs.
- ``chunked`` — query-blocked evaluation (never holds more than
  (chunk × m) scores); identical numerics to ``exact`` per row.  This is the
  memory-safe softmax path at video resolutions (8192² map ≈ 256 MB would
  otherwise blow past VMEM/HBM budgets — SURVEY.md §7 hard part 4).
- cosine activation is evaluated in **closed linear form**: because
  cos+1 row-normalized attention is  a_ij = (q̂·k̂_j + 1)/(q̂·Σk̂ + m),
  both A·V and A·V² collapse to rank-1-corrected matmuls against the
  precomputed (d×v) moments K̂ᵀV and K̂ᵀV², making the video model's
  attention O(n·d·v) instead of O(n²·(d+v)) — no attention matrix exists at
  any block size.  (The reference materializes the full map:
  AdaAttN/network.py:117-125.)
"""

import jax
import jax.numpy as jnp

from vst_tpu.models.init import as_rng, conv_init, instance_norm_init
from vst_tpu.ops import (
    conv2d,
    feature_down_sample,
    instance_norm,
    reflection_pad2d,
    resize_bilinear,
)
from vst_tpu.ops._precision import matmul_precision

V_DIMS = (256, 512, 512)
QK_DIMS = (64 + 128 + 256, 64 + 128 + 256 + 512, 64 + 128 + 256 + 512 + 512)


# ------------------------------------------------------------- conv blocks

def _conv(params, name, x, k=3, stride=1):
    """AdaAttN ``Conv``: reflection pad + conv, no norm (network.py:11-21)."""
    w = params[f"{name}.conv.weight"]
    b = params[f"{name}.conv.bias"]
    if k == 3 and stride == 1 and x.shape[1] >= 3 and x.shape[2] >= 3:
        from vst_tpu.ops.conv import conv2d_reflect1_k3s1

        return conv2d_reflect1_k3s1(x, w, b)
    return conv2d(reflection_pad2d(x, k // 2), w, b, stride=stride)


def _conv_relu(params, name, x):
    """``ConvReLU`` (network.py:24-33); inner Conv adds a ``.conv`` level."""
    return jax.nn.relu(_conv(params, f"{name}.conv", x))


# --------------------------------------------------------------- attention

def _attention_moments_softmax_exact(q, k, v, prec):
    """A = softmax(QKᵀ); returns (A·V, A·V²).  q:(b,n,d) k:(b,m,d) v:(b,m,c)."""
    scores = jnp.einsum("bnd,bmd->bnm", q, k,
                        preferred_element_type=jnp.float32, precision=prec)
    a = jax.nn.softmax(scores, axis=-1)
    m1 = jnp.einsum("bnm,bmc->bnc", a, v,
                    preferred_element_type=jnp.float32, precision=prec)
    m2 = jnp.einsum("bnm,bmc->bnc", a, v * v,
                    preferred_element_type=jnp.float32, precision=prec)
    return m1, m2


def _attention_moments_softmax_chunked(q, k, v, prec, chunk):
    """Query-blocked softmax attention; bit-identical rows to exact."""
    b, n, d = q.shape
    pad = (-n) % chunk
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    nb = q.shape[1] // chunk
    qb = q.reshape(b, nb, chunk, d).transpose(1, 0, 2, 3)  # (nb, b, chunk, d)

    def one(qc):
        return _attention_moments_softmax_exact(qc, k, v, prec)

    m1, m2 = jax.lax.map(one, qb)
    m1 = m1.transpose(1, 0, 2, 3).reshape(b, nb * chunk, -1)[:, :n]
    m2 = m2.transpose(1, 0, 2, 3).reshape(b, nb * chunk, -1)[:, :n]
    return m1, m2


def _attention_moments_cosine_linear(q, k, v, prec):
    """Closed-form cos+1 row-normalized attention moments (no n×m map).

    a_ij = (q̂_i·k̂_j + 1) / (q̂_i·Σk̂ + m)  — reference semantics
    (AdaAttN/network.py:111-125) with the sums re-associated.
    """
    b, m, d = k.shape
    qn = q * jax.lax.rsqrt(
        jnp.sum(jnp.square(q), axis=-1, keepdims=True))
    kn = k * jax.lax.rsqrt(
        jnp.sum(jnp.square(k), axis=-1, keepdims=True))
    ksum = jnp.sum(kn, axis=1)                      # (b, d)
    vsum = jnp.sum(v, axis=1)                       # (b, c)
    v2sum = jnp.sum(v * v, axis=1)                  # (b, c)
    kv = jnp.einsum("bmd,bmc->bdc", kn, v,
                    preferred_element_type=jnp.float32, precision=prec)
    kv2 = jnp.einsum("bmd,bmc->bdc", kn, v * v,
                     preferred_element_type=jnp.float32, precision=prec)
    row = jnp.einsum("bnd,bd->bn", qn, ksum,
                     preferred_element_type=jnp.float32, precision=prec) + m
    inv = (1.0 / row)[..., None]
    m1 = (jnp.einsum("bnd,bdc->bnc", qn, kv,
                     preferred_element_type=jnp.float32, precision=prec)
          + vsum[:, None, :]) * inv
    m2 = (jnp.einsum("bnd,bdc->bnc", qn, kv2,
                     preferred_element_type=jnp.float32, precision=prec)
          + v2sum[:, None, :]) * inv
    return m1, m2


def _attention_moments_cosine_exact(q, k, v, prec):
    """Materialized cos+1 attention — parity oracle for the linear form."""
    qnorm = jnp.sqrt(jnp.sum(jnp.square(q), axis=-1, keepdims=True))
    knorm = jnp.sqrt(jnp.sum(jnp.square(k), axis=-1, keepdims=True))
    s = jnp.einsum("bnd,bmd->bnm", q, k,
                   preferred_element_type=jnp.float32, precision=prec)
    s = s / (qnorm * knorm.transpose(0, 2, 1)) + 1.0
    a = s / jnp.sum(s, axis=-1, keepdims=True)
    m1 = jnp.einsum("bnm,bmc->bnc", a, v,
                    preferred_element_type=jnp.float32, precision=prec)
    m2 = jnp.einsum("bnm,bmc->bnc", a, v * v,
                    preferred_element_type=jnp.float32, precision=prec)
    return m1, m2


# Per-shape (bq, bk, exp2) for the Pallas flash-moments kernel, keyed by
# token count n (n == m on every AdaAttN level).  Round-5 on-chip sweep
# (tools/bench_adaattn_softmax.py, full (bq, bk) × {exp, exp2} grid at
# the 512²-serving level shapes; BENCH.md "AdaAttN softmax 512²"):
#   relu3_1 (n=16384): (1024, 1024) 6.25 ms vs (1024, 512) default 6.32
#   relu4_1 (n=4096):  (1024, 1024) 0.72 ms vs 0.75
#   exp2=True is a measured tie-to-loss at every shape (6.29 / 0.78 ms
#   best) — XLA:TPU already lowers exp through exp2, so the base-2
#   rewrite saves nothing; kept as a kernel option, never routed.
# relu5_1 (n=1024) routes to the exact path (below the kernel threshold).
_PALLAS_SOFTMAX_CONFIGS: dict[int, dict] = {
    16384: {"bq": 1024, "bk": 1024},
    4096: {"bq": 1024, "bk": 1024},
}


def _pallas_softmax_kwargs(n: int, m: int, train: bool = False) -> dict:
    # the sweep timed the FORWARD kernel only; the train path's flash-VJP
    # backward is unswept, so training keeps the kernel defaults
    if not train and n == m and n in _PALLAS_SOFTMAX_CONFIGS:
        return _PALLAS_SOFTMAX_CONFIGS[n]
    return {}


def attention_moments(q, k, v, activation: str, mode: str = "auto",
                      chunk: int = 1024, mesh=None, mesh_axis: str = "data"):
    """Dispatch on activation/mode.  Shapes: q (b,n,d), k (b,m,d), v (b,m,c).

    ``mesh``: optional jax.sharding.Mesh — attention then runs
    sequence-parallel with the token axis sharded over ``mesh_axis``
    (vst_tpu.parallel.attention): cosine as one psum of the small key
    moments, softmax as ring attention (K/V blocks ppermuted around the
    mesh with online-softmax accumulation).
    """
    prec = matmul_precision(q.dtype)
    if activation == "cosine":
        if mesh is not None:
            from vst_tpu.parallel.attention import (
                sharded_cosine_attention_moments,
            )

            return sharded_cosine_attention_moments(mesh, q, k, v, mesh_axis)
        if mode == "exact":
            return _attention_moments_cosine_exact(q, k, v, prec)
        return _attention_moments_cosine_linear(q, k, v, prec)
    if activation == "softmax":
        if mesh is not None:
            from vst_tpu.parallel.attention import (
                sharded_softmax_attention_moments,
            )

            return sharded_softmax_attention_moments(mesh, q, k, v,
                                                     mesh_axis)
        n, m = q.shape[1], k.shape[1]
        if mode == "pallas" and n * m > 1024 * 1024:
            from vst_tpu.kernels import softmax_attention_moments_pallas

            return softmax_attention_moments_pallas(
                q, k, v, **_pallas_softmax_kwargs(n, m))
        if mode == "pallas":
            # tiny maps: the exact formulation wins (one MXU matmul pair)
            # AND ~16 MB pallas-call outputs at this size trip XLA's
            # output-in-VMEM stack allocation over the scoped limit
            return _attention_moments_softmax_exact(q, k, v, prec)
        if (mode == "train" and n * m > 1024 * 1024
                and jax.default_backend() == "tpu"
                and q.dtype == jnp.bfloat16):
            # TRAINING threshold, measured on-chip (BENCH.md "AdaAttN
            # training"): at the image trainer's own relu3_1 shape
            # (256² → n=m=4096, batch 8, bf16) the flash-VJP kernel runs
            # the full train step at 196 samples/s vs 163 for the
            # materialized exact path — 1.21× — because exact holds the
            # (8, 4096, 4096) score+softmax residuals for backward while
            # the kernel re-streams them.  Below ~1024² tokens the exact
            # path's single matmul pair wins and the kernel's outputs
            # start tripping XLA's output-in-VMEM stack allocation; the
            # same stack heuristic rejects the f32 kernel outright at the
            # trainer shape (measured compile OOM), so f32 training — the
            # parity-precision mode — keeps the exact path.
            from vst_tpu.kernels import softmax_attention_moments_pallas

            return softmax_attention_moments_pallas(
                q, k, v, **_pallas_softmax_kwargs(n, m, train=True))
        if mode in ("exact", "train") or (mode == "auto"
                                          and n * m <= 4096 * 4096):
            return _attention_moments_softmax_exact(q, k, v, prec)
        if mode == "auto" and jax.default_backend() == "tpu":
            # the kernel carries a flash-style custom VJP, so it is the
            # memory-safe path for BOTH inference and training at large
            # token counts (the chunked path's autodiff residuals would
            # still materialize all n·m scores)
            from vst_tpu.kernels import softmax_attention_moments_pallas

            return softmax_attention_moments_pallas(
                q, k, v, **_pallas_softmax_kwargs(n, m))
        return _attention_moments_softmax_chunked(q, k, v, prec, chunk)
    raise ValueError(f"Unknown activation: {activation}")


def _flatten_hw(x):
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c)


def _apply_moments(c_x, m1, m2):
    """AdaAttN epilogue: out = sqrt(var)·IN(c) + mean (network.py:214-220)."""
    b, h, w, _ = c_x.shape
    var = m2 - m1 * m1
    s = jnp.sqrt(jnp.clip(var, min=1e-6))
    mmap = m1.reshape(b, h, w, -1)
    smap = s.reshape(b, h, w, -1)
    out = smap * instance_norm(c_x).astype(jnp.float32) + mmap
    return out.astype(c_x.dtype)


def adaattn_module(params, name, c_x, s_x, c_1x, s_1x, activation,
                   mode="auto", mesh=None, mesh_axis="data"):
    """One AdaAttN attention module (AdaAttN/network.py:174-220), NHWC.

    ``name`` e.g. "adaattn.0"; pass ``name=None`` for the conv-free variant
    (``AdaAttnNoConv``, network.py:128-171, used as the local-loss target).
    """
    qn = instance_norm(c_1x)
    kn = instance_norm(s_1x)
    if name is not None:
        q = conv2d(qn, params[f"{name}.f.weight"], params[f"{name}.f.bias"])
        k = conv2d(kn, params[f"{name}.g.weight"], params[f"{name}.g.bias"])
        v = conv2d(s_x, params[f"{name}.h.weight"], params[f"{name}.h.bias"])
    else:
        q, k, v = qn, kn, s_x
    m1, m2 = attention_moments(
        _flatten_hw(q), _flatten_hw(k), _flatten_hw(v), activation, mode,
        mesh=mesh, mesh_axis=mesh_axis)
    return _apply_moments(c_x, m1, m2)


def adaattn_no_conv(c_x, s_x, c_1x, s_1x, activation, mode="auto"):
    return adaattn_module({}, None, c_x, s_x, c_1x, s_1x, activation, mode)


# ------------------------------------------------- cached-style serving path

def _cosine_linear_from_state(q, st, prec):
    """Per-frame half of _attention_moments_cosine_linear against a
    precomputed style state (same re-association, batchless style side)."""
    qn = q * jax.lax.rsqrt(
        jnp.sum(jnp.square(q), axis=-1, keepdims=True))
    row = jnp.einsum("bnd,d->bn", qn, st["ksum"],
                     preferred_element_type=jnp.float32,
                     precision=prec) + st["m"]
    inv = (1.0 / row)[..., None]
    m1 = (jnp.einsum("bnd,dc->bnc", qn, st["kv"],
                     preferred_element_type=jnp.float32, precision=prec)
          + st["vsum"][None, None, :]) * inv
    m2 = (jnp.einsum("bnd,dc->bnc", qn, st["kv2"],
                     preferred_element_type=jnp.float32, precision=prec)
          + st["v2sum"][None, None, :]) * inv
    return m1, m2


def style_state(params, fs, activation="cosine", mode="auto"):
    """Precompute the style-only half of every attention module ONCE.

    In the video use case (AdaAttN/infer_video.py:40-64) the style image is
    fixed for the whole clip, yet the reference reruns the style-side
    downsample pyramid, instance norm, g/h 1×1 convs, and (for cosine) the
    K̂ᵀV moment matmuls on every frame.  All of that is loop-invariant; for
    the linear cosine form the whole style side collapses to per-module
    (ksum, vsum, v2sum, K̂ᵀV, K̂ᵀV²) — a few MB regardless of style
    resolution.  fs: style tap dict with batch 1.

    Returns a pytree usable with ``stylizing_network_cached`` (jit-safe).
    """
    fsl = list(fs.values())
    assert fsl[0].shape[0] == 1, "style state is computed for one style"
    prec = matmul_precision(fsl[0].dtype)
    states = []
    for i in range(3):
        idx = i + 2
        s_1x = feature_down_sample(fsl, idx)
        kn_in = instance_norm(s_1x)
        k = conv2d(kn_in, params[f"adaattn.{i}.g.weight"],
                   params[f"adaattn.{i}.g.bias"])
        v = conv2d(fsl[idx], params[f"adaattn.{i}.h.weight"],
                   params[f"adaattn.{i}.h.bias"])
        k2, v2 = _flatten_hw(k), _flatten_hw(v)
        if activation == "cosine" and mode != "exact":
            kn = k2 * jax.lax.rsqrt(
                jnp.sum(jnp.square(k2), axis=-1, keepdims=True))
            states.append({
                "m": jnp.float32(k2.shape[1]),
                "ksum": jnp.sum(kn, axis=1)[0],
                "vsum": jnp.sum(v2, axis=1)[0].astype(jnp.float32),
                "v2sum": jnp.sum(v2 * v2, axis=1)[0].astype(jnp.float32),
                "kv": jnp.einsum("bmd,bmc->bdc", kn, v2,
                                 preferred_element_type=jnp.float32,
                                 precision=prec)[0],
                "kv2": jnp.einsum("bmd,bmc->bdc", kn, v2 * v2,
                                  preferred_element_type=jnp.float32,
                                  precision=prec)[0],
            })
        else:
            states.append({"k": k2[0], "v": v2[0]})
    return states


def stylizing_network_cached(params, fc, states, activation="cosine",
                             mode="auto"):
    """Per-frame stylizer against a precomputed ``style_state`` — identical
    output to ``stylizing_network`` with the same activation/mode, minus the
    per-frame style-side work."""
    fcl = list(fc.values())
    prec = matmul_precision(fcl[0].dtype)
    outs = []
    for i in range(3):
        idx = i + 2
        st = states[i]
        c_x = fcl[idx]
        c_1x = feature_down_sample(fcl, idx)
        qn = instance_norm(c_1x)
        q = conv2d(qn, params[f"adaattn.{i}.f.weight"],
                   params[f"adaattn.{i}.f.bias"])
        q2 = _flatten_hw(q)
        if "ksum" in st:   # cosine_linear state (key structure is static)
            m1, m2 = _cosine_linear_from_state(q2, st, prec)
        else:
            b = q2.shape[0]
            k = jnp.broadcast_to(st["k"], (b,) + st["k"].shape)
            v = jnp.broadcast_to(st["v"], (b,) + st["v"].shape)
            m1, m2 = attention_moments(q2, k, v, activation, mode)
        outs.append(_apply_moments(c_x, m1, m2))
    return decoder(params, outs[2], outs[1], outs[0])


# ----------------------------------------------------------------- decoder

def decoder(params, x5, x4, x3):
    """AdaAttN Decoder (network.py:63-99).  Inputs are the three attention
    outputs at relu5_1/4_1/3_1 scales (NHWC)."""
    x = resize_bilinear(x5, (x5.shape[1] * 2, x5.shape[2] * 2))
    x = x + x4
    x = _conv_relu(params, "decoder.conv1", x)
    x = _conv_relu(params, "decoder.conv2", x)
    x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))
    x = jnp.concatenate([x, x3], axis=-1)
    for i in range(3):
        x = _conv_relu(params, f"decoder.conv3.{i}", x)
    x = _conv_relu(params, "decoder.conv4", x)
    x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))
    x = _conv_relu(params, "decoder.conv5", x)
    x = _conv_relu(params, "decoder.conv6", x)
    x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))
    x = _conv_relu(params, "decoder.conv7", x)
    x = _conv(params, "decoder.conv8", x)
    return x


# ------------------------------------------------------------- full model

def stylizing_network(params, fc: dict, fs: dict, activation="softmax",
                      mode="auto", mesh=None, mesh_axis="data",
                      remat=False):
    """Full AdaAttN stylizer (network.py:223-251).

    fc/fs: ordered VGG19 tap dicts from
    ``vst_tpu.models.vgg.vgg19_adaattn_features``.
    ``mesh``: optional Mesh for sequence-parallel cosine attention across
    chips (see attention_moments).
    ``remat=True`` checkpoints each attention module and the decoder
    separately (segmented, like models/vgg.py::_run): backward holds one
    module's internals at a time instead of all three attention maps plus
    the decoder chain.
    """
    fcl = list(fc.values())
    fsl = list(fs.values())

    def run_module(params, c_x, s_x, c_1x, s_1x, i):
        return adaattn_module(params, f"adaattn.{i}", c_x, s_x, c_1x, s_1x,
                              activation, mode, mesh=mesh,
                              mesh_axis=mesh_axis)

    run_decoder = decoder
    if remat:
        run_module = jax.checkpoint(run_module, static_argnums=(5,))
        run_decoder = jax.checkpoint(decoder)

    outs = []
    for i in range(3):
        idx = i + 2
        c_1x = feature_down_sample(fcl, idx)
        s_1x = feature_down_sample(fsl, idx)
        outs.append(run_module(params, fcl[idx], fsl[idx], c_1x, s_1x, i))
    return run_decoder(params, outs[2], outs[1], outs[0])


# ---------------------------------------------------------------- init

def _conv_p(key, name, cin, cout, k):
    w, b = conv_init(key, k, cin, cout)
    return {f"{name}.weight": w, f"{name}.bias": b}


def init_stylizing_network(key):
    rng = as_rng(key)
    params = {}
    for i in range(3):
        for tag, cin, cout in (
            ("f", QK_DIMS[i], QK_DIMS[i]),
            ("g", QK_DIMS[i], QK_DIMS[i]),
            ("h", V_DIMS[i], V_DIMS[i]),
        ):
            params.update(_conv_p(rng, f"adaattn.{i}.{tag}", cin, cout, 1))
    dec = [
        ("decoder.conv1.conv.conv", 512, 512),
        ("decoder.conv2.conv.conv", 512, 256),
        ("decoder.conv3.0.conv.conv", 512, 256),
        ("decoder.conv3.1.conv.conv", 256, 256),
        ("decoder.conv3.2.conv.conv", 256, 256),
        ("decoder.conv4.conv.conv", 256, 128),
        ("decoder.conv5.conv.conv", 128, 128),
        ("decoder.conv6.conv.conv", 128, 64),
        ("decoder.conv7.conv.conv", 64, 64),
        ("decoder.conv8.conv", 64, 3),
    ]
    for name, cin, cout in dec:
        params.update(_conv_p(rng, name, cin, cout, 3))
    return params

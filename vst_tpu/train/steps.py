"""Jitted train steps for every trainer family in the reference suite.

Each ``make_*_step`` closes over frozen inputs (VGG params, style grams,
teacher params, config scalars) and returns a jitted function
``step(state, batch) -> (state, metrics)`` with the state buffers donated.
Loss compositions mirror the reference scripts exactly (citations inline).

Data parallelism: the steps are sharding-agnostic pure functions; the
parallel layer (vst_tpu.parallel) shards the batch across a mesh's "data"
axis and replicates params — XLA inserts the gradient all-reduce over ICI.
"""

import functools

import jax
import jax.numpy as jnp

from vst_tpu import losses
from vst_tpu.models import adaattn as adaattn_m
from vst_tpu.models import reconet as reconet_m
from vst_tpu.models import rtnstv as rtnstv_m
from vst_tpu.models import vgg as vgg_m
from vst_tpu.ops import feature_down_sample, gram_matrix, gram_matrix_hw, vgg_normalize
from vst_tpu.train.state import TrainState, apply_gradients

RECONET_FORWARD = {
    "reconet": reconet_m.reconet,
    "sd1": reconet_m.reconet_sd1,
    "sd2": reconet_m.reconet_sd2,
}


def _train_jit(cfg):
    """``jax.jit(donate_argnums=(0,))`` with a TPU float32 carve-out.

    XLA:TPU fuses the exact softmax-attention chain into its own flash
    custom call; at the AdaAttN image trainer's relu4_1 shape the f32
    variant's stack buffer (17.3 MB for an (8, 1024, 512) f32 output)
    exceeds the default 16 MB scoped-VMEM limit and the compile fails
    with a kernel-vmem-stack OOM (bf16 fits).  Parity-precision (f32)
    training on TPU therefore raises the scoped limit per-compile —
    measured harmless for every other step (the limit only caps
    compiler-stack allocations, not HBM).
    """
    opts = None
    if getattr(cfg, "dtype", "float32") == "float32":
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:
            on_tpu = False
        if on_tpu:
            opts = {"xla_tpu_scoped_vmem_limit_kib": "24576"}
    return functools.partial(jax.jit, donate_argnums=(0,),
                             compiler_options=opts)


def _cast_tree(tree, dtype_name: str):
    """Mixed precision: cast params/batch to cfg.dtype inside the loss
    (gradients flow through the cast back to the f32 master params)."""
    if dtype_name in (None, "float32"):
        return tree
    dtype = jnp.dtype(dtype_name)
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)



def _maybe_remat(fn, cfg):
    """Optional rematerialization: trade recompute for activation memory
    (jax.checkpoint over the stylizer/VGG forwards) — lets larger batches or
    resolutions fit HBM (SURVEY.md goal: remat as a first-class knob)."""
    return jax.checkpoint(fn) if getattr(cfg, "remat", False) else fn


# ------------------------------------------------------- style precompute

def reconet_style_grams(vgg_params, style_255):
    """Per-tap (1, C, C) grams of the style image, /(C·H·W) normalization
    (ReCoNet/train_single/train_candy.py:55-56)."""
    feats = vgg_m.vgg16_features(vgg_params, vgg_normalize(style_255))
    return [gram_matrix(f) for f in feats.values()]


def rtnstv_style_grams(vgg_params, style_255):
    """Per-tap grams with /(H·W) normalization (RTNSTV/train.py:91-93)."""
    feats = vgg_m.vgg19_rtnstv_features(vgg_params, style_255)
    return [gram_matrix_hw(f) for f in feats.values()]


# ------------------------------------------------------------ ReCoNet flow

def _reconet_losses(cfg, vgg_params, style_grams, outs1, outs2,
                    img1, img2, flow, mask):
    """Shared candy-style loss block (train_candy.py:77-148).

    outs1/outs2: (feature_map, styled) pairs from the stylizer.
    img1/img2: raw 0–255 inputs (full multi-frame channel stack).
    """
    feature_map1, styled_img1 = outs1
    feature_map2, styled_img2 = outs2

    # warp index: last frame's RGB channels (train_candy.py:59-61)
    idx = (cfg.input_frame_num - 1) * 3
    s1n = vgg_normalize(styled_img1)
    s2n = vgg_normalize(styled_img2)
    i1n = vgg_normalize(img1[..., idx:idx + 3])
    i2n = vgg_normalize(img2[..., idx:idx + 3])

    # ONE batched VGG pass over [s1, s2, i1, i2] instead of four calls:
    # 4× the batch on every layer (better MXU M-dim utilization on the
    # narrow early convs), identical numerics (VGG has no cross-batch op)
    n = s1n.shape[0]
    feats = vgg_m.vgg16_features(
        vgg_params, jnp.concatenate([s1n, s2n, i1n, i2n], axis=0),
        remat=getattr(cfg, "remat", False))
    sf1, sf2, cf1, cf2 = zip(*(
        (f[:n], f[n:2 * n], f[2 * n:3 * n], f[3 * n:])
        for f in feats.values()))
    sf1, sf2, cf1, cf2 = list(sf1), list(sf2), list(cf1), list(cf2)

    metrics = {}
    total = 0.0

    if getattr(cfg, "use_ftl", True):
        ftl = losses.reconet_feature_temporal_loss(
            feature_map1, feature_map2, flow, mask) * cfg.lambda_f
        total = total + ftl
        metrics["FTL"] = ftl

    otl = losses.reconet_output_temporal_loss(
        i1n, i2n, s1n, s2n, flow, mask) * cfg.lambda_o
    content = (losses.reconet_content_loss(sf1, cf1)
               + losses.reconet_content_loss(sf2, cf2)) * cfg.alpha
    style = (losses.reconet_style_loss(sf1, style_grams)
             + losses.reconet_style_loss(sf2, style_grams)) * cfg.beta
    # NOTE: the reference computes TV on the vgg-NORMALIZED styled images
    # (styled_img is reassigned at train_candy.py:82 before the reg block
    # at :140-145) — reproduced deliberately.
    reg = (losses.reconet_reg_loss(s1n) + losses.reconet_reg_loss(s2n)) * cfg.gamma

    total = total + otl + content + style + reg
    metrics.update(OTL=otl, CL=content, SL=style, RL=reg, loss=total)
    return total, metrics


def make_reconet_flow_step(cfg, vgg_params, style_grams, optimizer):
    """ReCoNet single/multi-frame flow trainer (train_candy.py:32-170)."""
    vgg_params = _cast_tree(vgg_params, cfg.dtype)
    fwd = _maybe_remat(reconet_m.reconet, cfg)

    def loss_fn(params, img1, img2, flow, mask):
        params = _cast_tree(params, cfg.dtype)
        img1 = _cast_tree(img1, cfg.dtype)
        img2 = _cast_tree(img2, cfg.dtype)
        # one batched stylizer pass over both frames (instance norm is
        # per-sample, so concatenating along batch is numerically exact)
        n = img1.shape[0]
        _, fmap, styled = fwd(params, jnp.concatenate([img1, img2], axis=0))
        fmap1, fmap2 = fmap[:n], fmap[n:]
        styled1, styled2 = styled[:n], styled[n:]
        return _reconet_losses(cfg, vgg_params, style_grams,
                               (fmap1, styled1), (fmap2, styled2),
                               img1, img2, flow, mask)

    @_train_jit(cfg)
    def step(state: TrainState, batch):
        img1, img2, flow, mask = batch
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, img1, img2, flow, mask)
        return apply_gradients(state, grads, optimizer), metrics

    return step


def make_reconet_coco_step(cfg, vgg_params, style_grams, optimizer):
    """Image-only content+style trainer (train_coco2014.py:28-105)."""

    vgg_params = _cast_tree(vgg_params, cfg.dtype)
    fwd = _maybe_remat(reconet_m.reconet, cfg)

    def loss_fn(params, img):
        params = _cast_tree(params, cfg.dtype)
        img = _cast_tree(img, cfg.dtype)
        *_, styled = fwd(params, img)
        sn = vgg_normalize(styled)
        inorm = vgg_normalize(img)
        # one batched VGG pass over [styled, content] (no cross-batch op)
        n = sn.shape[0]
        feats = vgg_m.vgg16_features(
            vgg_params, jnp.concatenate([sn, inorm], axis=0),
            remat=getattr(cfg, "remat", False))
        sf = [f[:n] for f in feats.values()]
        cf = [f[n:] for f in feats.values()]
        content = losses.reconet_content_loss(sf, cf) * cfg.alpha
        style = losses.reconet_style_loss(sf, style_grams) * cfg.beta
        total = content + style
        return total, {"CL": content, "SL": style, "loss": total}

    @_train_jit(cfg)
    def step(state: TrainState, img):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, img)
        return apply_gradients(state, grads, optimizer), metrics

    return step


def make_reconet_distill_step(cfg, vgg_params, style_grams, teacher_params,
                              optimizer):
    """SD1/SD2 distillation trainer (train_Flow_SD1.py:33-185).

    The teacher runs under stop_gradient; the symmetric distillation loss is
    logged (scaled by sd_weight_scale·beta) and excluded from the total
    unless ``cfg.include_sd_in_total``.  When the reference's tap pairing is
    shape-incompatible (SD1 stage: 96-ch teacher deconv1 tap vs 64-ch
    student tap — see config.py), the SD term is reported as NaN.
    """
    teacher_fwd = RECONET_FORWARD[cfg.teacher]  # stop_gradient: no residuals
    student_fwd = _maybe_remat(RECONET_FORWARD[cfg.student], cfg)

    vgg_params = _cast_tree(vgg_params, cfg.dtype)
    teacher_params = _cast_tree(teacher_params, cfg.dtype)

    def loss_fn(params, img1, img2, flow, mask):
        params = _cast_tree(params, cfg.dtype)
        img1 = _cast_tree(img1, cfg.dtype)
        img2 = _cast_tree(img2, cfg.dtype)
        # batched frame-pair forwards (instance norm is per-sample: exact)
        n = img1.shape[0]
        pair = jnp.concatenate([img1, img2], axis=0)
        t = teacher_fwd(teacher_params, pair)
        s = student_fwd(params, pair)
        t1 = [x[:n] for x in t]
        t2 = [x[n:] for x in t]
        s1 = [x[:n] for x in s]
        s2 = [x[n:] for x in s]
        feat_t1 = jax.lax.stop_gradient(t1[cfg.teacher_tap])
        feat_t2 = jax.lax.stop_gradient(t2[cfg.teacher_tap])
        feat_s1 = s1[cfg.student_tap]
        feat_s2 = s2[cfg.student_tap]

        total, metrics = _reconet_losses(
            cfg, vgg_params, style_grams,
            (s1[-2], s1[-1]), (s2[-2], s2[-1]),
            img1, img2, flow, mask)

        if feat_t1.shape == feat_s1.shape:
            sd = (losses.mse(feat_t1, feat_s1) + losses.mse(feat_t2, feat_s2))
            sd = sd * (cfg.sd_weight_scale * cfg.beta)
            if cfg.include_sd_in_total:
                total = total + sd
                metrics["loss"] = total
        else:
            sd = jnp.nan
        metrics["SDL"] = sd
        return total, metrics

    @_train_jit(cfg)
    def step(state: TrainState, batch):
        img1, img2, flow, mask = batch
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, img1, img2, flow, mask)
        return apply_gradients(state, grads, optimizer), metrics

    return step


# ----------------------------------------------------------------- RTNSTV

def make_rtnstv_step(cfg, vgg_params, style_grams, optimizer):
    """RTNSTV trainer (RTNSTV/train.py:63-158)."""

    vgg_params = _cast_tree(vgg_params, cfg.dtype)

    def loss_fn(params, img1, img2, flow, mask):
        params = _cast_tree(params, cfg.dtype)
        img1 = _cast_tree(img1, cfg.dtype)
        img2 = _cast_tree(img2, cfg.dtype)
        fwd = _maybe_remat(rtnstv_m.stylizing_network, cfg)
        # ONE batched stylizer pass over both frames and ONE VGG pass over
        # [img1, img2, styled1, styled2] (instance norm is per-sample, VGG
        # has no cross-batch op: numerically exact, 2-4x the MXU M-dim)
        n = img1.shape[0]
        styled = fwd(params, jnp.concatenate([img1, img2], axis=0))
        styled1, styled2 = styled[:n], styled[n:]
        feats = vgg_m.vgg19_rtnstv_features(
            vgg_params, jnp.concatenate([img1, img2, styled1, styled2],
                                        axis=0),
            remat=getattr(cfg, "remat", False))
        cf1, cf2, sf1, sf2 = ({k: f[i * n:(i + 1) * n]
                               for k, f in feats.items()}
                              for i in range(4))
        cl1, sl1, rl1 = losses.rtnstv_spatial_loss(
            cf1, sf1, style_grams, styled1, cfg.alpha, cfg.beta, cfg.gamma)
        cl2, sl2, rl2 = losses.rtnstv_spatial_loss(
            cf2, sf2, style_grams, styled2, cfg.alpha, cfg.beta, cfg.gamma)
        tl = losses.rtnstv_temporal_loss(styled1, styled2, flow, mask) * cfg.lam
        content, style, reg = cl1 + cl2, sl1 + sl2, rl1 + rl2
        total = content + style + reg + tl
        return total, {"CL": content, "SL": style, "RL": reg, "TL": tl,
                       "loss": total}

    @_train_jit(cfg)
    def step(state: TrainState, batch):
        img1, img2, flow, mask = batch
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, img1, img2, flow, mask)
        return apply_gradients(state, grads, optimizer), metrics

    return step


# ----------------------------------------------------------------- AdaAttN

def _adaattn_fwds(cfg):
    """The AdaAttN step's memory-heavy forwards, optionally rematerialized
    (``cfg.remat``): the VGG19 encoder, the stylizer, and the conv-free
    attention target.  Remat is SEGMENTED (per VGG inter-tap slice, per
    attention module, per decoder — see models/vgg.py::_run): only the
    segment boundaries survive the forward and backward recomputes one
    segment's internals at a time, which is what actually lowers the peak
    (checkpointing each whole forward re-materializes every residual at
    once inside its backward — measured no high-water-mark win).  This is
    the lever that shrinks the 7+ GiB f32 video-trainer footprint
    (BENCH.md) for larger batches/resolutions."""
    remat = getattr(cfg, "remat", False)
    mode = getattr(cfg, "attention_mode", "train")

    def vgg_feats(vgg_params, x):
        return vgg_m.vgg19_adaattn_features(vgg_params, x, remat=remat)

    def stylize(params, fc, fs):
        return adaattn_m.stylizing_network(params, fc, fs, cfg.activation,
                                           mode=mode, remat=remat)

    def no_conv_target(c_x, s_x, c_1x, s_1x):
        return adaattn_m.adaattn_no_conv(c_x, s_x, c_1x, s_1x,
                                         cfg.activation, mode=mode)

    if remat:
        no_conv_target = jax.checkpoint(no_conv_target)
    return vgg_feats, stylize, no_conv_target


def _adaattn_gs_lf(cfg, params, vgg_params, fc, fs, cs, fcs=None,
                   vgg_feats=None, no_conv_target=None):
    """Global-stylized + local-feature losses (train_image.py:84-106).

    ``fcs``: optionally precomputed VGG taps of ``cs`` (the video step
    encodes both stylized frames in one batched pass)."""
    if vgg_feats is None or no_conv_target is None:
        vgg_feats, _, no_conv_target = _adaattn_fwds(cfg)
    if fcs is None:
        fcs = vgg_feats(vgg_params, cs)
    loss_gs = 0.0
    for tap in ("relu2_1", "relu3_1", "relu4_1", "relu5_1"):
        loss_gs = loss_gs + losses.global_stylized_loss(fcs[tap], fs[tap])
    loss_gs = loss_gs * cfg.lambda_g

    fcl = list(fc.values())
    fsl = list(fs.values())
    loss_lf = 0.0
    for i in range(3):
        idx = i + 2
        c_1x = feature_down_sample(fcl, idx)
        s_1x = feature_down_sample(fsl, idx)
        target = no_conv_target(fcl[idx], fsl[idx], c_1x, s_1x)
        loss_lf = loss_lf + losses.local_feature_loss(
            fcs[f"relu{i + 3}_1"], target)
    loss_lf = loss_lf * cfg.lambda_l
    return fcs, loss_gs, loss_lf


def make_adaattn_image_step(cfg, vgg_params, optimizer):
    """AdaAttN image-mode trainer (AdaAttN/train_image.py:25-125)."""

    vgg_params = _cast_tree(vgg_params, cfg.dtype)
    vgg_feats, stylize, no_conv_target = _adaattn_fwds(cfg)

    def loss_fn(params, content, style):
        params = _cast_tree(params, cfg.dtype)
        content = _cast_tree(content, cfg.dtype)
        style = _cast_tree(style, cfg.dtype)
        # one batched VGG pass over [content, style] (same crop size)
        n = content.shape[0]
        f = vgg_feats(vgg_params, jnp.concatenate([content, style], axis=0))
        fc = {k: v[:n] for k, v in f.items()}
        fs = {k: v[n:] for k, v in f.items()}
        cs = stylize(params, fc, fs)
        _, loss_gs, loss_lf = _adaattn_gs_lf(
            cfg, params, vgg_params, fc, fs, cs, vgg_feats=vgg_feats,
            no_conv_target=no_conv_target)
        total = loss_gs + loss_lf
        return total, {"loss_gs": loss_gs, "loss_lf": loss_lf, "loss": total}

    @_train_jit(cfg)
    def step(state: TrainState, batch):
        content, style = batch
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, content, style)
        return apply_gradients(state, grads, optimizer), metrics

    return step


def make_adaattn_video_step(cfg, vgg_params, optimizer):
    """AdaAttN video-mode trainer (AdaAttN/train_video.py:26-138).

    Global/local losses on frame 1 only; image-similarity loss across the
    consecutive-frame pair on relu2_1/3_1/4_1 (:110-115).
    """

    vgg_params = _cast_tree(vgg_params, cfg.dtype)
    vgg_feats, stylize, no_conv_target = _adaattn_fwds(cfg)

    def loss_fn(params, content1, content2, style):
        params = _cast_tree(params, cfg.dtype)
        content1 = _cast_tree(content1, cfg.dtype)
        content2 = _cast_tree(content2, cfg.dtype)
        style = _cast_tree(style, cfg.dtype)
        # one batched VGG pass over [content1, content2, style]
        n = content1.shape[0]
        f = vgg_feats(
            vgg_params,
            jnp.concatenate([content1, content2, style], axis=0))
        fc1 = {k: v[:n] for k, v in f.items()}
        fc2 = {k: v[n:2 * n] for k, v in f.items()}
        fs = {k: v[2 * n:] for k, v in f.items()}
        # ONE batched stylizer pass over the frame pair (style features
        # tiled; attention/IN/decoder are per-sample: exact) and ONE VGG
        # pass over both stylized frames
        fc_cat = {k: jnp.concatenate([fc1[k], fc2[k]], axis=0) for k in fc1}
        fs_cat = {k: jnp.concatenate([v, v], axis=0) for k, v in fs.items()}
        cs = stylize(params, fc_cat, fs_cat)
        cs1 = cs[:n]
        f_cs = vgg_feats(vgg_params, cs)
        fcs1 = {k: v[:n] for k, v in f_cs.items()}
        fcs2 = {k: v[n:] for k, v in f_cs.items()}
        _, loss_gs, loss_lf = _adaattn_gs_lf(
            cfg, params, vgg_params, fc1, fs, cs1, fcs=fcs1,
            vgg_feats=vgg_feats, no_conv_target=no_conv_target)

        loss_is = 0.0
        for tap in ("relu2_1", "relu3_1", "relu4_1"):
            loss_is = loss_is + losses.image_similarity_loss(
                fc1[tap], fc2[tap], fcs1[tap], fcs2[tap])
        loss_is = loss_is * cfg.lambda_is

        total = loss_gs + loss_lf + loss_is
        return total, {"loss_gs": loss_gs, "loss_lf": loss_lf,
                       "loss_is": loss_is, "loss": total}

    @_train_jit(cfg)
    def step(state: TrainState, batch):
        content1, content2, style = batch
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, content1, content2, style)
        return apply_gradients(state, grads, optimizer), metrics

    return step

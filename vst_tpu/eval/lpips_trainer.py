"""LPIPS calibration trainer — the vendored package's training harness.

Parity target: AdaAttN/lpips/trainer.py:14-280 + lpips/lpips.py:199-238:
- ``Dist2LogitLayer``: (d0, d1) → 1×1-conv MLP [5→32→32→1, LeakyReLU(0.2),
  sigmoid] over the channel-stack (d0, d1, d0−d1, d0/(d1+eps), d1/(d0+eps));
- ``BCERankingLoss``: BCE(logit, (judge+1)/2) on 2AFC human judgments;
- Adam(lr, betas=(0.5, 0.999)) over the linear heads + rank net
  (trainer.py:70-76), with the 1×1 head weights clamped ≥ 0 after every
  step (``clamp_weights``, trainer.py:104-107);
- ``compute_accuracy`` (trainer.py:139-143) and ``score_2afc_dataset``
  (trainer.py:208-240).

TPU-native shape: one jitted train step (loss + grads + Adam + clamp fused
by XLA), the trunk frozen via ``lax.stop_gradient`` around its features —
only "lin*" heads and the rank net receive gradients, matching the frozen
trunk of the reference's default ``pnet_tune=False``.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import optax

from vst_tpu.eval.lpips import lpips_distance
from vst_tpu.ops import conv2d


def init_dist2logit(seed: int = 0, chn_mid: int = 32) -> dict:
    """Random init of the Dist2LogitLayer convs (lpips/lpips.py:199-222)."""
    rng = np.random.default_rng(seed)

    def conv(ci, co):
        w = (rng.standard_normal((1, 1, ci, co)) / np.sqrt(ci)).astype(
            np.float32)
        return w, np.zeros(co, np.float32)

    params = {}
    for i, (ci, co) in enumerate([(5, chn_mid), (chn_mid, chn_mid),
                                  (chn_mid, 1)]):
        params[f"conv{i}.weight"], params[f"conv{i}.bias"] = conv(ci, co)
    return params


def dist2logit(params, d0, d1, eps: float = 0.1):
    """(N,) distances → (N,) sigmoid probability that d1 < d0
    (lpips/lpips.py:223-225 forward)."""
    d0 = d0.reshape(-1, 1, 1, 1)
    d1 = d1.reshape(-1, 1, 1, 1)
    x = jnp.concatenate(
        [d0, d1, d0 - d1, d0 / (d1 + eps), d1 / (d0 + eps)], axis=-1)
    x = jax.nn.leaky_relu(
        conv2d(x, params["conv0.weight"], params["conv0.bias"]), 0.2)
    x = jax.nn.leaky_relu(
        conv2d(x, params["conv1.weight"], params["conv1.bias"]), 0.2)
    x = jax.nn.sigmoid(
        conv2d(x, params["conv2.weight"], params["conv2.bias"]))
    return x.reshape(-1)


def bce_ranking_loss(rank_params, d0, d1, judge):
    """BCERankingLoss (lpips/lpips.py:227-238): judge ∈ [-1, 1] →
    per = (judge+1)/2; BCE(dist2logit(d0, d1), per)."""
    per = (judge.reshape(-1) + 1.0) / 2.0
    p = jnp.clip(dist2logit(rank_params, d0, d1), 1e-7, 1 - 1e-7)
    return -jnp.mean(per * jnp.log(p) + (1 - per) * jnp.log(1 - p))


def compute_accuracy(d0, d1, judge):
    """trainer.py:139-143: fraction of judgments the distance order agrees
    with (judge ∈ [0, 1] here, as fed from the 2AFC dataset)."""
    d1_lt_d0 = (np.asarray(d1) < np.asarray(d0)).astype(np.float64)
    judge = np.asarray(judge, np.float64).reshape(-1)
    return float(np.mean(d1_lt_d0 * judge + (1 - d1_lt_d0) * (1 - judge)))


def _split_trainable(params):
    heads = {k: v for k, v in params.items() if k.startswith("lin")}
    trunk = {k: v for k, v in params.items() if not k.startswith("lin")}
    return heads, trunk


def make_lpips_ranking_step(net: str = "vgg", lr: float = 1e-4,
                            beta1: float = 0.5):
    """Build (init_state, step) for LPIPS linear-head calibration.

    ``step(state, ref, p0, p1, judge)`` → (state, metrics); batches are
    (N, H, W, 3) in [-1, 1] with judge (N,) ∈ [-1, 1].  Trains the "lin*"
    heads + rank net only (trunk frozen), Adam(0.5, 0.999), heads clamped
    ≥ 0 after each step.
    """
    opt = optax.adam(lr, b1=beta1, b2=0.999)

    def init_state(lpips_params, rank_params):
        heads, _ = _split_trainable(lpips_params)
        return {
            "lpips": lpips_params,
            "rank": rank_params,
            "opt": opt.init({"heads": heads, "rank": rank_params}),
        }

    @jax.jit
    def step(state, ref, p0, p1, judge):
        heads, trunk = _split_trainable(state["lpips"])

        def loss_fn(train):
            params = {**jax.lax.stop_gradient(trunk), **train["heads"]}
            d0 = lpips_distance(params, ref, p0, net)
            d1 = lpips_distance(params, ref, p1, net)
            loss = bce_ranking_loss(train["rank"], d0, d1, judge)
            return loss, (d0, d1)

        train = {"heads": heads, "rank": state["rank"]}
        (loss, (d0, d1)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(train)
        updates, opt_state = opt.update(grads, state["opt"], train)
        train = optax.apply_updates(train, updates)
        # clamp_weights (trainer.py:104-107): 1×1 head weights ≥ 0
        new_heads = {k: jnp.maximum(v, 0.0)
                     for k, v in train["heads"].items()}
        new_state = {
            "lpips": {**trunk, **new_heads},
            "rank": train["rank"],
            "opt": opt_state,
        }
        return new_state, {"loss_total": loss, "d0": d0, "d1": d1}

    return init_state, step


def score_2afc(d0s, d1s, judges):
    """score_2afc_dataset core (trainer.py:208-240): mean human-agreement
    score over a 2AFC set, judges ∈ [0, 1]."""
    d0s = np.asarray(d0s, np.float64).reshape(-1)
    d1s = np.asarray(d1s, np.float64).reshape(-1)
    gts = np.asarray(judges, np.float64).reshape(-1)
    scores = (d0s < d1s) * (1.0 - gts) + (d1s < d0s) * gts \
        + (d1s == d0s) * 0.5
    return float(np.mean(scores))


def voc_ap(rec, prec):
    """VOC AP: area under the precision-recall envelope
    (lpips/__init__.py:96-126, use_07_metric=False branch)."""
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
    i = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[i + 1] - mrec[i]) * mpre[i + 1]))


def score_jnd(ds, sames):
    """score_jnd_dataset core (trainer.py:243-280): mAP of
    distance-thresholded same/different classification."""
    ds = np.asarray(ds, np.float64).reshape(-1)
    sames = np.asarray(sames, np.float64).reshape(-1)
    order = np.argsort(ds)
    sames_sorted = sames[order]
    tps = np.cumsum(sames_sorted)
    fps = np.cumsum(1 - sames_sorted)
    fns = np.sum(sames_sorted) - tps
    precs = tps / (tps + fps)
    recs = tps / (tps + fns)
    return voc_ap(recs, precs)

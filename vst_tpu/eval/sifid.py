"""SIFID — Single-Image Fréchet Inception Distance.

Parity target: AdaAttN/SIFID/sifid_score.py:54-182:
- per-SPATIAL-POSITION activation statistics: an (H·W, C) sample matrix per
  image, mean + covariance over positions (get_activations reshape at
  sifid_score.py:119);
- Fréchet distance with matrix sqrt (scipy.linalg.sqrtm), eps jitter on
  singular covariances (:128-182).

Tolerance note: on small images (H·W positions < C channels) the sample
covariance is rank-deficient, scipy emits ``LinAlgWarning: Matrix is
singular`` inside ``sqrtm``, and the eps-jitter branch below kicks in —
exactly as the reference behaves on the same inputs (sifid_score.py:152-156).
The warning is expected there, not a defect; the returned distance is the
jittered-covariance value on both sides.
"""

import functools

import numpy as np
import jax

from vst_tpu.eval.inception import BLOCK_INDEX_BY_DIM, inception_blocks


@functools.partial(jax.jit, static_argnames=("block",))
def _activations(params, img01, block: int):
    return inception_blocks(params, img01, block)[block]


def activation_statistics(params, img01, dims: int = 2048):
    """img01: (1, H, W, 3) RGB in [0, 1] → (mu (C,), sigma (C, C)) over
    spatial positions."""
    block = BLOCK_INDEX_BY_DIM[dims]
    act = np.asarray(_activations(params, img01, block))
    n, h, w, c = act.shape
    samples = act.reshape(n * h * w, c).astype(np.float64)
    mu = samples.mean(axis=0)
    sigma = np.cov(samples, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Numpy Fréchet distance (sifid_score.py:128-182)."""
    from scipy import linalg

    mu1 = np.atleast_1d(mu1)
    mu2 = np.atleast_1d(mu2)
    sigma1 = np.atleast_2d(sigma1)
    sigma2 = np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real

    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def sifid(params, img0_255: np.ndarray, img1_255: np.ndarray,
          dims: int = 2048) -> float:
    """SIFID between two HWC RGB 0–255 images (eval.py:246-276 wrapper uses
    dims=2048)."""
    a = np.asarray(img0_255, np.float32)[None] / 255.0
    b = np.asarray(img1_255, np.float32)[None] / 255.0
    m1, s1 = activation_statistics(params, a, dims)
    m2, s2 = activation_statistics(params, b, dims)
    return frechet_distance(m1, s1, m2, s2)

"""Golden-numerics regression tests.

tests/goldens/reference_numerics.npz pins outputs computed with the
functional-torch oracles (i.e. the REFERENCE's numerics) on fixed
seeds/inputs; these tests run WITHOUT torch and catch silent numeric drift
in future refactors.  Regenerate with tools/gen_goldens.py only when the
pinned semantics intentionally change.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke tier

from vst_tpu.models import adaattn, reconet, rtnstv, vgg
from vst_tpu.ops import vgg_normalize

GOLDENS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "goldens", "reference_numerics.npz")


@pytest.fixture(scope="module")
def goldens():
    with np.load(GOLDENS) as z:
        return {k: z[k] for k in z.files}


class TestGoldenNumerics:
    def test_reconet(self, goldens):
        p = reconet.init_reconet(7)
        out = np.asarray(reconet.reconet(p, jnp.asarray(goldens["input_x"]))[-1])
        np.testing.assert_allclose(out, goldens["reconet_styled"],
                                   rtol=2e-3, atol=2e-3)

    def test_sd1(self, goldens):
        p = reconet.init_reconet_sd1(7)
        out = np.asarray(reconet.reconet_sd1(p, jnp.asarray(goldens["input_x"]))[-1])
        np.testing.assert_allclose(out, goldens["sd1_styled"],
                                   rtol=2e-3, atol=2e-3)

    def test_sd2(self, goldens):
        p = reconet.init_reconet_sd2(7)
        out = np.asarray(reconet.reconet_sd2(p, jnp.asarray(goldens["input_x"]))[-1])
        np.testing.assert_allclose(out, goldens["sd2_styled"],
                                   rtol=2e-3, atol=2e-3)

    def test_rtnstv(self, goldens):
        p = rtnstv.init_stylizing_network(7)
        out = np.asarray(rtnstv.stylizing_network(p, jnp.asarray(goldens["input_x"])))
        np.testing.assert_allclose(out, goldens["rtnstv_styled"],
                                   rtol=2e-3, atol=2e-3)

    def test_vgg16_tap(self, goldens):
        p = vgg.init_vgg16_reconet(7)
        feats = vgg.vgg16_features(
            p, vgg_normalize(jnp.asarray(goldens["input_x"])))
        np.testing.assert_allclose(np.asarray(feats["relu3_3"]),
                                   goldens["vgg16_relu3_3"],
                                   rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("act", ["softmax", "cosine"])
    def test_adaattn(self, goldens, act):
        vp = vgg.init_vgg19_adaattn(7)
        ap = adaattn.init_stylizing_network(7)
        fc = vgg.vgg19_adaattn_features(vp, jnp.asarray(goldens["input_x"]))
        fs = vgg.vgg19_adaattn_features(vp, jnp.asarray(goldens["input_s"]))
        out = np.asarray(adaattn.stylizing_network(ap, fc, fs, act))
        np.testing.assert_allclose(out, goldens[f"adaattn_{act}"],
                                   rtol=5e-2, atol=5e-2)

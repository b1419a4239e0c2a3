"""Model-level parity: vst_tpu.models vs functional-torch oracles.

Each test: init our params (torch-default distributions), convert to torch
layout via the compat layer, run both implementations on the same input,
compare within float32 tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke tier
import torch

from vst_tpu.compat import jax_to_torch_arrays
from vst_tpu.models import adaattn, reconet, rtnstv, vgg
from tests import torch_refs as tr

KEY = jax.random.PRNGKey(42)


def nchw(x):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(x).transpose(0, 3, 1, 2)))


def to_nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def torch_state(params):
    return {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in jax_to_torch_arrays(params).items()}


def image(rng, n, h, w, c=3):
    return (rng.random((n, h, w, c)) * 255).astype(np.float32)


class TestVGG:
    @pytest.mark.parametrize(
        "init,apply,cfg,taps,normalize_inside",
        [
            (vgg.init_vgg16_reconet, vgg.vgg16_features, vgg.VGG16_CFG,
             vgg.VGG16_TAPS_RECONET, False),
            (vgg.init_vgg19_rtnstv, vgg.vgg19_rtnstv_features, vgg.VGG19_CFG,
             vgg.VGG19_TAPS_RTNSTV, True),
            (vgg.init_vgg19_adaattn, vgg.vgg19_adaattn_features, vgg.VGG19_CFG,
             vgg.VGG19_TAPS_ADAATTN, True),
        ],
    )
    def test_taps(self, rng, init, apply, cfg, taps, normalize_inside):
        params = init(KEY)
        x = image(rng, 1, 64, 80)
        if normalize_inside:
            ours = apply(params, jnp.asarray(x))
            t_in = tr.t_vgg_normalize(nchw(x))
        else:
            from vst_tpu.ops import vgg_normalize
            ours = apply(params, vgg_normalize(jnp.asarray(x)))
            t_in = tr.t_vgg_normalize(nchw(x))
        ref = tr.t_vgg_features(torch_state(params), t_in, cfg, taps)
        assert list(ours.keys()) == list(ref.keys())
        for name in ours:
            np.testing.assert_allclose(
                np.asarray(ours[name]), to_nhwc(ref[name]),
                rtol=1e-3, atol=1e-3, err_msg=name)


class TestReCoNetFamily:
    @pytest.mark.parametrize(
        "init,apply,t_apply,ntaps",
        [
            (reconet.init_reconet, reconet.reconet, tr.t_reconet, 3),
            (reconet.init_reconet_sd1, reconet.reconet_sd1, tr.t_reconet_sd1, 4),
            (reconet.init_reconet_sd2, reconet.reconet_sd2, tr.t_reconet_sd2, 3),
        ],
    )
    def test_forward(self, rng, init, apply, t_apply, ntaps):
        params = init(KEY)
        x = image(rng, 2, 48, 64)
        ours = apply(params, jnp.asarray(x))
        ref = t_apply(torch_state(params), nchw(x))
        assert len(ours) == len(ref) == ntaps
        for i, (o, r) in enumerate(zip(ours, ref)):
            np.testing.assert_allclose(
                np.asarray(o), to_nhwc(r), rtol=2e-3, atol=2e-3,
                err_msg=f"tap {i}")

    def test_multiframe_input(self, rng):
        params = reconet.init_reconet(KEY, input_frame_num=4)
        x = image(rng, 1, 32, 32, 12)
        ours = reconet.reconet(params, jnp.asarray(x))
        ref = tr.t_reconet(torch_state(params), nchw(x))
        np.testing.assert_allclose(
            np.asarray(ours[-1]), to_nhwc(ref[-1]), rtol=2e-3, atol=2e-3)

    def test_output_range(self, rng):
        """ConvTanh head: output in [127.5-150, 127.5+150]."""
        params = reconet.init_reconet(KEY)
        out = reconet.reconet(params, jnp.asarray(image(rng, 1, 32, 32)))[-1]
        assert float(out.min()) >= 255 / 2 - 150 - 1e-3
        assert float(out.max()) <= 255 / 2 + 150 + 1e-3


class TestRTNSTV:
    def test_forward(self, rng):
        params = rtnstv.init_stylizing_network(KEY)
        x = image(rng, 2, 48, 64)
        ours = rtnstv.stylizing_network(params, jnp.asarray(x))
        ref = tr.t_rtnstv(torch_state(params), nchw(x))
        assert ours.shape == (2, 48, 64, 3)
        np.testing.assert_allclose(
            np.asarray(ours), to_nhwc(ref), rtol=2e-3, atol=2e-3)


class TestAdaAttN:
    def _features(self, rng, h, w):
        vgg_params = vgg.init_vgg19_adaattn(KEY)
        c = image(rng, 1, h, w)
        s = image(rng, 1, h, w)
        fc = vgg.vgg19_adaattn_features(vgg_params, jnp.asarray(c))
        fs = vgg.vgg19_adaattn_features(vgg_params, jnp.asarray(s))
        t_state = torch_state(vgg_params)
        t_fc = tr.t_vgg_features(t_state, tr.t_vgg_normalize(nchw(c)),
                                 vgg.VGG19_CFG, vgg.VGG19_TAPS_ADAATTN)
        t_fs = tr.t_vgg_features(t_state, tr.t_vgg_normalize(nchw(s)),
                                 vgg.VGG19_CFG, vgg.VGG19_TAPS_ADAATTN)
        return fc, fs, t_fc, t_fs

    @pytest.mark.parametrize("activation", ["softmax", "cosine"])
    def test_full_stylizer(self, rng, activation):
        params = adaattn.init_stylizing_network(KEY)
        fc, fs, t_fc, t_fs = self._features(rng, 64, 64)
        ours = adaattn.stylizing_network(params, fc, fs, activation, mode="exact")
        ref = tr.t_adaattn_stylizer(torch_state(params), t_fc, t_fs, activation)
        np.testing.assert_allclose(
            np.asarray(ours), to_nhwc(ref), rtol=5e-2, atol=5e-2)

    @pytest.mark.parametrize("activation", ["softmax", "cosine"])
    def test_adaattn_no_conv(self, rng, activation):
        fc, fs, t_fc, t_fs = self._features(rng, 64, 64)
        fcl, fsl = list(fc.values()), list(fs.values())
        t_fcl, t_fsl = list(t_fc.values()), list(t_fs.values())
        from vst_tpu.ops import feature_down_sample
        for i in range(3):
            idx = i + 2
            ours = adaattn.adaattn_no_conv(
                fcl[idx], fsl[idx],
                feature_down_sample(fcl, idx), feature_down_sample(fsl, idx),
                activation, mode="exact")
            ref = tr.t_adaattn_module(
                {}, None, t_fcl[idx], t_fsl[idx],
                tr.t_feature_down_sample(t_fcl, idx),
                tr.t_feature_down_sample(t_fsl, idx), activation)
            np.testing.assert_allclose(
                np.asarray(ours), to_nhwc(ref), rtol=2e-2, atol=2e-2,
                err_msg=f"level {i}")

    def test_cosine_linear_equals_exact(self, rng):
        """The closed linear form must reproduce materialized cos attention."""
        b, n, m, d, c = 2, 300, 200, 64, 32
        q = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((b, m, d)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((b, m, c)).astype(np.float32))
        m1e, m2e = adaattn.attention_moments(q, k, v, "cosine", mode="exact")
        m1l, m2l = adaattn.attention_moments(q, k, v, "cosine", mode="auto")
        np.testing.assert_allclose(np.asarray(m1l), np.asarray(m1e),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(m2l), np.asarray(m2e),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("activation,mode", [
        ("cosine", "auto"), ("cosine", "exact"), ("softmax", "auto")])
    def test_cached_style_state_equals_full(self, rng, activation, mode):
        """The per-clip cached-style serving path (style pyramid/IN/g/h/K̂ᵀV
        precomputed once) must reproduce the full stylizer."""
        params = adaattn.init_stylizing_network(KEY)
        fc, fs, _, _ = self._features(rng, 64, 96)
        batch = 2
        fc2 = {k: jnp.concatenate([v, v + 1.0]) for k, v in fc.items()}
        fsb = {k: jnp.broadcast_to(v, (batch,) + v.shape[1:])
               for k, v in fs.items()}
        ref = adaattn.stylizing_network(params, fc2, fsb, activation, mode)
        state = adaattn.style_state(params, fs, activation, mode)
        got = jax.jit(lambda p, f, s: adaattn.stylizing_network_cached(
            p, f, s, activation, mode))(params, fc2, state)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_softmax_chunked_equals_exact(self, rng):
        b, n, m, d, c = 1, 260, 180, 48, 24
        q = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((b, m, d)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((b, m, c)).astype(np.float32))
        from vst_tpu.models.adaattn import (
            _attention_moments_softmax_chunked,
            _attention_moments_softmax_exact,
        )
        from jax import lax
        m1e, m2e = _attention_moments_softmax_exact(q, k, v, lax.Precision.HIGHEST)
        m1c, m2c = _attention_moments_softmax_chunked(
            q, k, v, lax.Precision.HIGHEST, chunk=64)
        np.testing.assert_allclose(np.asarray(m1c), np.asarray(m1e),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m2c), np.asarray(m2e),
                                   rtol=1e-5, atol=1e-5)


class TestBF16Consistency:
    """bf16 inference must stay close to f32 (the serving path runs bf16)."""

    def test_reconet_bf16(self, rng):
        params = reconet.init_reconet(KEY)
        x = image(rng, 1, 64, 64)
        f32 = np.asarray(reconet.reconet(params, jnp.asarray(x))[-1])
        pb = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
        bf = np.asarray(reconet.reconet(
            pb, jnp.asarray(x, jnp.bfloat16))[-1], dtype=np.float32)
        # outputs are 0..255; bf16 carries ~2-3 decimal digits
        assert np.abs(bf - f32).mean() < 2.0
        assert np.abs(bf - f32).max() < 30.0

    def test_adaattn_bf16(self, rng):
        vgg_params = vgg.init_vgg19_adaattn(KEY)
        params = adaattn.init_stylizing_network(KEY)
        c = image(rng, 1, 64, 64)
        s = image(rng, 1, 64, 64)
        fc = vgg.vgg19_adaattn_features(vgg_params, jnp.asarray(c))
        fs = vgg.vgg19_adaattn_features(vgg_params, jnp.asarray(s))
        f32 = np.asarray(adaattn.stylizing_network(params, fc, fs, "cosine"))
        vb = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), vgg_params)
        pb = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
        fcb = vgg.vgg19_adaattn_features(vb, jnp.asarray(c, jnp.bfloat16))
        fsb = vgg.vgg19_adaattn_features(vb, jnp.asarray(s, jnp.bfloat16))
        bf = np.asarray(adaattn.stylizing_network(pb, fcb, fsb, "cosine"),
                        dtype=np.float32)
        denom = np.abs(f32).mean() + 1e-6
        assert np.abs(bf - f32).mean() / denom < 0.1

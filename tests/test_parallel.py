"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vst_tpu.models import reconet, rtnstv, vgg
from vst_tpu.parallel import make_mesh, replicate, shard_batch, shard_spatial
from vst_tpu.train import config as C
from vst_tpu.train import steps
from vst_tpu.train.state import create, make_optimizer

pytestmark = [
    pytest.mark.slow,  # compile-heavy; excluded from the smoke tier
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs 8 virtual devices"),
]


def _batch(rng, n, h, w):
    img1 = jnp.asarray((rng.random((n, h, w, 3)) * 255).astype(np.float32))
    img2 = jnp.asarray((rng.random((n, h, w, 3)) * 255).astype(np.float32))
    flow = jnp.asarray((rng.standard_normal((n, h, w, 2)) * 2).astype(np.float32))
    mask = jnp.asarray((rng.random((n, h, w)) > 0.2).astype(np.float32))
    return img1, img2, flow, mask


class TestDataParallelTraining:
    def test_dp_step_matches_single_device(self, rng):
        """The same batch must produce the same loss and updated params
        whether run on one device or sharded over 8 (XLA inserts the
        gradient all-reduce; math is identical)."""
        h, w = 16, 24
        cfg = dataclasses.replace(C.RECONET_CANDY, img_size=(h, w))
        vgg_params = vgg.init_vgg16_reconet(0)
        style = jnp.asarray((rng.random((1, h, w, 3)) * 255).astype(np.float32))
        grams = steps.reconet_style_grams(vgg_params, style)
        opt = make_optimizer(cfg.lr)
        params = reconet.init_reconet(0)
        batch = _batch(rng, 8, h, w)

        step_single = steps.make_reconet_flow_step(cfg, vgg_params, grams, opt)
        s1, m1 = step_single(create(params, opt), batch)

        mesh = make_mesh(8, ("data",))
        vgg_r = replicate(mesh, vgg_params)
        grams_r = replicate(mesh, grams)
        step_dp = steps.make_reconet_flow_step(cfg, vgg_r, grams_r, opt)
        state_r = replicate(mesh, create(reconet.init_reconet(0), opt))
        batch_r = shard_batch(mesh, batch)
        s2, m2 = step_dp(state_r, batch_r)

        for key in m1:
            np.testing.assert_allclose(float(m1[key]), float(m2[key]),
                                       rtol=1e-4, err_msg=key)
        # Adam normalizes each update to ±lr, so fp reduction-order noise in
        # near-zero gradients can flip a step's sign: params agree to 2·lr.
        for k in s1.params:
            np.testing.assert_allclose(
                np.asarray(s1.params[k]), np.asarray(s2.params[k]),
                atol=2.1 * cfg.lr, err_msg=k)

    def test_batch_sharding_layout(self, rng):
        mesh = make_mesh(8, ("data",))
        x = jnp.zeros((8, 4, 4, 3))
        xs = shard_batch(mesh, x)
        assert xs.sharding.spec == P("data", None, None, None)


class TestSpatialSharding:
    def test_h_sharded_inference_matches_replicated(self, rng):
        params = rtnstv.init_stylizing_network(0)
        x = jnp.asarray((rng.random((1, 64, 32, 3)) * 255).astype(np.float32))

        ref = np.asarray(rtnstv.stylizing_network(params, x))

        mesh = Mesh(np.asarray(jax.devices()[:8]), ("space",))
        params_r = jax.device_put(params, NamedSharding(mesh, P()))
        xs = shard_spatial(mesh, x)

        @jax.jit
        def infer(p, x):
            return rtnstv.stylizing_network(p, x)

        out = np.asarray(infer(params_r, xs))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3)


class TestSequenceParallelAttention:
    def test_matches_single_device_linear_form(self, rng):
        from vst_tpu.models.adaattn import attention_moments
        from vst_tpu.parallel.attention import sharded_cosine_attention_moments

        b, n, m, d, c = 1, 64, 64, 24, 16
        q = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((b, m, d)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((b, m, c)).astype(np.float32))
        m1_ref, m2_ref = attention_moments(q, k, v, "cosine")

        mesh = make_mesh(8, ("data",))
        spec = NamedSharding(mesh, P(None, "data", None))
        qs = jax.device_put(q, spec)
        ks = jax.device_put(k, spec)
        vs = jax.device_put(v, spec)
        m1, m2 = sharded_cosine_attention_moments(mesh, qs, ks, vs)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m1_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m2_ref),
                                   rtol=1e-4, atol=1e-5)


class TestMeshStylizer:
    def test_adaattn_with_mesh_matches_single(self, rng):
        """Full AdaAttN stylizer with mesh-sharded cosine attention matches
        the single-device result."""
        from vst_tpu.models import adaattn, vgg

        vp = vgg.init_vgg19_adaattn(0)
        ap = adaattn.init_stylizing_network(1)
        c = jnp.asarray((rng.random((1, 64, 64, 3)) * 255).astype(np.float32))
        s = jnp.asarray((rng.random((1, 64, 64, 3)) * 255).astype(np.float32))
        fc = vgg.vgg19_adaattn_features(vp, c)
        fs = vgg.vgg19_adaattn_features(vp, s)
        ref = np.asarray(adaattn.stylizing_network(ap, fc, fs, "cosine"))
        mesh = make_mesh(8, ("data",))
        out = np.asarray(adaattn.stylizing_network(ap, fc, fs, "cosine",
                                                   mesh=mesh))
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


class TestRingSoftmaxAttention:
    def test_matches_single_device_exact(self, rng):
        """Ring attention (ppermuted K/V blocks + online softmax) must
        equal the single-device exact softmax moments."""
        from vst_tpu.models.adaattn import attention_moments
        from vst_tpu.parallel.attention import (
            sharded_softmax_attention_moments,
        )

        b, n, m, d, c = 2, 64, 64, 24, 16
        q = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((b, m, d)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((b, m, c)).astype(np.float32))
        m1_ref, m2_ref = attention_moments(q, k, v, "softmax", mode="exact")

        mesh = make_mesh(8, ("data",))
        spec = NamedSharding(mesh, P(None, "data", None))
        m1, m2 = sharded_softmax_attention_moments(
            mesh, jax.device_put(q, spec), jax.device_put(k, spec),
            jax.device_put(v, spec))
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m1_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m2_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_extreme_scores_stay_finite(self, rng):
        """The online rescaling must survive score magnitudes that would
        overflow a naive exp (the reason flash softmax tracks a running
        max at all)."""
        from vst_tpu.models.adaattn import attention_moments
        from vst_tpu.parallel.attention import (
            sharded_softmax_attention_moments,
        )

        b, n, m, d, c = 1, 32, 32, 8, 4
        q = jnp.asarray(
            (rng.standard_normal((b, n, d)) * 30).astype(np.float32))
        k = jnp.asarray(
            (rng.standard_normal((b, m, d)) * 30).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((b, m, c)).astype(np.float32))
        m1_ref, m2_ref = attention_moments(q, k, v, "softmax", mode="exact")
        mesh = make_mesh(8, ("data",))
        spec = NamedSharding(mesh, P(None, "data", None))
        m1, m2 = sharded_softmax_attention_moments(
            mesh, jax.device_put(q, spec), jax.device_put(k, spec),
            jax.device_put(v, spec))
        assert np.all(np.isfinite(np.asarray(m1)))
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m1_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m2_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_full_softmax_stylizer_with_mesh(self, rng):
        """The one-program sharded AdaAttN pipeline also serves the IMAGE
        model's softmax activation through the ring path."""
        from vst_tpu.infer.image import stylize_adaattn, stylize_adaattn_sharded
        from vst_tpu.models import vgg as vgg_m
        from vst_tpu.models.adaattn import init_stylizing_network

        vp = vgg_m.init_vgg19_adaattn(0)
        ap = init_stylizing_network(1)
        c = jnp.asarray((rng.random((1, 128, 128, 3)) * 255).astype(np.float32))
        s = jnp.asarray((rng.random((1, 128, 128, 3)) * 255).astype(np.float32))
        ref = np.asarray(stylize_adaattn(vp, ap, c, s, "softmax"))
        mesh = make_mesh(8, ("space",))
        out = stylize_adaattn_sharded(vp, ap, c, s, mesh,
                                      activation="softmax")
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=5e-2)


class TestSpatialInferHelper:
    def test_matches_single_device(self, rng):
        from vst_tpu.infer.image import stylize_reconet, stylize_spatial_sharded
        from vst_tpu.models import reconet

        params = reconet.init_reconet(0)
        x = jnp.asarray((rng.random((1, 64, 32, 3)) * 255).astype(np.float32))
        ref = np.asarray(stylize_reconet(params, x))
        mesh = make_mesh(8, ("space",))
        out = np.asarray(stylize_spatial_sharded(params, x, mesh))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=2e-3)


class Test2DMeshComposition:
    def test_make_mesh_auto_factor(self):
        mesh = make_mesh(8, ("data", "space"))
        assert mesh.devices.shape == (4, 2)
        assert mesh.axis_names == ("data", "space")

    def test_dp_plus_spatial_training_step(self, rng):
        """2-D composition: batch sharded on "data" WHILE H is sharded on
        "space" — data-parallel training over frames split across chips.
        Must match the single-device step (VERDICT r1 item 10)."""
        from vst_tpu.parallel import shard_batch_spatial

        h, w = 32, 24
        cfg = dataclasses.replace(C.RECONET_CANDY, img_size=(h, w))
        vgg_params = vgg.init_vgg16_reconet(0)
        style = jnp.asarray((rng.random((1, h, w, 3)) * 255).astype(np.float32))
        grams = steps.reconet_style_grams(vgg_params, style)
        opt = make_optimizer(cfg.lr)
        batch = _batch(rng, 4, h, w)

        step_single = steps.make_reconet_flow_step(cfg, vgg_params, grams, opt)
        s1, m1 = step_single(create(reconet.init_reconet(0), opt), batch)

        mesh = make_mesh(8, ("data", "space"))
        vgg_r = replicate(mesh, vgg_params)
        grams_r = replicate(mesh, grams)
        step_2d = steps.make_reconet_flow_step(cfg, vgg_r, grams_r, opt)
        state_r = replicate(mesh, create(reconet.init_reconet(0), opt))
        batch_r = shard_batch_spatial(mesh, batch)
        assert batch_r[0].sharding.spec == P("data", "space", None, None)
        s2, m2 = step_2d(state_r, batch_r)

        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-3)
        for k in s1.params:
            np.testing.assert_allclose(
                np.asarray(s1.params[k]), np.asarray(s2.params[k]),
                atol=2.1 * cfg.lr, err_msg=k)


class TestShardedAdaAttNProgram:
    def test_one_program_vgg_attention_decoder(self, rng):
        """VGG encode + sequence-parallel attention + decoder as ONE jitted
        multi-device program on an H-sharded frame must equal the
        single-device stylizer (VERDICT r2 item 4)."""
        from vst_tpu.infer.image import stylize_adaattn, stylize_adaattn_sharded
        from vst_tpu.models import vgg as vgg_m

        vp = vgg_m.init_vgg19_adaattn(0)
        ap = __import__("vst_tpu.models.adaattn",
                        fromlist=["x"]).init_stylizing_network(1)
        c = jnp.asarray((rng.random((1, 128, 128, 3)) * 255).astype(np.float32))
        s = jnp.asarray((rng.random((1, 128, 128, 3)) * 255).astype(np.float32))
        ref = np.asarray(stylize_adaattn(vp, ap, c, s, "cosine"))
        mesh = make_mesh(8, ("space",))
        out = stylize_adaattn_sharded(vp, ap, c, s, mesh)
        # the output stays H-sharded across the mesh (serving keeps it
        # device-resident); materialize and compare
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=5e-2)

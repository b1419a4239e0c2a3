"""Pallas kernel tests (interpreter mode on the CPU test mesh; the compiled
path is exercised on real TPU by bench/integration runs)."""

import numpy as np
import jax.numpy as jnp
import pytest
from jax import lax

from vst_tpu.kernels import softmax_attention_moments_pallas
from vst_tpu.models.adaattn import _attention_moments_softmax_exact


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


class TestFusedAttentionMoments:
    @pytest.mark.parametrize(
        "n,m,d,c,bq,bk",
        [
            (256, 256, 64, 32, 128, 128),     # exact block multiples
            (300, 520, 96, 64, 128, 256),     # padding in both n and m
            (128, 700, 48, 24, 128, 256),     # k padding only
        ],
    )
    def test_matches_exact(self, rng, n, m, d, c, bq, bk):
        q = _rand(rng, 2, n, d)
        k = _rand(rng, 2, m, d)
        v = _rand(rng, 2, m, c)
        m1e, m2e = _attention_moments_softmax_exact(
            q, k, v, lax.Precision.HIGHEST)
        m1p, m2p = softmax_attention_moments_pallas(
            q, k, v, bq=bq, bk=bk, interpret=True)
        np.testing.assert_allclose(np.asarray(m1p), np.asarray(m1e),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(m2p), np.asarray(m2e),
                                   rtol=1e-4, atol=1e-4)

    def test_extreme_logits_stable(self, rng):
        """Online softmax must stay finite with large score magnitudes."""
        q = _rand(rng, 1, 128, 32) * 30
        k = _rand(rng, 1, 256, 32) * 30
        v = _rand(rng, 1, 256, 16)
        m1, m2 = softmax_attention_moments_pallas(
            q, k, v, bq=128, bk=128, interpret=True)
        assert np.isfinite(np.asarray(m1)).all()
        assert np.isfinite(np.asarray(m2)).all()
        m1e, m2e = _attention_moments_softmax_exact(
            q, k, v, lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m1e),
                                   rtol=1e-3, atol=1e-3)


class TestFusedAttentionVJP:
    def test_gradients_match_exact(self, rng):
        """Custom-VJP kernel grads vs autodiff of the exact formulation."""
        import jax

        b, n, m, d, c = 1, 200, 260, 48, 32
        q = _rand(rng, b, n, d)
        k = _rand(rng, b, m, d)
        v = _rand(rng, b, m, c)
        w1 = _rand(rng, b, n, c)
        w2 = _rand(rng, b, n, c)

        def loss_exact(q, k, v):
            m1, m2 = _attention_moments_softmax_exact(
                q, k, v, lax.Precision.HIGHEST)
            return jnp.sum(m1 * w1) + jnp.sum(m2 * w2)

        def loss_pallas(q, k, v):
            m1, m2 = softmax_attention_moments_pallas(
                q, k, v, bq=128, bk=128, interpret=True)
            return jnp.sum(m1 * w1) + jnp.sum(m2 * w2)

        ge = jax.grad(loss_exact, argnums=(0, 1, 2))(q, k, v)
        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        for name, a, bb in zip("qkv", ge, gp):
            np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                       rtol=2e-3, atol=2e-3,
                                       err_msg=f"d{name}")

    def test_exp2_forward_and_grads_match(self, rng):
        """Base-2-domain softmax (exp2=True) agrees with the exp form in
        both directions — the scale is folded in f32 so only rounding
        differs."""
        import jax

        b, n, m, d, c = 1, 200, 260, 48, 32
        q = _rand(rng, b, n, d)
        k = _rand(rng, b, m, d)
        v = _rand(rng, b, m, c)
        w1 = _rand(rng, b, n, c)
        w2 = _rand(rng, b, n, c)

        m1e, m2e = _attention_moments_softmax_exact(
            q, k, v, lax.Precision.HIGHEST)
        m1p, m2p = softmax_attention_moments_pallas(
            q, k, v, bq=128, bk=128, interpret=True, exp2=True)
        np.testing.assert_allclose(np.asarray(m1p), np.asarray(m1e),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(m2p), np.asarray(m2e),
                                   rtol=1e-4, atol=1e-4)

        def loss(fn):
            def f(q, k, v):
                m1, m2 = fn(q, k, v)
                return jnp.sum(m1 * w1) + jnp.sum(m2 * w2)
            return f

        ge = jax.grad(loss(lambda q, k, v: _attention_moments_softmax_exact(
            q, k, v, lax.Precision.HIGHEST)), argnums=(0, 1, 2))(q, k, v)
        gp = jax.grad(loss(lambda q, k, v: softmax_attention_moments_pallas(
            q, k, v, bq=128, bk=128, interpret=True, exp2=True)),
            argnums=(0, 1, 2))(q, k, v)
        for name, a, bb in zip("qkv", ge, gp):
            np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                       rtol=2e-3, atol=2e-3,
                                       err_msg=f"d{name}")

    def test_exp2_extreme_logits_stable(self, rng):
        q = _rand(rng, 1, 128, 32) * 30
        k = _rand(rng, 1, 256, 32) * 30
        v = _rand(rng, 1, 256, 16)
        m1, m2 = softmax_attention_moments_pallas(
            q, k, v, bq=128, bk=128, interpret=True, exp2=True)
        assert np.isfinite(np.asarray(m1)).all()
        assert np.isfinite(np.asarray(m2)).all()
        m1e, m2e = _attention_moments_softmax_exact(
            q, k, v, lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m1e),
                                   rtol=1e-3, atol=1e-3)

    def test_forward_unchanged_by_vjp_wrapper(self, rng):
        q = _rand(rng, 2, 300, 64)
        k = _rand(rng, 2, 520, 64)
        v = _rand(rng, 2, 520, 32)
        m1e, m2e = _attention_moments_softmax_exact(
            q, k, v, lax.Precision.HIGHEST)
        m1p, m2p = softmax_attention_moments_pallas(
            q, k, v, bq=128, bk=256, interpret=True)
        np.testing.assert_allclose(np.asarray(m1p), np.asarray(m1e),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(m2p), np.asarray(m2e),
                                   rtol=1e-4, atol=1e-4)


class TestHeadConvKernel:
    """kernels/head_conv.py — packed 3×3 VALID conv vs lax.conv."""

    @pytest.mark.parametrize("n,ho,wo,c,co,bh", [
        (2, 16, 32, 24, 12, 8),     # generic
        (1, 32, 32, 48, 48, 8),     # head-like packed channels (scaled)
        (2, 8, 16, 16, 4, 8),       # single row-block
    ])
    def test_matches_lax_conv(self, rng, n, ho, wo, c, co, bh):
        from vst_tpu.kernels.head_conv import conv3x3_valid_pallas
        from vst_tpu.ops.conv import _DIMNUMS

        x = _rand(rng, n, ho + 2, wo + 2, c)
        w = _rand(rng, 3, 3, c, co) * 0.1
        ref = lax.conv_general_dilated(x, w, (1, 1), "VALID",
                                       dimension_numbers=_DIMNUMS)
        out = conv3x3_valid_pallas(x, w, bh=bh, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_polyphase_head_routes_identically(self, rng):
        """conv2d_polyphase must give the same numbers whichever backend
        path it picks (on CPU it always uses lax.conv; this pins the
        pallas gate's correctness via the kernel in interpret mode)."""
        from vst_tpu.kernels.head_conv import conv3x3_valid_pallas
        from vst_tpu.ops.conv import conv2d_polyphase, _DIMNUMS

        # head-shaped: k=9 f=4 → t=3 packed conv over f²·C channels
        x = _rand(rng, 1, 40, 40, 6)          # padded input (VALID k9 → 32²)
        w = _rand(rng, 9, 9, 6, 3) * 0.1
        ref = conv2d_polyphase(x, w, None, factor=4)
        direct = lax.conv_general_dilated(x, w, (1, 1), "VALID",
                                          dimension_numbers=_DIMNUMS)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(direct),
                                   rtol=1e-3, atol=1e-3)


class TestFusedResBlock:
    """kernels/res_block.py — conv+IN-stats epilogue / normalize+relu
    prologue fusion vs the reference composition (interpret mode)."""

    def _params(self, rng=None):
        from vst_tpu.models import reconet

        return reconet.init_reconet(0)

    def test_f32_parity(self, rng):
        import jax.numpy as jnp

        from vst_tpu.kernels.res_block import residual_block_fused
        from vst_tpu.models import reconet

        params = self._params()
        x = jnp.asarray((rng.standard_normal((2, 16, 24, 192)) * 3)
                        .astype(np.float32))
        ref = reconet.residual_block(params, "res1", x)
        ours = residual_block_fused(params, "res1", x, interpret=True)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_bf16_parity(self, rng):
        import jax
        import jax.numpy as jnp

        from vst_tpu.kernels.res_block import residual_block_fused
        from vst_tpu.models import reconet

        params = jax.tree.map(lambda v: jnp.asarray(v, jnp.bfloat16),
                              self._params())
        x = jnp.asarray((rng.standard_normal((2, 16, 24, 192)) * 3)
                        .astype(np.float32)).astype(jnp.bfloat16)
        ref = np.asarray(reconet.residual_block(params, "res1", x)
                         .astype(jnp.float32))
        ours = np.asarray(residual_block_fused(params, "res1", x,
                                               interpret=True)
                          .astype(jnp.float32))
        # bf16 rounding points differ (kernel rounds once post-f32-accum);
        # bound by a few bf16 ulps of the output scale
        scale = np.abs(ref).max()
        assert np.abs(ours - ref).max() <= 0.02 * scale

    def test_model_fused_res_wiring(self, rng):
        """The fused_res serving route through the FULL model forward
        (models/reconet.py::_res_stack, interpret mode off-TPU) matches
        the plain composition — the wiring the on-chip A/B flips on
        (VERDICT r4 #1c)."""
        import jax.numpy as jnp

        from vst_tpu.models import reconet

        params = self._params()
        x = jnp.asarray((rng.random((1, 16, 24, 3)) * 255)
                        .astype(np.float32))
        ref = reconet.reconet(params, x)[-1]
        ours = reconet.reconet(params, x, fused_res=True)[-1]
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=1e-4, atol=1e-3)

    def test_conv_stats_match_ops(self, rng):
        """The epilogue stats must equal instance-norm's mean/biased-var
        of the conv output."""
        import jax.numpy as jnp

        from vst_tpu.kernels.res_block import conv3x3_in_stats
        from vst_tpu.models import reconet
        from vst_tpu.ops.pad import reflection_pad2d
        from vst_tpu.ops.conv import conv2d

        params = self._params()
        w = params["res1.conv1.conv2d.weight"]
        b = params["res1.conv1.conv2d.bias"]
        x = jnp.asarray(rng.standard_normal((1, 8, 16, 192))
                        .astype(np.float32))
        y, stats = conv3x3_in_stats(x, w, b, interpret=True)
        ref = conv2d(reflection_pad2d(x, 1), w, b, stride=1)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        yf = np.asarray(ref, np.float64)
        np.testing.assert_allclose(np.asarray(stats[0, 0]),
                                   yf.mean(axis=(0, 1, 2)), rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(stats[0, 1]),
                                   yf.var(axis=(0, 1, 2)), rtol=1e-3,
                                   atol=1e-5)

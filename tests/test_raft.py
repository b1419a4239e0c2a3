"""RAFT structural/behavioral tests (random weights — pretrained parity is
future work, see PARITY.md)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vst_tpu.models import raft


class TestComponents:
    def test_sample_bilinear_pixel(self, rng):
        img = jnp.asarray(rng.standard_normal((2, 8, 10)).astype(np.float32))
        # integer coords → exact values
        xy = jnp.asarray([[[3.0, 2.0], [0.0, 0.0]],
                          [[9.0, 7.0], [4.0, 4.0]]], jnp.float32)
        out = raft._sample_bilinear_pixel(img, xy)
        assert float(out[0, 0]) == pytest.approx(float(img[0, 2, 3]), abs=1e-5)
        assert float(out[1, 0]) == pytest.approx(float(img[1, 7, 9]), abs=1e-5)
        # halfway coords → average
        xy2 = jnp.asarray([[[3.5, 2.0]]] * 2, jnp.float32)
        out2 = raft._sample_bilinear_pixel(img, xy2)
        expect = 0.5 * (float(img[0, 2, 3]) + float(img[0, 2, 4]))
        assert float(out2[0, 0]) == pytest.approx(expect, abs=1e-5)

    def test_corr_pyramid_values(self, rng):
        f1 = jnp.asarray(rng.standard_normal((1, 4, 5, 8)).astype(np.float32))
        f2 = jnp.asarray(rng.standard_normal((1, 4, 5, 8)).astype(np.float32))
        pyr = raft.build_corr_pyramid(f1, f2, num_levels=2)
        assert pyr[0].shape == (20, 4, 5)
        assert pyr[1].shape == (20, 2, 2)
        # pixel (1,2) of f1 vs pixel (3,4) of f2
        p = 1 * 5 + 2
        expect = float(jnp.dot(f1[0, 1, 2], f2[0, 3, 4]) / np.sqrt(8))
        assert float(pyr[0][p, 3, 4]) == pytest.approx(expect, rel=1e-5)

    def test_lookup_identity_peak(self, rng):
        """With f2 = f1, the correlation at zero flow (center of the lookup
        window) is the squared norm — the maximum for normalized-ish
        features at the aligned position."""
        f = rng.standard_normal((1, 8, 8, 16)).astype(np.float32)
        fj = jnp.asarray(f)
        pyr = raft.build_corr_pyramid(fj, fj, num_levels=1)
        gx, gy = jnp.meshgrid(jnp.arange(8, dtype=jnp.float32),
                              jnp.arange(8, dtype=jnp.float32))
        coords = jnp.stack([gx, gy], -1)[None]
        feat = raft.lookup_corr([pyr[0]], coords, radius=1)
        # center of the 3×3 window = index 4
        center = np.asarray(feat)[0, :, :, 4]
        expect = (f[0] ** 2).sum(-1) / np.sqrt(16)
        np.testing.assert_allclose(center, expect, rtol=1e-4)

    def test_convex_upsample_constant(self):
        flow = jnp.full((1, 3, 4, 2), 1.5, jnp.float32)
        mask = jnp.zeros((1, 3, 4, 64 * 9), jnp.float32)
        up = raft.convex_upsample(flow, mask)
        assert up.shape == (1, 24, 32, 2)
        # interior coarse cells (zero padding leaks into the border cells'
        # combinations, matching unfold-with-padding semantics)
        np.testing.assert_allclose(np.asarray(up)[:, 8:-8, 8:-8], 12.0,
                                   rtol=1e-5)


class TestFullModel:
    def test_shapes_and_finiteness(self, rng):
        params = raft.init_raft(0)
        img1 = jnp.asarray((rng.random((1, 64, 96, 3)) * 2 - 1)
                           .astype(np.float32))
        img2 = jnp.asarray((rng.random((1, 64, 96, 3)) * 2 - 1)
                           .astype(np.float32))
        flow = raft.raft_flow(params, img1, img2, iters=3)
        assert flow.shape == (1, 64, 96, 2)
        assert np.isfinite(np.asarray(flow)).all()

    def test_differentiable(self, rng):
        params = raft.init_raft(0)
        img1 = jnp.asarray((rng.random((1, 32, 32, 3)) * 2 - 1)
                           .astype(np.float32))
        img2 = jnp.asarray((rng.random((1, 32, 32, 3)) * 2 - 1)
                           .astype(np.float32))

        def loss(p):
            return jnp.mean(jnp.square(raft.raft_flow(p, img1, img2, iters=2)))

        grads = jax.grad(loss)(params)
        gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in grads.values())
        assert np.isfinite(gnorm) and gnorm > 0

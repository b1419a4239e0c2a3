"""SIFID tests: inception structure, BasicConv/InceptionA torch parity,
Fréchet distance properties."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from vst_tpu.compat import jax_to_torch_arrays
from vst_tpu.eval.inception import (
    inception_blocks,
    init_inception,
    _basic_conv,
    _inception_a,
)
from vst_tpu.eval.sifid import frechet_distance, sifid


def nchw(x):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(x).transpose(0, 3, 1, 2)))


class TestStructure:
    def test_block_channels(self, rng):
        params = init_inception(0)
        x = jnp.asarray(rng.random((1, 299, 299, 3)).astype(np.float32))
        outs = inception_blocks(params, x, 3)
        chans = [o.shape[-1] for o in outs]
        assert chans == [64, 192, 768, 2048]
        # torchvision inception_v3 spatial sizes at 299² input
        assert outs[0].shape[1:3] == (147, 147)
        assert outs[1].shape[1:3] == (71, 71)
        assert outs[2].shape[1:3] == (17, 17)
        assert outs[3].shape[1:3] == (8, 8)


class TestTorchParity:
    def _torch_basic_conv(self, state, name, x, stride=1, padding=(0, 0)):
        w = state[name + ".conv.weight"]
        out = F.conv2d(x, w, stride=stride, padding=padding)
        out = F.batch_norm(
            out, state[name + ".bn.running_mean"],
            state[name + ".bn.running_var"], state[name + ".bn.weight"],
            state[name + ".bn.bias"], training=False, eps=1e-3)
        return F.relu(out)

    def test_basic_conv(self, rng):
        params = init_inception(1)
        state = {k: torch.from_numpy(np.ascontiguousarray(v))
                 for k, v in jax_to_torch_arrays(params).items()}
        x = rng.random((1, 3, 31, 31)).astype(np.float32)
        ref = self._torch_basic_conv(state, "Conv2d_1a_3x3",
                                     torch.from_numpy(x), stride=2)
        ours = _basic_conv(params, "Conv2d_1a_3x3",
                           jnp.asarray(x.transpose(0, 2, 3, 1)), stride=2)
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-3)

    def test_inception_a(self, rng):
        params = init_inception(2)
        state = {k: torch.from_numpy(np.ascontiguousarray(v))
                 for k, v in jax_to_torch_arrays(params).items()}
        x = rng.random((1, 192, 17, 17)).astype(np.float32)
        tx = torch.from_numpy(x)
        p = "Mixed_5b"
        b1 = self._torch_basic_conv(state, f"{p}.branch1x1", tx)
        b5 = self._torch_basic_conv(state, f"{p}.branch5x5_1", tx)
        b5 = self._torch_basic_conv(state, f"{p}.branch5x5_2", b5, padding=(2, 2))
        b3 = self._torch_basic_conv(state, f"{p}.branch3x3dbl_1", tx)
        b3 = self._torch_basic_conv(state, f"{p}.branch3x3dbl_2", b3, padding=(1, 1))
        b3 = self._torch_basic_conv(state, f"{p}.branch3x3dbl_3", b3, padding=(1, 1))
        bp = self._torch_basic_conv(state, f"{p}.branch_pool",
                                    F.avg_pool2d(tx, 3, stride=1, padding=1))
        ref = torch.cat([b1, b5, b3, bp], dim=1)
        ours = _inception_a(params, p, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-3)


class TestFrechet:
    def test_identical_distributions(self, rng):
        mu = rng.standard_normal(16)
        a = rng.standard_normal((100, 16))
        sigma = np.cov(a, rowvar=False)
        assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-6)

    def test_mean_shift(self, rng):
        mu1 = np.zeros(8)
        mu2 = np.ones(8)
        sigma = np.eye(8)
        assert frechet_distance(mu1, sigma, mu2, sigma) == pytest.approx(8.0, abs=1e-6)

    def test_sifid_self_is_zero(self, rng):
        params = init_inception(3)
        img = (rng.random((75, 75, 3)) * 255).astype(np.float32)
        val = sifid(params, img, img, dims=64)
        assert val == pytest.approx(0.0, abs=1e-3)

    def test_sifid_different_images(self, rng):
        params = init_inception(3)
        a = (rng.random((75, 75, 3)) * 255).astype(np.float32)
        b = (rng.random((75, 75, 3)) * 255).astype(np.float32)
        assert sifid(params, a, b, dims=64) > 0

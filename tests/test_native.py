"""Native I/O library vs numpy readers (bit-equality)."""

import numpy as np
import pytest

from vst_tpu.data import flowio
from vst_tpu.data import native


@pytest.mark.skipif(not native.available(), reason="libvstio.so not built")
class TestNativeIO:
    def test_pfm_color(self, tmp_path, rng):
        img = rng.standard_normal((9, 13, 3)).astype(np.float32)
        path = str(tmp_path / "a.pfm")
        flowio.write_pfm(path, img)
        np.testing.assert_array_equal(native.read_pfm(path), img)

    def test_pfm_gray(self, tmp_path, rng):
        img = rng.standard_normal((6, 8)).astype(np.float32)
        path = str(tmp_path / "g.pfm")
        flowio.write_pfm(path, img)
        np.testing.assert_array_equal(native.read_pfm(path), img)

    def test_flo(self, tmp_path, rng):
        flow = rng.standard_normal((12, 17, 2)).astype(np.float32)
        path = str(tmp_path / "a.flo")
        flowio.write_flo(path, flow)
        np.testing.assert_array_equal(native.read_flo(path), flow)

    def test_batch_pfm(self, tmp_path, rng):
        paths = []
        ref = []
        for i in range(7):
            arr = rng.standard_normal((5, 6, 3)).astype(np.float32)
            p = str(tmp_path / f"{i}.pfm")
            flowio.write_pfm(p, arr)
            paths.append(p)
            ref.append(arr)
        out = native.read_flow_batch(paths, (5, 6, 3), num_threads=4)
        np.testing.assert_array_equal(out, np.stack(ref))

    def test_batch_flo(self, tmp_path, rng):
        paths = []
        ref = []
        for i in range(5):
            arr = rng.standard_normal((4, 7, 2)).astype(np.float32)
            p = str(tmp_path / f"{i}.flo")
            flowio.write_flo(p, arr)
            paths.append(p)
            ref.append(arr)
        out = native.read_flow_batch(paths, (4, 7, 2), num_threads=4)
        np.testing.assert_array_equal(out, np.stack(ref))

    def test_matches_numpy_reader(self, tmp_path, rng):
        img = rng.standard_normal((8, 9, 3)).astype(np.float32)
        path = str(tmp_path / "m.pfm")
        flowio.write_pfm(path, img)
        np.testing.assert_array_equal(native.read_pfm(path),
                                      flowio.read_pfm(path)[0])

"""Multi-host SPMD layer (parallel/multihost.py + loader/loop/CLI wiring).

The fast tier checks the process-sharded BatchLoader and the
single-process fallbacks; the slow tier launches a REAL 2-process JAX
distributed runtime (Gloo collectives over localhost, 2 virtual CPU
devices per process = a 4-device global mesh) through the train CLI and
asserts the result matches the equivalent single-process data-parallel
run — the multi-host story the single-GPU reference has no counterpart
for (SURVEY.md §2 parallelism table).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from vst_tpu.data.pipeline import BatchLoader

from tests.test_data import _make_sceneflow_scene

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class _Range:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((2, 3), i, np.float32)


class TestProcessShardedLoader:
    def test_shards_concat_to_global_batch(self):
        """Per-process loaders slice the SAME seed-derived global order:
        concatenating their batches reproduces the single-process batch."""
        whole = list(BatchLoader(_Range(12), 4, seed=7, num_workers=0))
        parts = [list(BatchLoader(_Range(12), 4, seed=7, num_workers=0,
                                  process_id=p, num_processes=2))
                 for p in range(2)]
        assert len(whole) == len(parts[0]) == len(parts[1]) == 3
        for b, (b0, b1) in zip(whole, zip(*parts)):
            np.testing.assert_array_equal(b, np.concatenate([b0, b1]))

    def test_batch_count_and_start_batch_are_global(self):
        loader = BatchLoader(_Range(12), 4, seed=7, num_workers=0,
                             process_id=1, num_processes=2, start_batch=2)
        assert len(loader) == 3          # global batches
        batches = list(loader)
        assert len(batches) == 1         # skipped 2 global batches
        assert batches[0].shape[0] == 2  # local slice of the global 4

    def test_indivisible_batch_rejected(self):
        with pytest.raises(ValueError, match="divide"):
            BatchLoader(_Range(12), 5, num_processes=2)

    def test_drop_last_false_rejected(self):
        """A short final batch would slice unequal per-process shards and
        break fixed-shape global assembly — reject it up front."""
        with pytest.raises(ValueError, match="drop_last"):
            BatchLoader(_Range(10), 4, num_processes=2, drop_last=False)


class TestSingleProcessFallbacks:
    def test_put_global_batch_single_process(self):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vst_tpu.parallel import make_mesh
        from vst_tpu.parallel.multihost import put_global_batch

        mesh = make_mesh(4, ("data",))
        x = np.arange(8, dtype=np.float32).reshape(4, 2)
        arr = put_global_batch(NamedSharding(mesh, P("data")), x)
        np.testing.assert_array_equal(np.asarray(arr), x)
        assert jax.process_count() == 1

    def test_replicate_global_single_process(self):
        from vst_tpu.parallel import make_mesh
        from vst_tpu.parallel.multihost import replicate_global

        mesh = make_mesh(4, ("data",))
        tree = {"w": np.ones((3,), np.float32)}
        out = replicate_global(mesh, tree)
        np.testing.assert_array_equal(np.asarray(out["w"]), tree["w"])
        assert len(out["w"].sharding.device_set) == 4


class TestNonPrimaryProcess:
    def test_trains_but_writes_nothing(self, tmp_path, monkeypatch):
        """On a non-primary process run_training must run every step (the
        jitted step is collective in multi-host runs) yet write no
        checkpoints, plots, or metric lines — process 0 owns those."""
        import jax.numpy as jnp

        from vst_tpu.train import loop as train_loop
        from vst_tpu.train.state import TrainState

        monkeypatch.setattr(train_loop, "_primary", lambda: False)

        class _DS:
            def __len__(self):
                return 8

            def __getitem__(self, i):
                return np.full((2, 2), float(i), np.float32)

        def step(state, batch):
            new = TrainState(params={"w": state.params["w"] + 1.0},
                             opt_state=(), step=state.step + 1)
            return new, {"loss": jnp.sum(new.params["w"])}

        metrics = str(tmp_path / "m.jsonl")
        final = train_loop.run_training(
            step, TrainState(params={"w": jnp.zeros((2,))}, opt_state=(),
                             step=jnp.zeros((), jnp.int32)),
            _DS(), batch_size=2, epochs=1, out_dir=str(tmp_path / "out"),
            export_pth=False, log_every=1, num_workers=0,
            save_every_steps=1, model_name="toy", metrics_jsonl=metrics)
        assert int(final.step) == 4          # all batches consumed
        assert os.listdir(tmp_path / "out") == []
        assert not os.path.exists(metrics)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
class TestTwoProcessTraining:
    def test_matches_single_process_data_parallel(self, tmp_path, rng):
        """Two real OS processes (2 virtual CPU devices each) train rtnstv
        over a 4-device global mesh via `--multihost`; final params match
        the single-process `--data-parallel 4` run on identical data."""
        from vst_tpu.cli import train as cli_train

        root = str(tmp_path / "sceneflow")
        _make_sceneflow_scene(os.path.join(root, "monkaa"), rng, 5,
                              "monkaa")
        _make_sceneflow_scene(os.path.join(root, "flyingthings3d"), rng, 5,
                              "ft3d")
        from PIL import Image

        style = str(tmp_path / "style.png")
        Image.fromarray(rng.integers(0, 255, (24, 32, 3),
                                     dtype=np.uint8)).save(style)

        common = ["--trainer", "rtnstv", "--data", root, "--style", style,
                  "--epochs", "1", "--batch-size", "4",
                  "--img-size", "24", "32", "--log-every", "1"]

        # reference run: single process, 4-device data parallelism
        single_dir = str(tmp_path / "single")
        single_metrics = str(tmp_path / "single_metrics.jsonl")
        cli_train.main(common + ["--out-dir", single_dir,
                                 "--data-parallel", "4",
                                 "--metrics-jsonl", single_metrics])

        # multi-host run: 2 processes × 2 devices
        multi_dir = str(tmp_path / "multi")
        port = _free_port()
        metrics = str(tmp_path / "metrics.jsonl")
        env = dict(os.environ, VST_PLATFORM="cpu", PYTHONPATH=REPO,
                   XLA_FLAGS="--xla_force_host_platform_device_count=2")
        procs = []
        for pid in range(2):
            cmd = [sys.executable, "-m", "vst_tpu.cli.train"] + common + [
                "--out-dir", multi_dir,
                "--multihost", f"localhost:{port}",
                "--num-processes", "2", "--process-id", str(pid)]
            if pid == 0:
                cmd += ["--metrics-jsonl", metrics]
            procs.append(subprocess.Popen(
                cmd, env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True))
        outs = [p.communicate(timeout=540)[0] for p in procs]
        for p, out in zip(procs, outs):
            assert p.returncode == 0, f"proc failed:\n{out[-3000:]}"
        assert "process 0/2, 4 global / 2 local devices" in outs[0]

        # only process 0 wrote artifacts
        files = sorted(os.listdir(multi_dir))
        assert any(f.endswith(".npz") for f in files)

        # the multi-host run's per-step GLOBAL losses equal the
        # single-process data-parallel run's: same data order, same global
        # batch assembly, same objective.  This is the tight equivalence —
        # step-1 loss depends only on data+init, step-2 on the first
        # update too.
        ms = [json.loads(line) for line in open(single_metrics)]
        mm = [json.loads(line) for line in open(metrics)]
        assert [s["step"] for s in ms] == [s["step"] for s in mm] == [1, 2]
        for s, m in zip(ms, mm):
            for key in ("loss", "CL", "RL", "SL", "TL"):
                np.testing.assert_allclose(m[key], s[key], rtol=3e-5,
                                           err_msg=f"step {s['step']} {key}")

        # params agree within the Adam step envelope.  Exact equality is
        # NOT expected between different XLA programs: a measured control
        # (single-process DP-4 vs single-device, identical data) already
        # shows ~4e-3 max diffs — Adam's first steps are ±lr·ĝ/√v̂ ≈ ±lr
        # elementwise, so rounding-scale gradient differences (different
        # all-reduce orders) flip some updates by a full ±lr=1e-3.  The
        # loss equality above is the correctness proof; this bounds drift.
        from vst_tpu.train.checkpoint import load_params

        ps = load_params(os.path.join(single_dir,
                                      "rtnstv_epoch_1_batchSize_4.npz"))
        pm = load_params(os.path.join(multi_dir,
                                      "rtnstv_epoch_1_batchSize_4.npz"))
        assert set(ps) == set(pm)
        lr = 1e-3  # RTNSTVConfig.lr
        for k in ps:
            np.testing.assert_allclose(pm[k], ps[k], atol=6 * lr,
                                       err_msg=k)

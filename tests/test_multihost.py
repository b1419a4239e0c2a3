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


class TestHeartbeatFile:
    def test_touched_every_batch_on_non_primary(self, tmp_path,
                                                monkeypatch):
        """The --heartbeat-file liveness signal must advance on NON-primary
        processes too (that is its whole point: the metrics sink doesn't),
        and be created up front so a supervisor can watch it from batch 0."""
        import time

        import jax.numpy as jnp

        from vst_tpu.train import loop as train_loop
        from vst_tpu.train.state import TrainState

        monkeypatch.setattr(train_loop, "_primary", lambda: False)

        class _DS:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                return np.full((2, 2), float(i), np.float32)

        hb = str(tmp_path / "hb" / "host0.touch")
        mtimes = []

        def step(state, batch):
            if os.path.exists(hb):
                mtimes.append(os.path.getmtime(hb))
            time.sleep(0.01)  # keep successive mtimes distinguishable
            new = TrainState(params={"w": state.params["w"] + 1.0},
                             opt_state=(), step=state.step + 1)
            return new, {"loss": jnp.sum(new.params["w"])}

        train_loop.run_training(
            step, TrainState(params={"w": jnp.zeros((2,))}, opt_state=(),
                             step=jnp.zeros((), jnp.int32)),
            _DS(), batch_size=2, epochs=1, out_dir=str(tmp_path / "out"),
            export_pth=False, log_every=1, num_workers=0,
            model_name="toy", heartbeat_file=hb)
        assert os.path.exists(hb)          # created before the first step
        assert len(mtimes) == 2            # seen by every batch's step
        assert os.path.getmtime(hb) > mtimes[0]  # advanced across batches
        # non-primary still writes no artifacts
        assert os.listdir(tmp_path / "out") == []


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


@pytest.mark.slow
class TestSupervisedMultihostRestart:
    def test_nonprimary_crash_restarts_cluster_to_completion(self, tmp_path,
                                                             rng):
        """Failure recovery ACROSS hosts: a real 2-process Gloo cluster
        trains under one supervisor per process (the production recipe in
        cli/supervise.py's docstring); the NON-primary process os._exits
        mid-epoch.  Its peer fails or stalls at the next collective, both
        supervisors restart their trainers, the restarted processes rejoin
        through jax.distributed.initialize, agree on the resume position
        (the shared out_dir guard in cli.train), and finish the run —
        final epoch artifacts exist and both supervisors report rc 0."""
        import textwrap
        import threading
        import unittest.mock as mock

        from vst_tpu.train.supervisor import supervise

        root = str(tmp_path / "sceneflow")
        _make_sceneflow_scene(os.path.join(root, "monkaa"), rng, 5,
                              "monkaa")
        _make_sceneflow_scene(os.path.join(root, "flyingthings3d"), rng, 5,
                              "ft3d")
        from PIL import Image

        style = str(tmp_path / "style.png")
        Image.fromarray(rng.integers(0, 255, (24, 32, 3),
                                     dtype=np.uint8)).save(style)
        out_dir = str(tmp_path / "models")
        metrics = str(tmp_path / "metrics.jsonl")
        marker = str(tmp_path / "crashed_once")
        port = _free_port()

        # pid-1 wrapper: on its FIRST incarnation, os._exit as soon as the
        # primary's first mid-epoch checkpoint lands (both processes step
        # in lockstep, so pid 1 is mid-epoch then too)
        wrapper = tmp_path / "crashing_train.py"
        wrapper.write_text(textwrap.dedent(f"""
            import os, sys, threading, time
            marker = {marker!r}
            if not os.path.exists(marker):
                open(marker, "w").close()
                state = os.path.join({out_dir!r}, "rtnstv_last_state")
                def killer():
                    while not os.path.isdir(state):
                        time.sleep(0.1)
                    time.sleep(0.5)
                    os._exit(137)
                threading.Thread(target=killer, daemon=True).start()
            from vst_tpu.cli.train import main
            main(sys.argv[1:])
        """))

        common = ["--trainer", "rtnstv", "--data", root, "--style", style,
                  "--out-dir", out_dir, "--epochs", "1", "--batch-size",
                  "4", "--img-size", "24", "32", "--log-every", "1",
                  "--save-every-steps", "1", "--resume", "auto",
                  "--multihost", f"localhost:{port}",
                  "--num-processes", "2"]
        hb = [str(tmp_path / f"hb{i}.touch") for i in range(2)]
        cmds = {
            0: [sys.executable, "-m", "vst_tpu.cli.train"] + common + [
                "--process-id", "0", "--metrics-jsonl", metrics,
                "--heartbeat-file", hb[0]],
            1: [sys.executable, str(wrapper)] + common + [
                "--process-id", "1", "--heartbeat-file", hb[1]],
        }
        env = dict(os.environ, VST_PLATFORM="cpu", PYTHONPATH=REPO,
                   XLA_FLAGS="--xla_force_host_platform_device_count=2")
        real_popen = subprocess.Popen

        def run_env(cmd, **kw):
            return real_popen(cmd, env=env, **kw)

        results = {}

        def babysit(pid):
            # hang_timeout covers the Gloo-hang case (a dead peer usually
            # ERRORS the survivor, but a stall must also recover); it must
            # exceed the first compile plus the rejoin barrier
            results[pid] = supervise(
                cmds[pid], max_restarts=4, hang_timeout=150, grace=20,
                backoff=0, heartbeat=hb[pid], poll_interval=0.3,
                log=lambda *a: None)

        with mock.patch("vst_tpu.train.supervisor.subprocess.Popen",
                        run_env):
            threads = [threading.Thread(target=babysit, args=(i,))
                       for i in range(2)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=540)
            assert not any(t.is_alive() for t in threads), "supervisors hung"

        assert os.path.exists(marker)  # the crash really happened
        for pid in range(2):
            assert results[pid].returncode == 0, (
                pid, results[pid].returncode)
        assert results[1].restarts >= 1  # the crashed process was restarted

        # the run completed: epoch artifacts + monotone metrics steps
        files = os.listdir(out_dir)
        assert any(f.endswith(".npz") for f in files)
        steps = [json.loads(line)["step"] for line in open(metrics)]
        assert steps == sorted(steps) and steps[-1] == 2


@pytest.mark.slow
class TestMultihostOverhead:
    """Step-time parity of `--multihost` (2 proc × 4 dev) vs one process
    with 8 devices on the virtual CPU mesh (VERDICT r4 #6): quantifies
    what the multi-host abstraction itself costs (Gloo collectives +
    cross-process batch assembly) before real pod time exists.  The
    measured numbers are recorded in BENCH.md."""

    def _steady_step_time(self, metrics_path, skip=3):
        """Per-step seconds between logged batch `skip` and the last one.

        The jsonl's samples_per_s is CUMULATIVE from epoch start, so
        elapsed(i) = done_samples / rate; differencing two logged batches
        cancels the compile time buried in the early batches.
        """
        rows = [json.loads(line) for line in open(metrics_path)]
        assert len(rows) > skip + 3, "too few logged batches to difference"
        a, b = rows[skip], rows[-1]
        bs = 8

        def elapsed(r):
            return r["batch"] * bs / r["samples_per_s"]

        return (elapsed(b) - elapsed(a)) / (b["batch"] - a["batch"])

    def test_step_time_within_tolerance(self, tmp_path, rng):
        root = str(tmp_path / "sceneflow")
        _make_sceneflow_scene(os.path.join(root, "monkaa"), rng, 45,
                              "monkaa")
        _make_sceneflow_scene(os.path.join(root, "flyingthings3d"), rng, 45,
                              "ft3d")
        from PIL import Image

        style = str(tmp_path / "style.png")
        Image.fromarray(rng.integers(0, 255, (24, 32, 3),
                                     dtype=np.uint8)).save(style)

        common = ["--trainer", "rtnstv", "--data", root, "--style", style,
                  "--epochs", "1", "--batch-size", "8",
                  "--img-size", "24", "32", "--log-every", "1"]

        def run(cmds, env):
            procs = [subprocess.Popen(c, env=env, stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True)
                     for c in cmds]
            outs = [p.communicate(timeout=540)[0] for p in procs]
            for p, out in zip(procs, outs):
                assert p.returncode == 0, out[-3000:]

        # single process, 8-device data parallelism
        sm = str(tmp_path / "single_metrics.jsonl")
        env8 = dict(os.environ, VST_PLATFORM="cpu", PYTHONPATH=REPO,
                    XLA_FLAGS="--xla_force_host_platform_device_count=8")
        run([[sys.executable, "-m", "vst_tpu.cli.train"] + common + [
            "--out-dir", str(tmp_path / "single"), "--data-parallel", "8",
            "--metrics-jsonl", sm]], env8)

        # 2 processes × 4 devices over the same 8-way global mesh
        mm = str(tmp_path / "multi_metrics.jsonl")
        port = _free_port()
        env4 = dict(os.environ, VST_PLATFORM="cpu", PYTHONPATH=REPO,
                    XLA_FLAGS="--xla_force_host_platform_device_count=4")
        cmds = []
        for pid in range(2):
            cmd = [sys.executable, "-m", "vst_tpu.cli.train"] + common + [
                "--out-dir", str(tmp_path / "multi"),
                "--multihost", f"localhost:{port}",
                "--num-processes", "2", "--process-id", str(pid)]
            if pid == 0:
                cmd += ["--metrics-jsonl", mm]
            cmds.append(cmd)
        run(cmds, env4)

        t_single = self._steady_step_time(sm)
        t_multi = self._steady_step_time(mm)
        ratio = t_multi / t_single
        print(f"\nmultihost overhead: single-proc 8-dev "
              f"{t_single * 1e3:.1f} ms/step, 2-proc x 4-dev "
              f"{t_multi * 1e3:.1f} ms/step, ratio {ratio:.2f}x")
        # Tolerance: both programs run the same global batch on the same 8
        # virtual devices; the multi-host run adds Gloo all-reduces and a
        # SECOND OS process contending for this container's single core
        # (nproc=1 — measured 2.6-2.7x, dominated by core contention, not
        # the abstraction), so real overhead is expected here — but the
        # abstraction must not serialize the step.  3.5x bounds pathology
        # while staying robust to container noise.
        assert ratio < 3.5, (t_single, t_multi)

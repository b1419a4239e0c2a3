"""bench.py retry supervisor: a transient failed attempt must not lose the
capture (round-3 failure mode: one axon UNAVAILABLE → BENCH_r03.json rc=1).

The supervisor re-runs the bench body in a fresh subprocess (JAX caches a
failed backend init in-process), so these tests stub subprocess.Popen.
"""

import json
import subprocess

import pytest

import bench


class _FakeProc:
    def __init__(self, rc, out=b"", hang=False):
        self.returncode = rc
        self._out = out
        self._hang = hang
        self.terminated = False

    def poll(self):
        # a hung process is still running; everything else exited already
        return None if (self._hang and not self.terminated) else self.returncode

    def communicate(self, timeout=None):
        if self._hang and not self.terminated:
            raise subprocess.TimeoutExpired("bench", timeout)
        return self._out, None

    def terminate(self):
        self.terminated = True

    def kill(self):
        self.terminated = True


def _patch(monkeypatch, procs, probe_up=True):
    calls = []

    def popen(cmd, **kw):
        if "--probe" in cmd:
            # the up-front liveness probe gets its own fresh fake each
            # time; it never consumes the attempt list
            return _FakeProc(0, b"cpu\n") if probe_up else _FakeProc(1, b"")
        calls.append(cmd)
        return procs[len(calls) - 1]

    monkeypatch.setattr(subprocess, "Popen", popen)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    # advancing clock: the init-beacon wait loop (and any deadline math)
    # sees +30s per call, so a "hung" fake trips the init deadline fast
    clock = {"t": 0.0}

    def fake_time():
        clock["t"] += 30.0
        return clock["t"]

    monkeypatch.setattr(bench.time, "time", fake_time)
    return calls


def test_retries_transient_failure_then_succeeds(monkeypatch, capsys):
    line = json.dumps({"metric": "m", "value": 1.0, "unit": "u",
                       "vs_baseline": 1.0}) + "\n"
    procs = [_FakeProc(1, b"RuntimeError: axon UNAVAILABLE\n"),
             _FakeProc(1, b"RuntimeError: axon UNAVAILABLE\n"),
             _FakeProc(0, line.encode())]
    calls = _patch(monkeypatch, procs)
    bench.main(["--path", "reconet-512"])
    assert len(calls) == 3
    out = capsys.readouterr().out
    assert json.loads(out)["metric"] == "m"


def test_first_attempt_success_no_retry(monkeypatch, capsys):
    line = b'{"metric": "m", "value": 2.0, "unit": "u", "vs_baseline": 1.0}\n'
    calls = _patch(monkeypatch, [_FakeProc(0, line)])
    bench.main(["--path", "reconet-512"])
    assert len(calls) == 1
    assert json.loads(capsys.readouterr().out)["value"] == 2.0


def test_hung_attempt_is_terminated_then_retried(monkeypatch, capsys):
    hung = _FakeProc(1, b"", hang=True)
    ok = _FakeProc(0, b'{"metric": "m", "value": 3.0, "unit": "u", '
                      b'"vs_baseline": 1.0}\n')
    calls = _patch(monkeypatch, [hung, ok])
    bench.main(["--path", "reconet-512"])
    assert hung.terminated  # graceful SIGTERM path, not SIGKILL
    assert len(calls) == 2
    assert json.loads(capsys.readouterr().out)["value"] == 3.0


def test_exhausted_retries_raise(monkeypatch):
    n = 1 + len(bench._RETRY_DELAYS_S)
    calls = _patch(monkeypatch, [_FakeProc(1, b"boom\n") for _ in range(n)])
    with pytest.raises(SystemExit):
        bench.main(["--path", "reconet-512"])
    assert len(calls) == n


def test_inner_flag_bypasses_supervisor(monkeypatch):
    ran = []
    monkeypatch.setitem(bench.PATHS, "reconet-512",
                        lambda: (ran.append(1) or ("m", 1.0, "u", 1.0)))
    monkeypatch.setattr(subprocess, "Popen",
                        lambda *a, **k: pytest.fail("spawned a subprocess"))
    bench.main(["--path", "reconet-512", "--inner"])
    assert ran == [1]


def test_all_paths_supervised_individually(monkeypatch, capsys):
    """--path all runs each path in its own supervised subprocess: one
    path's failure neither loses the others' results nor re-runs them
    (round-4 concern: a cold `all` run exceeds one attempt's budget)."""
    two = sorted(bench.PATHS)[:2]
    monkeypatch.setattr(bench, "PATHS", {k: bench.PATHS[k] for k in two})
    line = b'{"metric": "m", "value": 5.0, "unit": "u", "vs_baseline": 1}\n'
    # path 1 succeeds first try; path 2 fails once then succeeds — on the
    # SHORT schedule (backend already seen), so 4 attempts max
    procs = [_FakeProc(0, line), _FakeProc(1, b"boom\n"), _FakeProc(0, line)]
    calls = _patch(monkeypatch, procs)
    bench.main(["--path", "all"])
    assert len(calls) == 3
    # each subprocess was asked for ONE specific path, not "all"
    assert calls[0][calls[0].index("--path") + 1] == two[0]
    assert calls[1][calls[1].index("--path") + 1] == two[1]
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2


def test_all_aborts_remaining_paths_when_backend_unreachable(monkeypatch):
    """If the FIRST path exhausts its retries without the backend ever
    answering (beacon never written, rc!=0), the remaining paths are
    guaranteed failures and must be skipped, not each burn ~25 min."""
    two = sorted(bench.PATHS)[:2]
    monkeypatch.setattr(bench, "PATHS", {k: bench.PATHS[k] for k in two})
    n = 1 + len(bench._RETRY_DELAYS_S)
    calls = _patch(monkeypatch, [_FakeProc(1, b"UNAVAILABLE\n")
                                 for _ in range(2 * n)])
    with pytest.raises(SystemExit, match="never answered"):
        bench.main(["--path", "all"])
    assert len(calls) == n  # only the first path's attempts


def test_all_path_failure_after_success_continues(monkeypatch, capsys):
    """A failing path AFTER the backend has been seen up uses the short
    retry schedule, and the run still reports the other paths' results
    before exiting nonzero."""
    two = sorted(bench.PATHS)[:2]
    monkeypatch.setattr(bench, "PATHS", {k: bench.PATHS[k] for k in two})
    line = b'{"metric": "m", "value": 6.0, "unit": "u", "vs_baseline": 1}\n'
    short = 4  # (0, 20, 60, 120)
    procs = [_FakeProc(0, line)] + [_FakeProc(1, b"boom\n")] * short
    calls = _patch(monkeypatch, procs)
    with pytest.raises(SystemExit, match="paths failed"):
        bench.main(["--path", "all"])
    assert len(calls) == 1 + short
    assert json.loads(capsys.readouterr().out)["value"] == 6.0


def test_outage_emits_structured_line_then_recovers(monkeypatch, capsys):
    """VERDICT r4 #2: when the up-front probe says the backend is down, a
    machine-readable backend-down record must appear IMMEDIATELY (before
    any retry sleeps), and a later recovery must still print the real
    metric and exit 0."""
    hung = _FakeProc(1, b"", hang=True)
    ok = _FakeProc(0, b'{"metric": "m", "value": 7.0, "unit": "u", '
                      b'"vs_baseline": 1.0}\n')
    _patch(monkeypatch, [hung, ok], probe_up=False)
    bench.main(["--path", "reconet-512"])  # must NOT raise
    lines = capsys.readouterr().out.strip().splitlines()
    first = json.loads(lines[0])
    assert first["error"] == "backend-down" and first["value"] is None
    assert json.loads(lines[-1])["value"] == 7.0


def test_outage_without_recovery_exits_zero_with_record(monkeypatch, capsys):
    """If the backend never comes back inside the outage budget, the
    backend-down record is the capture: the supervisor exits 0 so the
    driver stores a parseable line instead of a bare rc."""
    n = 1 + len(bench._RETRY_DELAYS_S)
    _patch(monkeypatch, [_FakeProc(1, b"UNAVAILABLE\n")] * n,
           probe_up=False)
    bench.main(["--path", "reconet-512"])  # exit 0
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[0])
    assert rec == {"metric": "reconet-512", "value": None, "unit": None,
                   "vs_baseline": None, "error": "backend-down"}
    assert len(out) == 1


def test_init_hang_is_cut_short(monkeypatch, capsys):
    """A backend that BLOCKS during init (the observed outage mode) must be
    killed at the init deadline, not after the full 40-min attempt budget:
    the ready-beacon file never appears, so the supervisor terminates the
    attempt and retries."""
    hung = _FakeProc(1, b"", hang=True)
    ok = _FakeProc(0, b'{"metric": "m", "value": 4.0, "unit": "u", '
                      b'"vs_baseline": 1.0}\n')
    calls = _patch(monkeypatch, [hung, ok])
    bench.main(["--path", "reconet-512"])
    assert hung.terminated
    assert len(calls) == 2
    err = capsys.readouterr()
    assert json.loads(err.out)["value"] == 4.0
    assert "init exceeded" in err.err

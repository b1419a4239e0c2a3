"""run_training failure recovery: non-finite-loss rollback.

The reference has no failure handling at all — a NaN'd step silently
trains garbage until a human reads the tqdm bar (SURVEY.md §5.3).  The
loop snapshots state at epoch start / periodic saves, detects a
non-finite loss at the logging cadence, rolls back, skips the batch, and
gives up loudly after max_recoveries.
"""

import os
import signal

import numpy as np
import pytest

import jax.numpy as jnp

from vst_tpu.train.loop import TrainingPreempted, run_training
from vst_tpu.train.state import TrainState


class _Dataset:
    def __init__(self, n=8):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((2, 2), float(i), np.float32)


def _state():
    return TrainState(params={"w": jnp.zeros((2,))}, opt_state=(),
                      step=jnp.zeros((), jnp.int32))


def _poisoning_step(poison_steps):
    """Adds 1 to w per step; returns NaN loss (and NaN params — as a real
    divergence would) on the poisoned global steps."""

    def step(state, batch):
        k = int(state.step)  # host-side test double; real steps are jitted
        poisoned = k in poison_steps
        bad = jnp.float32(jnp.nan) if poisoned else jnp.float32(0.0)
        params = {"w": state.params["w"] + 1.0 + bad}
        new = TrainState(params=params, opt_state=(), step=state.step + 1)
        return new, {"loss": jnp.sum(params["w"])}

    return step


def test_recovers_from_nonfinite_loss(tmp_path, capsys):
    final = run_training(
        _poisoning_step({2}), _state(), _Dataset(8), batch_size=2,
        epochs=1, out_dir=str(tmp_path), export_pth=False, log_every=1,
        num_workers=0, model_name="toy")
    out = capsys.readouterr().out
    assert "non-finite loss" in out and "rolled back" in out
    w = np.asarray(final.params["w"])
    assert np.all(np.isfinite(w))
    # 4 batches; the poisoned one rolled back to the epoch-start snapshot
    # (w=0 at that point, steps 0,1 re-lost) and was skipped → the 4th
    # batch still ran on finite params
    assert np.isfinite(float(final.params["w"][0]))


def test_gives_up_after_max_recoveries(tmp_path):
    # every step NaNs → recoveries exhaust
    with pytest.raises(RuntimeError, match="recoveries exhausted"):
        run_training(
            _poisoning_step(set(range(100))), _state(), _Dataset(16),
            batch_size=2, epochs=1, out_dir=str(tmp_path),
            export_pth=False, log_every=1, num_workers=0,
            max_recoveries=2, model_name="toy")


def test_last_batch_nan_never_persisted(tmp_path, capsys):
    """log_every=0 and no periodic saves: the guard must still check the
    epoch's last batch so the epoch-end checkpoint can't contain NaN."""
    final = run_training(
        _poisoning_step({3}), _state(), _Dataset(8), batch_size=2,
        epochs=1, out_dir=str(tmp_path), export_pth=False, log_every=0,
        num_workers=0, model_name="toy")
    assert "rolled back" in capsys.readouterr().out
    assert np.all(np.isfinite(np.asarray(final.params["w"])))
    from vst_tpu.train.checkpoint import load_state
    saved = load_state(str(tmp_path / "toy_last_state"), like=_state())
    assert np.all(np.isfinite(np.asarray(saved.params["w"])))


def test_periodic_save_survives_rollback_and_is_crash_safe(tmp_path):
    """save_every_steps snapshots feed both the rollback and the periodic
    orbax save; a poisoned mid-epoch step must leave a loadable, finite
    last_state."""
    final = run_training(
        _poisoning_step({2}), _state(), _Dataset(8), batch_size=2,
        epochs=1, out_dir=str(tmp_path), export_pth=False, log_every=0,
        num_workers=0, save_every_steps=1, model_name="toy")
    from vst_tpu.train.checkpoint import load_state
    saved = load_state(str(tmp_path / "toy_last_state"), like=_state())
    assert np.all(np.isfinite(np.asarray(saved.params["w"])))
    assert np.all(np.isfinite(np.asarray(final.params["w"])))


def _preempting_step(signal_at, poison_steps=()):
    """Like _poisoning_step, but also raises SIGUSR1 against this process
    on global step ``signal_at`` — simulating a preemption notice arriving
    while the step is in flight."""

    def step(state, batch):
        k = int(state.step)
        if k == signal_at:
            os.kill(os.getpid(), signal.SIGUSR1)
        bad = jnp.float32(jnp.nan) if k in poison_steps else jnp.float32(0.0)
        params = {"w": state.params["w"] + 1.0 + bad}
        new = TrainState(params=params, opt_state=(), step=state.step + 1)
        return new, {"loss": jnp.sum(params["w"])}

    return step


def test_preemption_checkpoints_and_raises(tmp_path):
    """SIGTERM/SIGUSR1 mid-run → finish the in-flight step, write the
    resumable last_state, raise TrainingPreempted (TPU VMs preempt with
    SIGTERM; the reference loses the whole epoch)."""
    with pytest.raises(TrainingPreempted) as exc:
        run_training(
            _preempting_step(signal_at=1), _state(), _Dataset(8),
            batch_size=2, epochs=1, out_dir=str(tmp_path),
            export_pth=False, log_every=0, num_workers=0, model_name="toy")
    from vst_tpu.train.checkpoint import load_state
    saved = load_state(str(tmp_path / "toy_last_state"), like=_state())
    # the in-flight step (global step 1 → step counter 2) completed and
    # was persisted: resume loses nothing
    assert int(saved.step) == 2
    assert np.allclose(np.asarray(saved.params["w"]), 2.0)
    assert int(exc.value.state.step) == 2


def test_preemption_never_persists_nonfinite(tmp_path):
    """A preemption landing on a diverged step must checkpoint the last
    known-good snapshot, not the NaN state."""
    with pytest.raises(TrainingPreempted):
        run_training(
            _preempting_step(signal_at=2, poison_steps={2}), _state(),
            _Dataset(8), batch_size=2, epochs=1, out_dir=str(tmp_path),
            export_pth=False, log_every=0, num_workers=0, model_name="toy")
    from vst_tpu.train.checkpoint import load_state
    saved = load_state(str(tmp_path / "toy_last_state"), like=_state())
    assert np.all(np.isfinite(np.asarray(saved.params["w"])))


def test_signal_handlers_restored_after_run(tmp_path):
    before_term = signal.getsignal(signal.SIGTERM)
    before_usr1 = signal.getsignal(signal.SIGUSR1)
    run_training(
        _poisoning_step(set()), _state(), _Dataset(4), batch_size=2,
        epochs=1, out_dir=str(tmp_path), export_pth=False, log_every=0,
        num_workers=0, model_name="toy")
    assert signal.getsignal(signal.SIGTERM) is before_term
    assert signal.getsignal(signal.SIGUSR1) is before_usr1


def test_preemption_handler_can_be_disabled(tmp_path):
    """handle_preemption=False leaves signals to their previous
    disposition (here: a recording handler installed by the test)."""
    hits = []
    prev = signal.signal(signal.SIGUSR1, lambda s, f: hits.append(s))
    try:
        final = run_training(
            _preempting_step(signal_at=1), _state(), _Dataset(8),
            batch_size=2, epochs=1, out_dir=str(tmp_path),
            export_pth=False, log_every=0, num_workers=0,
            model_name="toy", handle_preemption=False)
    finally:
        signal.signal(signal.SIGUSR1, prev)
    assert hits == [signal.SIGUSR1]
    assert int(final.step) == 4  # ran to completion


def test_rollback_does_not_rewind_data_position(tmp_path):
    """A non-finite rollback restores params but must NOT rewind the step
    counter — step tracks batches consumed so --resume auto's derived
    (epoch, start_batch) still matches the true data position."""

    def step(state, batch):
        k = int(state.step)
        bad = jnp.float32(jnp.nan) if k == 1 else jnp.float32(0.0)
        params = {"w": state.params["w"] + 1.0 + bad}
        new = TrainState(params=params, opt_state=(), step=state.step + 1)
        return new, {"loss": jnp.sum(params["w"])}

    final = run_training(step, _state(), _Dataset(8), batch_size=2,
                         epochs=1, out_dir=str(tmp_path), export_pth=False,
                         log_every=1, num_workers=0, model_name="toy")
    # 4 batches consumed (one skipped after rollback): step == 4, finite
    assert int(final.step) == 4
    assert np.all(np.isfinite(np.asarray(final.params["w"])))
    from vst_tpu.train.checkpoint import load_state
    saved = load_state(str(tmp_path / "toy_last_state"), like=_state())
    assert int(saved.step) == 4


def test_resume_after_rollback_and_preempt_keeps_data_order(tmp_path):
    """Rollback + preemption combined: the interrupted run skips the
    poisoned batch's update but still consumes it, so the resumed run
    continues at the true data position."""
    log1, log2, full = [], [], []

    def make(log, poison=None, sig_at=None):
        def step(state, batch):
            k = int(state.step)
            if sig_at is not None and k == sig_at:
                os.kill(os.getpid(), signal.SIGUSR1)
            log.append(tuple(batch[:, 0, 0].tolist()))
            bad = (jnp.float32(jnp.nan) if poison is not None and k == poison
                   else jnp.float32(0.0))
            params = {"w": state.params["w"] + 1.0 + bad}
            return (TrainState(params=params, opt_state=(),
                               step=state.step + 1),
                    {"loss": jnp.sum(params["w"])})
        return step

    run_training(make(full), _state(), _Dataset(8), batch_size=2, epochs=1,
                 out_dir=str(tmp_path / "a"), export_pth=False, log_every=0,
                 num_workers=0, model_name="toy", seed=9)
    with pytest.raises(TrainingPreempted):
        run_training(make(log1, poison=1, sig_at=2), _state(), _Dataset(8),
                     batch_size=2, epochs=1, out_dir=str(tmp_path / "b"),
                     export_pth=False, log_every=1, num_workers=0,
                     model_name="toy", seed=9)
    from vst_tpu.train.checkpoint import load_state
    saved = load_state(str(tmp_path / "b" / "toy_last_state"),
                       like=_state())
    step_k = int(saved.step)
    assert step_k == 3  # 3 batches consumed (incl. the skipped one)
    run_training(make(log2), saved, _Dataset(8), batch_size=2, epochs=1,
                 epoch_start=step_k // 4 + 1, out_dir=str(tmp_path / "b"),
                 export_pth=False, log_every=0, num_workers=0,
                 model_name="toy", seed=9, start_batch=step_k % 4)
    assert log1 + log2 == full


def test_finite_loss_nan_params_never_persisted(tmp_path, capsys):
    """A backward-pass overflow can NaN the params one step before any
    loss shows it: the persist-point guard must check the params too."""

    def step(state, batch):
        k = int(state.step)
        bad = jnp.float32(jnp.nan) if k == 3 else jnp.float32(0.0)
        params = {"w": state.params["w"] + 1.0 + bad}
        new = TrainState(params=params, opt_state=(), step=state.step + 1)
        # loss computed from the batch, NOT the params: stays finite
        return new, {"loss": jnp.float32(1.0)}

    final = run_training(step, _state(), _Dataset(8), batch_size=2,
                         epochs=1, out_dir=str(tmp_path), export_pth=False,
                         log_every=0, num_workers=0, model_name="toy")
    assert "rolled back" in capsys.readouterr().out
    assert np.all(np.isfinite(np.asarray(final.params["w"])))
    from vst_tpu.train.checkpoint import load_state
    saved = load_state(str(tmp_path / "toy_last_state"), like=_state())
    assert np.all(np.isfinite(np.asarray(saved.params["w"])))


def test_snapshot_refreshes_at_log_points(tmp_path, capsys):
    """Without periodic saves, a passing log check advances the rollback
    snapshot: a late NaN rolls back ~log_every batches, not the epoch."""
    final = run_training(_poisoning_step({3}), _state(), _Dataset(8),
                         batch_size=2, epochs=1, out_dir=str(tmp_path),
                         export_pth=False, log_every=1, num_workers=0,
                         model_name="toy", snapshot_every_s=0.0)
    assert "rolled back" in capsys.readouterr().out
    # steps 0,1,2 passed (w=3 snapshotted at the step-2 log point);
    # step 3 NaN'd and rolled back to w=3, not the epoch-start w=0
    assert float(np.asarray(final.params["w"])[0]) == 3.0


def test_snapshot_refresh_throttled_by_wall_clock(tmp_path, capsys):
    """With the default snapshot_every_s floor, fast steps do NOT refresh
    the rollback snapshot at every log point (the refresh fetches the whole
    TrainState); a NaN then rolls back to the epoch-start snapshot."""
    final = run_training(_poisoning_step({3}), _state(), _Dataset(8),
                         batch_size=2, epochs=1, out_dir=str(tmp_path),
                         export_pth=False, log_every=1, num_workers=0,
                         model_name="toy")  # snapshot_every_s=60 default
    assert "rolled back" in capsys.readouterr().out
    # toy steps run in microseconds — no log point reaches the 60s floor,
    # so the last-batch NaN rolls all the way back to the epoch-start w=0
    assert float(np.asarray(final.params["w"])[0]) == 0.0


def test_metrics_jsonl_sink(tmp_path):
    """metrics_jsonl appends one machine-readable record per logged step."""
    import json

    path = str(tmp_path / "metrics.jsonl")
    run_training(_poisoning_step(set()), _state(), _Dataset(8),
                 batch_size=2, epochs=2, out_dir=str(tmp_path),
                 export_pth=False, log_every=1, num_workers=0,
                 model_name="toy", metrics_jsonl=path)
    records = [json.loads(line) for line in open(path)]
    assert len(records) == 8  # 4 batches x 2 epochs, log_every=1
    assert records[0]["epoch"] == 1 and records[0]["batch"] == 1
    assert records[-1]["epoch"] == 2 and records[-1]["batch"] == 4
    assert all("loss" in r and "samples_per_s" in r and "step" in r
               for r in records)
    # appending keeps history across resumes
    run_training(_poisoning_step(set()), _state(), _Dataset(8),
                 batch_size=2, epochs=1, out_dir=str(tmp_path),
                 export_pth=False, log_every=1, num_workers=0,
                 model_name="toy", metrics_jsonl=path)
    assert len(open(path).readlines()) == 12


def test_metrics_jsonl_nonfinite_encoded_as_null(tmp_path):
    """Non-finite metric values must serialize as strict-JSON null, not the
    bare NaN literal jq/JSON.parse reject — the SD1 distiller reports its
    SDL tap-mismatch marker as NaN on every step by design."""
    import json

    def step(state, batch):
        params = {"w": state.params["w"] + 1.0}
        new = TrainState(params=params, opt_state=(), step=state.step + 1)
        return new, {"loss": jnp.float32(1.0), "SDL": jnp.float32(jnp.nan)}

    path = str(tmp_path / "metrics.jsonl")
    run_training(step, _state(), _Dataset(4), batch_size=2, epochs=1,
                 out_dir=str(tmp_path), export_pth=False, log_every=1,
                 num_workers=0, model_name="toy", metrics_jsonl=path,
                 recover_nonfinite=False)
    lines = open(path).read().splitlines()
    assert lines
    for line in lines:  # strict parse — raises on a bare NaN literal
        rec = json.loads(line, parse_constant=lambda c: pytest.fail(
            f"non-strict JSON constant {c!r} in metrics line"))
        assert rec["SDL"] is None and rec["loss"] == 1.0


def test_metrics_jsonl_creates_parent_dir(tmp_path):
    """A metrics path inside a not-yet-existing directory must not crash
    the run at the first logged batch."""
    path = str(tmp_path / "logs" / "deeper" / "metrics.jsonl")
    run_training(_poisoning_step(set()), _state(), _Dataset(4),
                 batch_size=2, epochs=1, out_dir=str(tmp_path),
                 export_pth=False, log_every=1, num_workers=0,
                 model_name="toy", metrics_jsonl=path)
    assert os.path.exists(path)


def test_resume_mid_epoch_continues_exact_data_order(tmp_path):
    """Preempt mid-epoch, resume with start_batch (as cli.train --resume
    auto derives it): the combined run sees exactly the uninterrupted
    epoch's batch sequence — nothing revisited, nothing skipped."""

    def recording_step(log):
        def step(state, batch):
            log.append(tuple(batch[:, 0, 0].tolist()))
            new = TrainState(params={"w": state.params["w"] + 1.0},
                             opt_state=(), step=state.step + 1)
            return new, {"loss": jnp.float32(0.0)}
        return step

    full_log = []
    run_training(recording_step(full_log), _state(), _Dataset(8),
                 batch_size=2, epochs=1, out_dir=str(tmp_path / "a"),
                 export_pth=False, log_every=0, num_workers=0,
                 model_name="toy", seed=5)
    assert len(full_log) == 4

    # interrupted run: preempt lands after global step 1 (2 batches done)
    part1 = []
    with pytest.raises(TrainingPreempted):
        run_training(_wrap_preempt(recording_step(part1), signal_at=1),
                     _state(), _Dataset(8), batch_size=2, epochs=1,
                     out_dir=str(tmp_path / "b"), export_pth=False,
                     log_every=0, num_workers=0, model_name="toy", seed=5)
    from vst_tpu.train.checkpoint import load_state
    saved = load_state(str(tmp_path / "b" / "toy_last_state"),
                       like=_state())
    n_batches = 4
    step_k = int(saved.step)
    part2 = []
    run_training(recording_step(part2), saved, _Dataset(8), batch_size=2,
                 epochs=1, epoch_start=step_k // n_batches + 1,
                 out_dir=str(tmp_path / "b"), export_pth=False,
                 log_every=0, num_workers=0, model_name="toy", seed=5,
                 start_batch=step_k % n_batches)
    assert part1 + part2 == full_log


def _wrap_preempt(step, signal_at):
    def wrapped(state, batch):
        if int(state.step) == signal_at:
            os.kill(os.getpid(), signal.SIGUSR1)
        return step(state, batch)
    return wrapped


def test_guard_disabled_passes_nan_through(tmp_path):
    final = run_training(
        _poisoning_step({1}), _state(), _Dataset(4), batch_size=2,
        epochs=1, out_dir=str(tmp_path), export_pth=False, log_every=1,
        num_workers=0, recover_nonfinite=False, model_name="toy")
    assert not np.all(np.isfinite(np.asarray(final.params["w"])))

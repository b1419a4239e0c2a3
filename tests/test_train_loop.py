"""run_training failure recovery: non-finite-loss rollback.

The reference has no failure handling at all — a NaN'd step silently
trains garbage until a human reads the tqdm bar (SURVEY.md §5.3).  The
loop snapshots state at epoch start / periodic saves, detects a
non-finite loss at the logging cadence, rolls back, skips the batch, and
gives up loudly after max_recoveries.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vst_tpu.train.loop import run_training
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


def test_guard_disabled_passes_nan_through(tmp_path):
    final = run_training(
        _poisoning_step({1}), _state(), _Dataset(4), batch_size=2,
        epochs=1, out_dir=str(tmp_path), export_pth=False, log_every=1,
        num_workers=0, recover_nonfinite=False, model_name="toy")
    assert not np.all(np.isfinite(np.asarray(final.params["w"])))

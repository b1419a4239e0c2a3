"""Generic training loop driver.

Replaces the reference's per-script epoch/batch loops (e.g.
ReCoNet/train_single/train_candy.py:63-170) with one reusable loop:
shuffled threaded batch loading, double-buffered device prefetch, per-epoch
checkpoints (params npz + full TrainState + optional reference-named .pth
export), and metric logging.
"""

import os
import signal
import time

import numpy as np

import jax
import jax.numpy as jnp

from vst_tpu.data.pipeline import BatchLoader, device_prefetch
from vst_tpu.train import checkpoint as ckpt
from vst_tpu.train.state import TrainState


def _save_loss_plot(history, out_dir, name, epoch, batch_size):
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    plt.figure()
    for key, vals in history.items():
        if key != "loss":
            plt.plot(range(1, len(vals) + 1), vals, label=key)
    plt.xlabel("Logged step")
    plt.ylabel("Loss")
    plt.title(f"Losses for Epoch {epoch}")
    plt.legend()
    plt.savefig(os.path.join(
        out_dir, f"{name}_epoch_{epoch}_batchSize_{batch_size}_loss.png"))
    plt.close()


def _primary():
    """True on the process that owns checkpoints/metrics (multi-host runs
    start one process per TPU host — parallel/multihost.py; single-process
    runs are trivially primary).  Thin seam over multihost.is_primary so
    tests can monkeypatch the loop's view of ownership."""
    from vst_tpu.parallel.multihost import is_primary

    return is_primary()


class TrainingPreempted(RuntimeError):
    """Raised by ``run_training`` after a clean preemption checkpoint.

    Carries the last ``TrainState`` as ``.state``; the resumable
    ``*_last_state`` checkpoint has already been written when this is
    raised, so a supervisor can simply restart with ``--resume auto``.
    """

    def __init__(self, msg, state):
        super().__init__(msg)
        self.state = state


def run_training(
    step_fn,
    state: TrainState,
    dataset,
    *,
    batch_size: int,
    epochs: int,
    epoch_start: int = 1,
    out_dir: str = "./models",
    model_name: str = "model",
    export_pth: bool = True,
    log_every: int = 50,
    seed: int = 0,
    num_workers: int = 4,
    prefetch: int = 2,
    sharding=None,
    log_fn=print,
    loss_plots_dir: str | None = None,
    save_every_steps: int = 0,
    recover_nonfinite: bool = True,
    max_recoveries: int = 3,
    handle_preemption: bool = True,
    start_batch: int = 0,
    metrics_jsonl: str | None = None,
    snapshot_every_s: float = 60.0,
    heartbeat_file: str | None = None,
) -> TrainState:
    """Run ``epochs`` epochs of ``step_fn(state, batch)`` over ``dataset``.

    Checkpoints per epoch using the reference's naming convention
    (``{name}_epoch_{e}_batchSize_{b}``), plus a resumable full-state file.
    ``loss_plots_dir`` writes per-epoch loss-curve PNGs (the RTNSTV
    trainer's matplotlib plots, RTNSTV/train.py:162-175).

    Failure recovery (the reference has none — a NaN'd run trains garbage
    until someone notices): when ``recover_nonfinite`` is set and a step
    returns a non-finite loss, the state rolls back to the last in-memory
    snapshot (epoch start / periodic save), the offending batch is skipped,
    and training continues — up to ``max_recoveries`` times per run, then
    raises.  The check runs before every persist point (periodic saves and
    each epoch's last batch) so non-finite state is never checkpointed, and
    additionally at the ``log_every`` cadence — where the loss check
    piggybacks on the metric fetch the logging already pays for, but
    REFRESHING the rollback snapshot does not: it fetches the whole
    TrainState (params + optimizer moments) to host, which over a slow
    device link is a real stall.  ``snapshot_every_s`` therefore floors the
    refresh cadence in wall-clock time (default one refresh per minute): a
    rollback then loses at most ~that much work, and the refresh overhead
    amortizes to nothing on fast steps while slow steps (≥ the floor) keep
    refreshing at every log point.  Set 0 to refresh at every passing log
    check.

    Preemption safety (``handle_preemption``): TPU VMs are routinely
    preempted with SIGTERM and a short grace period.  On SIGTERM/SIGUSR1
    the loop finishes the in-flight step, writes the resumable
    ``*_last_state`` checkpoint (rolling back first if that step's loss is
    non-finite), and raises :class:`TrainingPreempted` — a supervisor
    restarts with ``--resume auto`` and loses at most one step.  Handlers
    are installed only in the main thread and restored on exit.

    ``start_batch``: resume the FIRST epoch of this run mid-epoch — skip
    that many batches of its deterministic shuffle at the index level (no
    decode cost), so a preempted epoch continues exactly where it left
    off instead of revisiting its earlier batches.  ``cli.train --resume
    auto`` derives it from the checkpointed step counter.

    ``metrics_jsonl``: append one JSON object per logged step (epoch,
    batch, samples/s, every loss term) — a machine-readable sibling of
    the console log (the reference's only observability is a tqdm bar,
    SURVEY.md §5.5).  Appending keeps history across resumes.

    ``heartbeat_file``: touch this path's mtime at every batch, on EVERY
    process — the liveness signal ``cli.supervise --hang-timeout`` watches.
    The metrics sink only advances on the primary process (and only at the
    logging cadence), so multi-host hang supervision needs this per-host
    signal.  Touches happen in the dispatch loop (steps are async), but a
    wedged device blocks the loop at the next log/persist fetch, so the
    heartbeat stalls within one logging gap of a real hang — size
    ``--hang-timeout`` above the slowest logging gap, as with metrics.
    """

    def snapshot_of(s):
        # host copy + shardings: the step DONATES its state buffers, so a
        # device reference would be invalidated; shardings restore DP layout
        return (jax.tree.map(np.asarray, s),
                jax.tree.map(lambda x: getattr(x, "sharding", None), s))

    def restore(snap):
        host, shardings = snap
        try:
            if jax.process_count() > 1:
                # device_put can't target cross-process shardings; every
                # DP state leaf is replicated (host-complete), so each
                # process re-places its full local copy
                return jax.tree.map(
                    lambda x, s: jax.make_array_from_process_local_data(
                        s, np.asarray(x), np.shape(x)),
                    host, shardings)
            return jax.device_put(host, shardings)
        except (TypeError, ValueError) as e:
            # expected placement failures only: a leaf snapshotted without
            # a sharding (None) makes device_put/with-shardings raise.
            # Multi-host, a sharding-less fallback would leave processes
            # INCONSISTENT — fail loudly instead of continuing (ADVICE r4).
            if jax.process_count() > 1:
                raise
            import warnings
            warnings.warn(f"rollback restore lost the recorded shardings "
                          f"({e}); continuing with default placement",
                          stacklevel=2)
            return jax.tree.map(jnp.asarray, host)

    stop = {"sig": None}
    prev_handlers = {}
    if handle_preemption:
        def _on_signal(signum, frame):
            stop["sig"] = signum

        for sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                prev_handlers[sig] = signal.signal(sig, _on_signal)
            except (ValueError, OSError):
                pass  # not the main thread — run without the handler

    def persist_point(epoch, i, state, metrics, snap):
        """On a pending preemption signal: checkpoint and bail out."""
        if stop["sig"] is None:
            return
        try:
            sig_name = signal.Signals(stop["sig"]).name
        except ValueError:  # pragma: no cover
            sig_name = f"signal {stop['sig']}"
        good = state
        if recover_nonfinite:
            bad = not np.isfinite(float(metrics["loss"]))
            if not bad:  # finite loss can still hide NaN'd params
                host = jax.tree.map(np.asarray, state.params)
                bad = not all(np.isfinite(leaf).all()
                              for leaf in jax.tree.leaves(host))
            if bad:
                # never persist a non-finite state — but keep the CURRENT
                # step counter: step tracks batches consumed (the resume
                # data position), not updates applied, so a rollback must
                # not rewind it (see the rollback in _epoch_loop)
                good = restore(snap)._replace(step=state.step)
        if _primary():
            ckpt.save_state(good, os.path.join(out_dir,
                                               model_name + "_last_state"))
        raise TrainingPreempted(
            f"{sig_name} at epoch {epoch} batch {i + 1}: resumable state "
            f"saved to {model_name}_last_state", good)

    os.makedirs(out_dir, exist_ok=True)
    if metrics_jsonl and os.path.dirname(metrics_jsonl):
        os.makedirs(os.path.dirname(metrics_jsonl), exist_ok=True)
    if heartbeat_file:
        if os.path.dirname(heartbeat_file):
            os.makedirs(os.path.dirname(heartbeat_file), exist_ok=True)
        open(heartbeat_file, "a").close()
    try:
        state = _epoch_loop(
            step_fn, state, dataset, batch_size, epochs, epoch_start,
            out_dir, model_name, export_pth, log_every, seed, num_workers,
            prefetch, sharding, log_fn, loss_plots_dir, save_every_steps,
            recover_nonfinite, max_recoveries, snapshot_of, restore,
            persist_point, start_batch, metrics_jsonl, snapshot_every_s,
            heartbeat_file)
    finally:
        for sig, handler in prev_handlers.items():
            # signal.signal returns None for handlers installed outside
            # Python; None is not a valid handler to restore — fall back
            # to the default disposition rather than raise from finally
            signal.signal(sig, signal.SIG_DFL if handler is None
                          else handler)
    return state


def _epoch_loop(step_fn, state, dataset, batch_size, epochs, epoch_start,
                out_dir, model_name, export_pth, log_every, seed,
                num_workers, prefetch, sharding, log_fn, loss_plots_dir,
                save_every_steps, recover_nonfinite, max_recoveries,
                snapshot_of, restore, persist_point, start_batch=0,
                metrics_jsonl=None, snapshot_every_s=60.0,
                heartbeat_file=None):
    recoveries = 0
    primary = _primary()
    for epoch in range(epoch_start, epochs + 1):
        sb = start_batch if epoch == epoch_start else 0
        # multi-host: every process decodes only its slice of each global
        # batch (the seed-derived shuffle keeps all processes in agreement
        # on the global order with zero communication)
        loader = BatchLoader(dataset, batch_size, shuffle=True,
                             seed=seed + epoch, num_workers=num_workers,
                             epoch=epoch, start_batch=sb,
                             process_id=jax.process_index(),
                             num_processes=jax.process_count())
        n_batches = len(loader)
        t0 = time.time()
        history: dict[str, list] = {}
        snap = snapshot_of(state) if recover_nonfinite else None
        snap_t = time.time()
        for i, batch in enumerate(device_prefetch(iter(loader), prefetch,
                                                  sharding), start=sb):
            state, metrics = step_fn(state, batch)
            if heartbeat_file:
                os.utime(heartbeat_file, None)
            persist_point(epoch, i, state, metrics, snap)
            is_save = bool(save_every_steps
                           and (i + 1) % save_every_steps == 0)
            # check before every persist point (periodic saves AND the
            # epoch's last batch, whose state the epoch-end save writes) so
            # a non-finite state is never checkpointed, plus the logging
            # cadence for earlier detection
            at_persist = is_save or i == n_batches - 1
            if recover_nonfinite and (
                    at_persist or (log_every and i % log_every == 0)):
                bad = not np.isfinite(float(metrics["loss"]))
                if not bad and at_persist:
                    # a finite loss does NOT imply finite params: a
                    # backward-pass overflow NaNs the weights one step
                    # before any loss shows it.  The persist is about to
                    # fetch the params anyway, so checking them here is
                    # (nearly) free — and guarantees the docstring's
                    # "non-finite state is never checkpointed".
                    host = jax.tree.map(np.asarray, state.params)
                    bad = not all(np.isfinite(leaf).all()
                                  for leaf in jax.tree.leaves(host))
                if bad:
                    recoveries += 1
                    if recoveries > max_recoveries:
                        raise RuntimeError(
                            f"non-finite loss at epoch {epoch} batch "
                            f"{i + 1}: {max_recoveries} recoveries "
                            f"exhausted")
                    log_fn(f"epoch {epoch} batch {i + 1}: non-finite loss; "
                           f"rolled back to last snapshot (recovery "
                           f"{recoveries}/{max_recoveries})")
                    # params/opt roll back, the step counter does NOT:
                    # step tracks batches consumed so that --resume auto
                    # (epoch = step // n_batches, start_batch = step %
                    # n_batches) still lands on the true data position
                    # after a recovery
                    state = restore(snap)._replace(step=state.step)
                    continue
                if (not is_save and not save_every_steps
                        and time.time() - snap_t >= snapshot_every_s):
                    # the check passed at a log point and no periodic
                    # saves refresh the snapshot: advance it here (at most
                    # once per snapshot_every_s — this fetch copies the
                    # WHOLE TrainState to host, which logging does not
                    # otherwise pay for), so a late-epoch NaN rolls back
                    # a bounded amount, not the whole epoch.  (With
                    # save_every_steps set, the save path below refreshes
                    # it instead.)  Adopt only a fully-finite state — the
                    # loss-only check above can miss params a backward
                    # overflow has already NaN'd.
                    fresh = snapshot_of(state)
                    if all(np.isfinite(leaf).all()
                           for leaf in jax.tree.leaves(fresh[0].params)):
                        snap = fresh
                        snap_t = time.time()
            if is_save:
                # mid-epoch durability (the reference only saves per epoch
                # and loses partial progress on failure — SURVEY.md §5.3/5.4)
                if recover_nonfinite:
                    # one device→host fetch serves both the rollback
                    # snapshot and the save (save_state's np.asarray is a
                    # no-op on numpy leaves)
                    snap = snapshot_of(state)
                    snap_t = time.time()
                    if primary:
                        ckpt.save_state(snap[0], os.path.join(
                            out_dir, model_name + "_last_state"))
                elif primary:
                    ckpt.save_state(state, os.path.join(
                        out_dir, model_name + "_last_state"))
            if primary and log_every and (i % log_every == 0
                                          or i == n_batches - 1):
                vals = {k: float(v) for k, v in metrics.items()}
                for k, v in vals.items():
                    history.setdefault(k, []).append(v)
                rate = (i + 1 - sb) * batch_size / (time.time() - t0)
                msg = " ".join(f"{k}={v:.4g}" for k, v in vals.items())
                log_fn(f"epoch {epoch}/{epochs} batch {i + 1}/{n_batches} "
                       f"({rate:.3g} samples/s) {msg}")
                if metrics_jsonl:
                    import json
                    import math

                    # strict JSON has no NaN/Infinity; some trainers report
                    # non-finite metrics by design (the SD1 distiller's SDL
                    # tap-mismatch marker is jnp.nan every step), so encode
                    # them as null instead of emitting lines jq/JSON.parse
                    # reject
                    safe = {k: (v if math.isfinite(v) else None)
                            for k, v in vals.items()}
                    with open(metrics_jsonl, "a") as f:
                        f.write(json.dumps(
                            {"epoch": epoch, "batch": i + 1,
                             "step": int(state.step),
                             "samples_per_s": round(rate, 4), **safe}) + "\n")
        if primary and loss_plots_dir:
            _save_loss_plot(history, loss_plots_dir, model_name, epoch,
                            batch_size)

        if primary:
            name = ckpt.epoch_checkpoint_name(model_name, epoch, batch_size)
            params_host = {k: np.asarray(v) for k, v in state.params.items()}
            ckpt.save_params(params_host,
                             os.path.join(out_dir, name + ".npz"))
            ckpt.save_state(state, os.path.join(out_dir,
                                                model_name + "_last_state"))
            if export_pth:
                ckpt.export_pth(params_host,
                                os.path.join(out_dir, name + ".pth"))
    return state

"""Checkpointing: params + optimizer state + step, with .pth interop.

Improves on the reference's epoch-end ``torch.save(model.state_dict())``
(which never saves optimizer state and resumes by hand-editing constants —
SURVEY.md §5.4):

- ``save_params`` / ``load_params``: flat param dicts as ``.npz`` (the
  param keys are torch state_dict names, so npz keys are self-describing).
- ``save_state`` / ``load_state``: full TrainState (params + Adam moments +
  step).  Default format is an orbax checkpoint DIRECTORY (atomic writes,
  versioned); ``load_state`` also reads the legacy pickle files earlier
  rounds wrote, so old checkpoints keep resuming.
- ``export_pth`` / ``import_pth``: round-trip with reference checkpoints
  (vst_tpu.compat handles the layout changes).
"""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from vst_tpu.compat import load_pth, save_pth
from vst_tpu.train.state import TrainState


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _ckpt_mtime(path: str) -> float:
    """Completion time of a checkpoint at ``path`` (file or orbax dir).

    For a directory, the directory's own mtime reflects the atomic rename
    that completed the save; a contained _CHECKPOINT_METADATA (written
    last by orbax) is preferred when present.
    """
    meta = os.path.join(path, "_CHECKPOINT_METADATA")
    if os.path.isfile(meta):
        return os.path.getmtime(meta)
    return os.path.getmtime(path)


def save_params(params: dict, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **_to_numpy_tree(params))


def load_params(path: str) -> dict:
    with np.load(path) as data:
        return {k: jnp.asarray(data[k]) for k in data.files}


# Bumped when the saved tree layout changes; both formats embed it so a
# layout change fails loudly instead of silently orphaning old checkpoints.
STATE_VERSION = 1


def save_state(state: TrainState, path: str, *, format: str = "orbax") -> None:
    """Write a resumable full-state checkpoint.

    ``format="orbax"`` (default): an orbax checkpoint directory at ``path``
    (atomic rename on completion; overwrites in place for periodic
    mid-epoch saves).  ``format="pickle"``: the single-file numpy-pytree
    pickle, kept for environments without orbax; now versioned.

    When orbax is not installed (it is the ``[checkpoint]`` extra, not a
    core dependency), the default silently degrades to the pickle format
    rather than crashing the run at its FIRST checkpoint — which would
    otherwise also break the SIGTERM preemption save and lose the state it
    exists to protect.  ``load_state`` reads both formats and
    ``cli.train --resume auto`` discovers a bare pickle FILE at the state
    path too, so resume works either way.  The pickle write is atomic
    (tmp + rename) so a crash mid-save never corrupts the only checkpoint.
    """
    if format == "orbax":
        try:
            import orbax.checkpoint  # noqa: F401
        except ImportError:
            import warnings
            warnings.warn("orbax-checkpoint not installed; writing the "
                          "pickle checkpoint format instead (install the "
                          "[checkpoint] extra for orbax directories)",
                          stacklevel=2)
            format = "pickle"
    if format == "orbax":
        save_state_orbax(state, path)
    elif format == "pickle":
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump({"__vst_state_version__": STATE_VERSION,
                         "tree": _to_numpy_tree(state)}, f)
        if os.path.isdir(path):
            # an orbax checkpoint DIRECTORY from a previous run occupies
            # the state path (run resumed in an env where orbax is now
            # missing): os.replace(file, dir) raises, so clear it — only
            # after the tmp write above has fully succeeded, keeping the
            # no-checkpoint-ever-destroyed-before-its-replacement-exists
            # invariant.  (ADVICE r4.)
            import shutil
            shutil.rmtree(path)
        os.replace(tmp, path)
    else:  # pragma: no cover
        raise ValueError(f"unknown checkpoint format {format!r}")


def load_state(path: str, like: TrainState | None = None) -> TrainState:
    """Load a full-state checkpoint written by any round's ``save_state``.

    A directory is an orbax checkpoint (``like`` supplies the tree
    structure — pass a freshly ``create``d TrainState); a file is a pickle,
    either the versioned form or the raw pytree rounds ≤3 wrote.
    """
    # a completed-but-unswapped save (crash between write and swap in
    # save_state_orbax) is usually newer than ``path`` itself — prefer it.
    # orbax only renames a directory into place once it is complete, so an
    # existing ``.new`` directory is always a whole checkpoint.  But if the
    # run later continued WITHOUT orbax (pickle fallback writing to
    # ``path``), the stale ``.new`` would shadow newer saves — compare
    # mtimes and take the newest (ADVICE r4).
    new = path + ".new"
    if os.path.isdir(new):
        if not os.path.exists(path) or _ckpt_mtime(new) >= _ckpt_mtime(path):
            return load_state_orbax(new, like)
    if os.path.isdir(path):
        return load_state_orbax(path, like)
    with open(path, "rb") as f:
        obj = pickle.load(f)
    if isinstance(obj, dict) and "__vst_state_version__" in obj:
        v = obj["__vst_state_version__"]
        if v > STATE_VERSION:
            raise ValueError(f"checkpoint {path} has state version {v}; "
                             f"this build reads ≤{STATE_VERSION}")
        obj = obj["tree"]
    return jax.tree.map(jnp.asarray, obj)


def export_pth(params: dict, path: str) -> None:
    """Write params as a torch state_dict loadable by the reference models."""
    save_pth(params, path)


def import_pth(path: str, strict_keys: set[str] | None = None) -> dict:
    """Load a reference ``.pth`` checkpoint as vst_tpu params.

    ``strict_keys``: if given, assert the checkpoint covers exactly these
    keys (torch ``strict=True`` behavior, ReCoNet/utilities.py:190);
    otherwise keep only the intersection (``strict=False`` teacher→student
    init, train_Flow_SD1.py:45).
    """
    params = {k: jnp.asarray(v) for k, v in load_pth(path).items()}
    if strict_keys is not None:
        missing = strict_keys - set(params)
        unexpected = set(params) - strict_keys
        if missing or unexpected:
            raise ValueError(
                f"strict load failed: missing={sorted(missing)[:5]} "
                f"unexpected={sorted(unexpected)[:5]}")
    return params


def partial_init_from(params: dict, donor: dict) -> dict:
    """Copy name-matching, shape-matching entries of ``donor`` into a copy of
    ``params`` (torch ``load_state_dict(strict=False)`` semantics used for
    teacher→student initialization)."""
    out = dict(params)
    for k, v in donor.items():
        if k in out and tuple(out[k].shape) == tuple(v.shape):
            out[k] = v
    return out


def save_state_orbax(state: TrainState, path: str) -> None:
    """Orbax-backed full-state checkpoint directory (atomic; the default
    ``save_state`` format).  Versioned via a wrapper leaf.

    Overwrites are crash-safe: the new checkpoint is written next to the
    old one (``<path>.new``) and swapped in only once complete, so a kill
    during a periodic mid-epoch save can never destroy the only resumable
    state (orbax ``force=True`` deletes the target BEFORE writing).
    ``load_state`` prefers a completed ``.new`` left by a crash mid-swap.
    """
    import shutil

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    new = path + ".new"
    if os.path.isdir(new):
        # leftover from a crash between write and swap: it is a COMPLETE
        # checkpoint (orbax only renames finished saves into place) and
        # may be the newest — or only — resumable state.  Promote it
        # rather than delete it, so a second crash during the ckptr.save
        # below can never leave zero checkpoints behind.
        if os.path.isdir(path):
            old = path + ".old"
            if os.path.isdir(old):
                shutil.rmtree(old)
            os.replace(path, old)
            os.replace(new, path)
            shutil.rmtree(old)
        else:
            if os.path.isfile(path):
                # pickle-fallback FILE from a no-orbax run: the .new
                # directory is newer and complete, replace it
                os.remove(path)
            os.replace(new, path)
    wrapped = {"format_version": np.array(STATE_VERSION, np.int32),
               "state": _to_numpy_tree(state)}
    kwargs = {}
    if jax.process_count() > 1:
        # multi-host training saves from the primary process ONLY (the
        # tree is host numpy by here — train/loop.py gates on _primary).
        # Orbax's default options barrier across ALL processes inside
        # save(), which deadlocks when the others never call it; scope
        # the barrier to the calling process instead.
        me = jax.process_index()
        kwargs["multiprocessing_options"] = ocp.options.MultiprocessingOptions(
            primary_host=me, active_processes={me},
            barrier_sync_key_prefix=f"vst_save_p{me}")
    with ocp.StandardCheckpointer(**kwargs) as ckptr:
        ckptr.save(new, wrapped)
    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.isfile(path):
        # a pickle-fallback file written while orbax was unavailable:
        # os.replace(dir, file) raises NotADirectoryError, so clear it
        os.remove(path)
    os.replace(new, path)


def _sniff_versioned(path: str) -> bool:
    """Guess whether an orbax checkpoint carries the format_version wrapper.

    Round-3 checkpoints are the bare tree, no wrapper: sniff the pytree
    key list from orbax's _METADATA file.  This reads orbax's PRIVATE
    metadata layout, so it is only a fast path — ``load_state_orbax``
    retries with the other template on a structure mismatch (ADVICE r4).
    """
    try:
        import json

        with open(os.path.join(path, "_METADATA")) as f:
            tree_keys = json.load(f)["tree_metadata"]
        return any(k.startswith("('format_version'") for k in tree_keys)
    except Exception:
        return True


def load_state_orbax(path: str, like: TrainState | None) -> TrainState:
    """Restore an orbax checkpoint; ``like`` supplies the tree structure
    (e.g. a freshly created TrainState)."""
    import orbax.checkpoint as ocp

    if like is None:
        raise ValueError(
            "orbax checkpoints restore against a template: pass "
            "like=<freshly created TrainState> to load_state")
    path = os.path.abspath(path)
    versioned = _sniff_versioned(path)

    def _restore(ckptr, versioned):
        if versioned:
            return ckptr.restore(
                path, {"format_version": np.array(0, np.int32),
                       "state": _to_numpy_tree(like)})
        return ckptr.restore(path, _to_numpy_tree(like))

    with ocp.StandardCheckpointer() as ckptr:
        try:
            result = _restore(ckptr, versioned)
        except Exception:
            versioned = not versioned
            result = _restore(ckptr, versioned)
    if versioned:
        v = int(result["format_version"])
        if v > STATE_VERSION:
            raise ValueError(f"checkpoint {path} has state version {v}; "
                             f"this build reads ≤{STATE_VERSION}")
        tree = result["state"]
    else:
        tree = result
    return jax.tree.map(jnp.asarray, tree)


def epoch_checkpoint_name(model_name: str, epoch: int, batch_size: int) -> str:
    """Reference naming convention (e.g. train_candy.py:170)."""
    return f"{model_name}_epoch_{epoch}_batchSize_{batch_size}"

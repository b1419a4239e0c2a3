"""Checkpointing: params + optimizer state + step, with .pth interop.

Improves on the reference's epoch-end ``torch.save(model.state_dict())``
(which never saves optimizer state and resumes by hand-editing constants —
SURVEY.md §5.4):

- ``save_params`` / ``load_params``: flat param dicts as ``.npz`` (the
  param keys are torch state_dict names, so npz keys are self-describing).
- ``save_state`` / ``load_state``: full TrainState (params + Adam moments +
  step) via a pickled numpy pytree.
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


def save_params(params: dict, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **_to_numpy_tree(params))


def load_params(path: str) -> dict:
    with np.load(path) as data:
        return {k: jnp.asarray(data[k]) for k in data.files}


def save_state(state: TrainState, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(_to_numpy_tree(state), f)


def load_state(path: str) -> TrainState:
    with open(path, "rb") as f:
        tree = pickle.load(f)
    return jax.tree.map(jnp.asarray, tree)


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
    """Orbax-backed full-state checkpoint (atomic, async-capable).

    The default ``save_state``/``load_state`` (pickled numpy pytree) has no
    extra dependencies; this variant integrates with orbax tooling.
    """
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), _to_numpy_tree(state))


def load_state_orbax(path: str, like: TrainState) -> TrainState:
    """Restore an orbax checkpoint; ``like`` supplies the tree structure
    (e.g. a freshly created TrainState)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(os.path.abspath(path),
                             _to_numpy_tree(like))
    return jax.tree.map(jnp.asarray, tree)


def epoch_checkpoint_name(model_name: str, epoch: int, batch_size: int) -> str:
    """Reference naming convention (e.g. train_candy.py:170)."""
    return f"{model_name}_epoch_{epoch}_batchSize_{batch_size}"

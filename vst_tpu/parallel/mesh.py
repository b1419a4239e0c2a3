"""Device mesh + sharding strategies.

The reference is strictly single-GPU (SURVEY.md §2 parallelism table); the
TPU build scales through ``jax.sharding`` annotations and lets XLA insert the
collectives over ICI:

- **Data parallelism** — batch sharded on the "data" axis, params
  replicated.  The gradient all-reduce appears automatically inside the
  jitted train step.
- **Spatial parallelism** — for high-resolution video inference, the image
  H dimension sharded on the "space" axis; XLA's SPMD partitioner inserts
  the conv halo exchanges.  Useful when a single frame exceeds one chip's
  comfortable working set (e.g. 4K stylization).

No explicit collective code exists anywhere: strategy = placement.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_names=("data",),
              shape=None) -> Mesh:
    """Mesh over the first n devices.

    1-D by default.  For 2-D composition (e.g. ``("data", "space")`` —
    batch-parallel training over oversized H-sharded frames) pass an
    explicit ``shape`` or let it auto-factor n_devices into the most
    balanced (data-major) divisor pair.  >2 axes require ``shape``.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if shape is None:
        if len(axis_names) == 1:
            shape = (n_devices,)
        elif len(axis_names) == 2:
            import math

            s = int(math.isqrt(n_devices))
            while n_devices % s:
                s -= 1
            shape = (n_devices // s, s)
        else:
            raise ValueError(
                f"pass shape= for a {len(axis_names)}-axis mesh")
    if int(np.prod(shape)) != n_devices:
        raise ValueError(f"shape {shape} != {n_devices} devices")
    return Mesh(devices.reshape(shape), axis_names)


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place a pytree of batched arrays with dim 0 sharded across ``axis``."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, tree)


def shard_spatial(mesh: Mesh, tree, axis: str = "space"):
    """Place NHWC arrays with the H dimension sharded across ``axis``."""
    def put(x):
        spec = P(None, axis, *([None] * (x.ndim - 2)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, tree)


def shard_batch_spatial(mesh: Mesh, tree, batch_axis: str = "data",
                        space_axis: str = "space"):
    """2-D placement: dim 0 (batch) on ``batch_axis`` AND dim 1 (H) on
    ``space_axis`` — data-parallel training on frames too large for one
    chip's working set.  XLA inserts both the conv halo exchanges (space)
    and the gradient all-reduce (data)."""
    def put(x):
        spec = P(batch_axis, space_axis, *([None] * max(x.ndim - 2, 0)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree.map(put, tree)

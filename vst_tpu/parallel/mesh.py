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


def make_mesh(n_devices: int | None = None, axis_names=("data",)) -> Mesh:
    """1-D (default) or N-D mesh over the first n devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if len(axis_names) == 1:
        shape = (n_devices,)
    else:
        raise NotImplementedError(
            "multi-axis meshes are constructed by callers via jax.sharding.Mesh")
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


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree.map(put, tree)

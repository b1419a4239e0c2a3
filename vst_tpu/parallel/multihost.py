"""Multi-host SPMD: one JAX process per TPU host, one global mesh.

The reference is a single-process, single-GPU suite (SURVEY.md §2); the
single-process vst_tpu scale-out path (``parallel.mesh``) already covers
one host's chips.  This module adds the multi-HOST layer for TPU pod
slices, where every host runs the same program against its own subset of
chips and JAX stitches them into one global device mesh:

- :func:`initialize` — bootstrap ``jax.distributed`` (the coordination
  service + Gloo/ICI collectives).  On a real TPU pod slice, call it with
  no arguments and everything is auto-detected from the TPU metadata; on
  CPU (tests) or explicit clusters, pass coordinator/count/id.
- :func:`put_global_batch` — assemble each process's HOST-LOCAL batch
  shard into one global jax.Array laid out by the given sharding.  The
  data pipeline stays embarrassingly parallel: every process loads only
  the ``1/process_count`` slice of each global batch it will feed its own
  chips (``BatchLoader(process_id=, num_processes=)``), and no sample
  crosses a host boundary.
- :func:`is_primary` — exactly one process owns checkpoint writes,
  metric sinks, and loss plots (``train/loop.py`` gates on it).

Train-step code needs NO changes: the jitted step sees one global mesh
and XLA inserts the gradient all-reduce over ICI within a host and DCN
across hosts, exactly as in the single-process data-parallel path.
"""

import numpy as np

import jax


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Start the JAX distributed runtime.  Must run before first backend
    use (cli.train calls it right after the platform pin).

    ``coordinator`` e.g. "10.0.0.1:8476" — the address every process can
    reach process 0 at.  All three arguments may be None on TPU pods
    (auto-detected); CPU/GPU clusters must pass all three.
    """
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def is_primary() -> bool:
    return jax.process_index() == 0


def put_global_batch(sharding, x):
    """Place a host-local batch shard as its slice of the global array.

    ``x`` is this process's ``global_batch/process_count`` rows (dim 0);
    the global shape is inferred as ``dim0 × process_count`` with all
    other dims host-complete — which covers both 1-D data parallelism and
    the 2-D data×space mesh (the "space" axis shards H *within* a host's
    devices, so H is host-complete).  Single-process: plain device_put.
    """
    nproc = jax.process_count()
    if nproc == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    global_shape = (x.shape[0] * nproc,) + tuple(x.shape[1:])
    return jax.make_array_from_process_local_data(sharding, x, global_shape)


def replicate_global(sharding_or_mesh, tree):
    """Replicate identical host values across ALL processes' devices.

    Every process must pass the same value (params, optimizer state).
    Works in single-process too (falls back to plain replication).
    """
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if isinstance(sharding_or_mesh, Mesh):
        sharding = NamedSharding(sharding_or_mesh, P())
    else:
        sharding = sharding_or_mesh

    def put(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        # local data == global shape on every dim ⇒ each process places
        # full copies on its addressable devices of the replicated layout
        return jax.make_array_from_process_local_data(sharding, x, x.shape)

    return jax.tree.map(put, tree)

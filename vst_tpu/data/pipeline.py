"""Host→device data pipeline: threaded loading + double-buffered prefetch.

Replaces the reference's ``DataLoader(num_workers=4, prefetch_factor=2)``
(e.g. ReCoNet/train_single/train_candy.py:34-40) with:

- ``BatchLoader`` — shuffling batcher over any indexable dataset, with a
  thread pool for sample loading (I/O-bound PIL/numpy work releases the
  GIL).
- ``device_prefetch`` — keeps N batches in flight on device
  (``jax.device_put`` is async), so the accelerator never waits on host
  decode — the double-buffering scheme from SURVEY.md §7 step 6.
"""

import collections
from concurrent.futures import ThreadPoolExecutor

import numpy as np


class BatchLoader:
    """Iterate minibatches of stacked numpy arrays over an epoch."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, num_workers: int = 4, drop_last: bool = True,
                 epoch: int = 0, start_batch: int = 0,
                 process_id: int = 0, num_processes: int = 1):
        """``epoch`` seeds the dataset's per-item randomness (set_epoch) for
        the first iteration; callers constructing one loader per epoch (e.g.
        run_training) pass the epoch number so crops/style picks differ
        across epochs yet stay reproducible.

        ``start_batch``: skip the first k batches of the (deterministic,
        seed-derived) shuffle at the INDEX level — no samples are decoded
        for skipped batches.  Mid-epoch resume after preemption: the
        remaining iteration is exactly the tail of the uninterrupted
        epoch.

        ``process_id``/``num_processes``: multi-host data loading.
        ``batch_size`` stays the GLOBAL batch; each process decodes only
        its ``batch_size/num_processes`` slice of every global batch (the
        shuffle is seed-derived, so all processes agree on the global
        order with zero communication).  Batch count, start_batch, and
        epoch semantics are all in GLOBAL terms, so mid-epoch resume and
        metrics are process-count independent."""
        if batch_size % num_processes:
            raise ValueError(f"batch_size {batch_size} must divide by "
                             f"num_processes {num_processes}")
        if num_processes > 1 and not drop_last:
            # a short final batch would slice unequal/empty per-process
            # shards and break the fixed-shape global batch assembly
            raise ValueError("drop_last=False is incompatible with "
                             "multi-process loading")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.num_workers = num_workers
        self.drop_last = drop_last
        self._epoch = epoch
        self.start_batch = start_batch
        self.process_id = process_id
        self.num_processes = num_processes

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        # Datasets with per-item derived RNG (ImageFolderCrop etc.) take the
        # epoch so crops/style picks vary across epochs yet stay reproducible
        # and thread-safe for any num_workers.
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self._epoch)
        self._epoch += 1
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        n_batches = len(self)
        first = min(self.start_batch, n_batches)
        self.start_batch = 0  # one-shot: later iterations run the full epoch
        pool = ThreadPoolExecutor(self.num_workers) if self.num_workers else None
        try:
            for b in range(first, n_batches):
                idxs = order[b * self.batch_size:(b + 1) * self.batch_size]
                if self.num_processes > 1:
                    lb = self.batch_size // self.num_processes
                    idxs = idxs[self.process_id * lb:
                                (self.process_id + 1) * lb]
                if pool is not None:
                    samples = list(pool.map(self.dataset.__getitem__, idxs))
                else:
                    samples = [self.dataset[i] for i in idxs]
                if isinstance(samples[0], tuple):
                    yield tuple(np.stack(parts) for parts in zip(*samples))
                else:
                    yield np.stack(samples)
        finally:
            if pool is not None:
                pool.shutdown(wait=False)


def device_prefetch(iterator, size: int = 2, sharding=None):
    """Wrap a host batch iterator, keeping ``size`` batches resident on
    device ahead of consumption.

    ``sharding``: optional ``jax.sharding.Sharding`` (e.g. a batch-sharded
    NamedSharding for data-parallel training); default places on the default
    device.  Under a multi-process runtime (``jax.process_count() > 1``)
    each process's batches are treated as HOST-LOCAL shards of the global
    batch and assembled with ``parallel.multihost.put_global_batch``.
    """
    import jax

    multi = sharding is not None and jax.process_count() > 1
    if multi:
        from vst_tpu.parallel.multihost import put_global_batch

    def put(batch):
        if sharding is None:
            return jax.tree.map(jax.device_put, batch)
        if multi:
            return jax.tree.map(
                lambda x: put_global_batch(sharding, x), batch)
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    queue = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out

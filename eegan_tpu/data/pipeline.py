"""Host data pipeline: deterministic sharded batching with worker processes
and device prefetch.

Replaces the reference's torch DataLoader (workers = batch/4, reference
`train.py:276-278`) with a TPU-appropriate design:

* per-sample RNG is `Philox(seed, epoch, index)` — fully deterministic and
  order-independent, so resume and multi-host sharding reproduce bit-exact
  streams (the reference uses ambient numpy RNG in worker processes —
  unreproducible);
* batches are assembled on the host and `device_put` with the batch
  dimension sharded over the mesh ``data`` axis while the accelerator is
  busy with the previous step (double-buffer prefetch);
* decoding runs in a fork-based process pool (JPEG decode + resize is the
  only CPU-heavy part).
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import threading
from typing import Dict, Iterator

import jax
import numpy as np

from eegan_tpu.parallel.mesh import batch_sharding, stacked_batch_sharding

_WORKER_DATASET = None


def _worker_init(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _worker_sample(args):
    seed, epoch, index = args
    rng = np.random.default_rng([seed, epoch, index])
    return _WORKER_DATASET.sample(index, rng)


def _stack(samples) -> Dict[str, np.ndarray]:
    out = {}
    for k in samples[0]:
        v0 = samples[0][k]
        if isinstance(v0, (str, bytes)):
            out[k] = [s[k] for s in samples]
        else:
            out[k] = np.stack([np.asarray(s[k]) for s in samples])
    return out


class DataPipeline:
    """Epoch-based shuffled batching over a dataset with `.sample(i, rng)`."""

    def __init__(self, dataset, batch_size: int, seed: int = 0,
                 num_workers: int = 0, shuffle: bool = True,
                 drop_last: bool = True, process_index: int = None,
                 process_count: int = None):
        """``batch_size`` is GLOBAL. In a multi-host run each process loads
        only its ``batch_size / process_count`` slice of every batch: the
        shuffled index order is seeded identically on all hosts (Philox on
        (seed, epoch)), so host p deterministically owns rows
        [p*local, (p+1)*local) of each global batch — the host-side half of
        GSPMD data parallelism over DCN (process args default to
        `jax.process_index()/count()`, i.e. 0/1 in single-host runs)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.process_index = (jax.process_index() if process_index is None
                              else process_index)
        self.process_count = (jax.process_count() if process_count is None
                              else process_count)
        if batch_size % self.process_count:
            raise ValueError(f"global batch {batch_size} not divisible by "
                             f"{self.process_count} processes")
        if self.process_count > 1 and not drop_last:
            # The per-host slice [lo:hi) of each global batch assumes full
            # batches; a short epoch tail would give hosts ragged/empty
            # slices and a mis-shaped global array.
            raise ValueError("multi-host runs require drop_last=True "
                             "(per-host batch slicing assumes full batches)")
        self.local_batch = batch_size // self.process_count
        self._pool = None
        if num_workers > 0:
            ctx = mp.get_context("fork")
            self._pool = ctx.Pool(num_workers, initializer=_worker_init,
                                  initargs=(dataset,))

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng([self.seed, epoch]).shuffle(order)
        limit = (n // self.batch_size) * self.batch_size if self.drop_last else n
        order = order[:limit]

        use_batch = (hasattr(self.dataset, "sample_batch")
                     and getattr(self.dataset, "_decoded", None) is not None)
        lo = self.process_index * self.local_batch
        hi = lo + self.local_batch
        for start in range(0, len(order), self.batch_size):
            idxs = order[start:start + self.batch_size][lo:hi]
            if use_batch:
                # zero-IPC fast path: one native OpenMP call per batch
                rngs = [np.random.default_rng([self.seed, epoch, int(i)])
                        for i in idxs]
                yield self.dataset.sample_batch([int(i) for i in idxs], rngs)
                continue
            args = [(self.seed, epoch, int(i)) for i in idxs]
            if self._pool is not None:
                samples = self._pool.map(_worker_sample, args)
            else:
                _worker_init(self.dataset)
                samples = [_worker_sample(a) for a in args]
            yield _stack(samples)

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool = None


def group_batches(iterator: Iterator[Dict[str, np.ndarray]],
                  k: int) -> Iterator[Dict[str, np.ndarray]]:
    """Stack consecutive batches into (K, B, ...) leaves for the multi-step
    scan driver (`make_multi_train_step`). The epoch tail yields a smaller
    stack (one extra compile for that shape, cached across epochs)."""
    group = []
    for batch in iterator:
        group.append(batch)
        if len(group) == k:
            yield {key: np.stack([b[key] for b in group]) for key in group[0]}
            group = []
    if group:
        yield {key: np.stack([b[key] for b in group]) for key in group[0]}


def device_prefetch(iterator: Iterator[Dict[str, np.ndarray]], mesh,
                    depth: int = 2,
                    stacked: bool = False) -> Iterator[Dict[str, jax.Array]]:
    """Asynchronously device_put batches (mesh data-axis sharded) ahead of use.

    With ``stacked=True`` leaves are (K, B, ...) stacks from
    :func:`group_batches`: the leading step dim is replicated and dim 1
    (batch) is sharded."""

    multihost = jax.process_count() > 1

    def put(batch):
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray):
                sh = (stacked_batch_sharding(mesh, v.ndim) if stacked
                      else batch_sharding(mesh, v.ndim))
                out[k] = (jax.make_array_from_process_local_data(sh, v)
                          if multihost else jax.device_put(v, sh))
            else:
                out[k] = v
        return out

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()

    def producer():
        try:
            for batch in iterator:
                q.put(put(batch))
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item

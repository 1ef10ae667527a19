"""Host-side batching: the DataLoader equivalent.

The reference uses torch DataLoader with 2 worker processes
(/root/reference/main.py:20-21).  Datasets here are small in-memory
arrays, so the TPU-native design is simpler and faster: whole-epoch
shuffled index slicing into contiguous numpy batches, optionally padded
to a fixed batch size so every step has a static shape (XLA-friendly —
no per-epoch recompile for the ragged tail batch).
"""

from __future__ import annotations

import numpy as np


class BatchLoader:
    """Iterates (xs, ys[, mask]) numpy batches over an array dataset.

    Args:
      dataset: object with ``.xs`` / ``.ys`` arrays (ArrayDataset,
        GaussPulseDataset or Subset).
      batch_size: batch size.
      shuffle: reshuffle each epoch.
      seed: shuffle seed.
      pad_last: if True, the final ragged batch is padded to
        ``batch_size`` (repeating index 0) and a boolean validity mask is
        yielded; if False, the ragged batch is yielded as-is.
      drop_last: drop the ragged batch entirely.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, pad_last: bool = True,
                 drop_last: bool = False):
        self.xs = np.asarray(dataset.xs, dtype=np.float32)
        self.ys = np.asarray(dataset.ys)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.pad_last = pad_last
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self):
        n = len(self.xs)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        """Fast-forward the shuffle stream so the next ``__iter__``
        produces the batch order of epoch ``epoch`` — a mid-trial
        resume replays the EXACT shuffles the uninterrupted run would
        have consumed (the rng is sequential across epochs, so skipping
        ahead requires burning the intermediate permutations)."""
        n = len(self.xs)
        scratch = np.arange(n)
        for _ in range(max(0, int(epoch) - self._epoch)):
            if self.shuffle:
                self._rng.shuffle(scratch)
            self._epoch += 1

    def __iter__(self):
        n = len(self.xs)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        self._epoch += 1
        bs = self.batch_size
        for start in range(0, n, bs):
            idx = order[start:start + bs]
            if len(idx) < bs:
                if self.drop_last:
                    return
                if self.pad_last:
                    pad = np.zeros(bs - len(idx), dtype=idx.dtype)
                    mask = np.zeros(bs, dtype=bool)
                    mask[:len(idx)] = True
                    idx = np.concatenate([idx, pad])
                    yield self.xs[idx], self.ys[idx], mask
                    continue
            mask = np.ones(len(idx), dtype=bool)
            yield self.xs[idx], self.ys[idx], mask


class PrefetchIterator:
    """Depth-bounded background prefetch of transformed batches.

    Wraps any batch iterable and applies ``transform`` (typically the
    host->device placement, e.g. ``jnp.asarray`` per field) on a
    background thread, keeping up to ``depth`` batches in flight.  On
    TPU this overlaps host batch slicing + H2D transfer with device
    compute — JAX dispatch is asynchronous, so by the time the training
    loop asks for batch i+1 its transfer was already enqueued while
    batch i computed.  (The reference gets the same overlap from torch
    DataLoader's worker processes, /root/reference/main.py:20-21.)

    Exceptions raised by the source iterator or the transform are
    re-raised in the consumer thread at the corresponding position.
    Iteration is single-pass; build a fresh instance (or call with a
    fresh ``iter()``) per epoch.
    """

    class _Done:
        """Private end-of-stream marker (carries a worker exception) —
        a dedicated type so no legitimate batch value can collide."""

        def __init__(self, error=None):
            self.error = error

    def __init__(self, iterable, transform=None, depth: int = 2):
        import queue
        import threading
        self._q = queue.Queue(maxsize=max(1, int(depth)))
        self._transform = transform
        self._stop = threading.Event()
        self._finished = False          # consumer saw the _Done sentinel

        def put(item):
            # bounded put that aborts when the consumer closed us —
            # otherwise an abandoned iterator (break / exception in the
            # training loop) would leave the worker blocked forever,
            # pinning depth+1 device-resident batches
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for item in iterable:
                    if self._stop.is_set():
                        return
                    out = (self._transform(item)
                           if self._transform is not None else item)
                    if not put(out):
                        return
            except BaseException as e:          # noqa: BLE001 — repropagated
                put(PrefetchIterator._Done(e))
                return
            put(PrefetchIterator._Done())

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def close(self):
        """Stop the worker and release queued batches.  Safe to call
        multiple times; called automatically on exhaustion and by
        __del__ (best effort) when iteration is abandoned early."""
        import queue
        self._stop.set()

        def drain():
            try:
                while True:
                    self._q.get_nowait()
            except queue.Empty:
                pass

        drain()
        if self._thread.is_alive():
            self._thread.join(timeout=1.0)
        # the worker checks _stop before q.put, so one put can land
        # after the first drain; re-drain once the thread is dead so
        # no (possibly device-resident) batch stays queued until GC
        drain()

    def __del__(self):                          # pragma: no cover
        try:
            self.close()
        except Exception:
            pass

    def __iter__(self):
        return self

    def __next__(self):
        if self._finished:
            # latched: a second loop over an exhausted iterator must
            # raise StopIteration again, not block on an empty queue
            raise StopIteration
        item = self._q.get()
        if isinstance(item, PrefetchIterator._Done):
            self._finished = True
            self._thread.join()
            if item.error is not None:
                raise item.error
            raise StopIteration
        return item

"""Host-side input pipeline: threaded prefetching batch loader + device
double-buffering.

TPU-first design: the reference used 8 fork()ed DataLoader workers with
file_system tensor sharing (SURVEY.md §2.9); here the samples are plain numpy
arrays produced by PIL/cv2/np code that releases the GIL, so a thread pool
feeding a bounded queue gives the same overlap without IPC.  The
`DevicePrefetcher` then keeps one batch ahead in HBM (host->device copy
overlapped with the running step) — chips never wait on the host in steady
state.
"""

import queue
import threading

import numpy as np


def collate(samples):
    """Stack a list of dict-of-array samples into a dict of batched arrays."""
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if np.isscalar(vals[0]) or np.asarray(vals[0]).ndim == 0:
            out[key] = np.asarray(vals)
        else:
            out[key] = np.stack(vals)
    return out


class DataLoader:
    """Iterates batches of collated numpy arrays with background workers.

    Epoch semantics match the reference loop: optional shuffle per epoch,
    drop_last for training (static batch shapes keep XLA from recompiling).
    """

    def __init__(self, dataset, batch_size, *, shuffle=False, num_workers=4,
                 drop_last=None, seed=0, prefetch_batches=4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = shuffle if drop_last is None else drop_last
        self.prefetch_batches = prefetch_batches
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_batches(self):
        indices = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(indices)
        n_batches = len(self)
        for b in range(n_batches):
            yield indices[b * self.batch_size:(b + 1) * self.batch_size]

    def __iter__(self):
        batch_indices = list(self._epoch_batches())
        if not batch_indices:
            return
        out_q = queue.Queue(maxsize=self.prefetch_batches)
        task_q = queue.Queue()
        for pos, idxs in enumerate(batch_indices):
            task_q.put((pos, idxs))
        results = {}
        lock = threading.Lock()
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                try:
                    pos, idxs = task_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    batch = collate([self.dataset[int(i)] for i in idxs])
                except Exception as e:  # surface loader errors to the consumer
                    batch = e
                with lock:
                    results[pos] = batch

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        try:
            next_pos = 0
            import time

            while next_pos < len(batch_indices):
                with lock:
                    batch = results.pop(next_pos, None)
                if batch is None:
                    time.sleep(0.001)
                    continue
                if isinstance(batch, Exception):
                    raise batch
                yield batch
                next_pos += 1
        finally:
            stop.set()


class DevicePrefetcher:
    """Wrap a batch iterator; keep `depth` batches already transferred to the
    device/mesh so the host->HBM copy overlaps with compute."""

    def __init__(self, iterator, put_fn, depth=2):
        self.iterator = iter(iterator)
        self.put_fn = put_fn
        self.depth = depth

    def __iter__(self):
        from collections import deque

        buf = deque()
        try:
            for _ in range(self.depth):
                buf.append(self.put_fn(next(self.iterator)))
        except StopIteration:
            pass
        while buf:
            nxt = buf.popleft()
            try:
                buf.append(self.put_fn(next(self.iterator)))
            except StopIteration:
                pass
            yield nxt

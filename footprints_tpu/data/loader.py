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
        n = len(batch_indices)
        cond = threading.Condition()
        results = {}  # pos -> ready batch; bounded by the prefetch window
        state = {"next_task": 0, "next_pos": 0, "error": None, "stop": False}

        def worker():
            while True:
                with cond:
                    # claim the next task, but never run further than
                    # `prefetch_batches` positions ahead of the consumer
                    # (bounds memory to window + in-flight batches)
                    while (not state["stop"] and state["error"] is None
                           and state["next_task"] < n
                           and state["next_task"]
                           >= state["next_pos"] + self.prefetch_batches):
                        cond.wait()
                    if state["stop"] or state["error"] or state["next_task"] >= n:
                        return
                    pos = state["next_task"]
                    state["next_task"] += 1
                try:
                    batch = collate([self.dataset[int(i)] for i in batch_indices[pos]])
                except Exception as e:  # surface promptly, not at pos's turn
                    with cond:
                        if state["error"] is None:
                            state["error"] = e
                        cond.notify_all()
                    return
                with cond:
                    results[pos] = batch
                    cond.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        try:
            for pos in range(n):
                with cond:
                    while pos not in results and state["error"] is None:
                        cond.wait()
                    if state["error"] is not None:
                        raise state["error"]
                    batch = results.pop(pos)
                    state["next_pos"] = pos + 1
                    cond.notify_all()  # reopen the prefetch window
                yield batch
        finally:
            with cond:
                state["stop"] = True
                cond.notify_all()


class BackgroundWriter:
    """Single background thread draining a bounded queue of save thunks.

    The batch-inference dumps (eval/inference.py, seg Tester) previously
    serialized device compute against per-image host `np.save`s; queueing
    the saves here (and double-buffering the forward/fetch, see those run
    loops) overlaps device compute, the device->host fetch, and file I/O.
    Errors raised by a thunk surface on the next submit() or on close().
    """

    def __init__(self, max_pending=64):
        import queue

        self._q = queue.Queue(maxsize=max_pending)
        self._err = None
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            if self._err is None:  # after an error, drain without running
                fn, args, kwargs = item
                try:
                    fn(*args, **kwargs)
                except Exception as e:
                    self._err = e

    def submit(self, fn, *args, **kwargs):
        if self._err is not None:
            raise self._err
        self._q.put((fn, args, kwargs))

    def close(self):
        """Flush the queue, join the thread, re-raise any thunk error."""
        self._q.put(None)
        self._t.join()
        if self._err is not None:
            raise self._err

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *_):
        if exc_type is None:
            self.close()
        else:  # don't mask the in-flight exception; just stop the thread
            self._err = self._err or RuntimeError("aborted")
            self._q.put(None)
            self._t.join()


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

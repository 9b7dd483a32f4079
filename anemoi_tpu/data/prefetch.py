"""Host->device batch prefetching.

The reference hides IO behind pinned-memory DataLoader workers
(/root/reference/training/src/anemoi/training/data/datamodule.py:175
dataloader workers + pin_memory).  The TPU-native equivalent: a background
thread assembles the next batches (memmap window reads) and stages them on
device while the current step runs -- jax dispatch is already async, so a
bounded queue of device-resident batches keeps the chip fed without the
host's make_batch latency appearing on the step critical path.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

_SENTINEL = object()


def prefetch_to_device(
    batches: Iterator,
    put_fn: Callable,
    size: int = 2,
) -> Iterator:
    """Yield ``put_fn(batch)`` for each batch, prepared ``size`` ahead on a
    daemon thread.  Closing the generator (early ``break``) stops the worker
    promptly instead of leaving it blocked on the queue."""
    q: "queue.Queue" = queue.Queue(maxsize=max(int(size), 1))
    stop = threading.Event()
    errors = []

    def worker():
        try:
            for b in batches:
                item = put_fn(b)
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except Exception as e:  # surfaced on the consumer side
            errors.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(_SENTINEL, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, name="batch-prefetch", daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if errors:
                    raise errors[0]
                return
            yield item
    finally:
        stop.set()
        # actually JOIN the worker: a daemon thread still running inside
        # native code (zlib chunk decode, device put) when the interpreter
        # exits aborts the whole process ("FATAL: exception not rethrown").
        # stop is set, so the worker exits after at most one item.
        while not q.empty():  # unblock a worker mid-put
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join(timeout=30.0)


def maybe_prefetch(
    batches: Iterator,
    put_fn: Callable,
    size: Optional[int],
) -> Iterator:
    """Prefetching iterator, or a plain map when size is falsy/0."""
    if size:
        return prefetch_to_device(batches, put_fn, size)
    return (put_fn(b) for b in batches)

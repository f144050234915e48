"""Host->device prefetching.

The reference's DLC trainer hides host latency behind a TF FIFOQueue + a
producer thread (ref: deeplabcut/pose_estimation_tensorflow/train.py:57-92);
DGP's own loop is fully synchronous feed_dict (ref: fitdgp.py:801-819).

TPU-native equivalent: a bounded background producer that assembles numpy
batches and eagerly `jax.device_put`s them, so the accelerator step `t+1`'s
H2D copy overlaps step `t`'s compute (double/triple buffering via queue
depth).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator


class _Stop:
    pass


class DevicePrefetcher:
    """Runs ``producer`` items through ``transfer`` on a background thread.

    producer: iterator of host batches (any pytree of numpy arrays).
    transfer: host batch -> device batch (e.g. partial(jax.device_put,
      device=...) or a sharding-aware put). Runs on the worker thread;
      device_put is async so this only enqueues the copies.
    depth: queue size (2 = double buffering).
    """

    def __init__(self, producer: Iterator, transfer: Callable, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err = None
        self._thread = threading.Thread(
            target=self._run, args=(producer, transfer), daemon=True)
        self._thread.start()

    def _run(self, producer, transfer):
        try:
            for item in producer:
                self._q.put(transfer(item))
        except Exception as e:  # surfaced on next __next__
            self._err = e
        finally:
            self._q.put(_Stop())

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if isinstance(item, _Stop):
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        # drain so the worker can exit
        while True:
            try:
                item = self._q.get_nowait()
                if isinstance(item, _Stop):
                    break
            except queue.Empty:
                break

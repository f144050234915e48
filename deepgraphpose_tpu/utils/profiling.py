"""Tracing + per-step timing utilities.

The reference's observability is wall-clock prints and a learning_stats.csv
(ref: fitdgp.py:817-830, 193-235; SURVEY §5 "Tracing/profiling: none
beyond..."). TPU-native equivalents:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace (XLA op-level timeline on TPU).
* :class:`StepTimer` — cheap rolling step timing with JSON-lines output,
  usable inside training loops without forcing device syncs (callers pass
  already-fetched scalars).
* :func:`device_memory_stats` — per-device live/peak HBM bytes.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path


@contextlib.contextmanager
def trace(logdir: str | Path, host_tracer_level: int = 2):
    """Profile the enclosed block: ``with trace('/tmp/tb'): step(...)``.

    View with TensorBoard's profile plugin, or xprof. No-op (with a
    warning) if the profiler cannot start (e.g. another trace is active).
    """
    import jax

    logdir = str(logdir)
    started = False
    try:
        jax.profiler.start_trace(logdir,
                                 create_perfetto_link=False)
        started = True
    except Exception as e:  # pragma: no cover - profiler races
        print(f"[profiling] could not start trace: {e}")
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()
            print(f"[profiling] trace written to {logdir}")


class StepTimer:
    """Rolling per-step wall timing + metric logging as JSON lines.

    >>> timer = StepTimer(train_dir / 'steps.jsonl', window=50)
    >>> for it in ...:
    ...     out = train_step(...)
    ...     timer.step(it, loss=float(out['total_loss']))
    """

    def __init__(self, path: str | Path | None = None, window: int = 50):
        self.path = Path(path) if path else None
        self.window = window
        self._t_last = time.perf_counter()
        self._durations: list[float] = []
        self._fh = None
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            self._fh = open(self.path, "a", buffering=1)

    def tick(self) -> float:
        """Record one step's wall duration without writing a record.

        Call once per training iteration; pair with :meth:`write` at
        display intervals so 'step_seconds' stays a true per-step number.
        """
        now = time.perf_counter()
        dt = now - self._t_last
        self._t_last = now
        self._durations.append(dt)
        if len(self._durations) > self.window:
            self._durations.pop(0)
        return dt

    def write(self, iteration: int, **metrics) -> None:
        """Emit a JSONL record with the rolling mean step time."""
        if self._fh:
            self._fh.write(json.dumps(
                {"iteration": iteration,
                 "step_seconds": round(self.mean_step_seconds, 6),
                 **metrics}) + "\n")

    def step(self, iteration: int, **metrics) -> float:
        """tick() + write() in one call (for loops that log every step)."""
        dt = self.tick()
        self.write(iteration, **metrics)
        return dt

    def interval(self, iteration: int, n_steps: int, **metrics) -> float:
        """Record a synced interval of ``n_steps`` steps as one measurement.

        The right primitive for async-dispatch training loops (JAX): per-
        iteration host timing only measures enqueue cost; the real device
        time is observable at sync points (e.g. fetching the loss every
        displayiters). Call this right after such a sync — it attributes
        the elapsed wall time evenly across the interval's steps and writes
        one record. Returns the per-step seconds.
        """
        now = time.perf_counter()
        dt = (now - self._t_last) / max(n_steps, 1)
        self._t_last = now
        self._durations.append(dt)
        if len(self._durations) > self.window:
            self._durations.pop(0)
        self.write(iteration, **metrics)
        return dt

    @property
    def mean_step_seconds(self) -> float:
        return (sum(self._durations) / len(self._durations)
                if self._durations else 0.0)

    def rate(self, items_per_step: float = 1.0) -> float:
        """Throughput (items/second) over the rolling window."""
        m = self.mean_step_seconds
        return items_per_step / m if m > 0 else 0.0

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def device_memory_stats() -> list[dict]:
    """Per-device memory statistics (bytes), where the backend reports them."""
    import jax

    out = []
    for d in jax.devices():
        stats = {}
        try:
            raw = d.memory_stats() or {}
            stats = {k: raw[k] for k in
                     ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
                     if k in raw}
        except Exception:
            pass
        out.append({"device": str(d), **stats})
    return out

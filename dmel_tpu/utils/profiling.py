"""Tracing and step timing.

The reference has no profiling beyond commented-out time.time() deltas
(/root/reference/train.py:26-62).  Rebuild (SURVEY.md §5): a
jax.profiler trace context + a lightweight step timer reporting the
north-star metric, audio-seconds/s/chip.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Tracks steps/s and audio-seconds/s/chip over a training run.

    >>> timer = StepTimer(audio_seconds_per_batch=20.0)
    >>> with timer.step():
    ...     train_step(...)
    >>> timer.summary()["audio_s_per_s_per_chip"]
    """

    def __init__(self, audio_seconds_per_batch: float,
                 n_chips: int | None = None, skip_first: int = 1):
        self.audio_s = audio_seconds_per_batch
        self.n_chips = n_chips or jax.device_count()
        self.skip_first = skip_first  # exclude compile from the average
        self.times: list[float] = []
        self._all = 0

    @contextlib.contextmanager
    def step(self):
        t = time.perf_counter()
        yield
        dt = time.perf_counter() - t
        self._all += 1
        if self._all > self.skip_first:
            self.times.append(dt)

    def summary(self) -> dict:
        if not self.times:
            return {"steps": 0}
        mean = sum(self.times) / len(self.times)
        return {
            "steps": len(self.times),
            "mean_step_s": mean,
            "steps_per_s": 1.0 / mean,
            "audio_s_per_s": self.audio_s / mean,
            "audio_s_per_s_per_chip": self.audio_s / mean / self.n_chips,
        }

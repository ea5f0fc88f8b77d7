"""Tracing / metrics / observability (SURVEY.md §5).

Reference: `log`/`env_logger` + per-stage Instant timers.  TPU-native:
`jax.named_scope` stage annotation (shows up in XLA/Perfetto traces),
`block_until_ready`-bracketed wall-clock stage timers, structured JSON-lines
metrics, and an optional `jax.profiler` trace context.
"""

from __future__ import annotations

import contextlib
import json
import logging
import sys
import time
from typing import Any, Iterator

import jax

logger = logging.getLogger("akaze_tpu")


class StageTimer:
    """Wall-clock per-stage timing with device-sync boundaries.

    Usage:
        timer = StageTimer()
        with timer.stage("scale_space"):
            out = step(...)            # traced work
        timer.summary()  -> {"scale_space": seconds, ...}
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.times: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result: Any = None) -> Iterator[None]:
        if self.sync:
            _sync()
        t0 = time.perf_counter()
        with jax.named_scope(name):
            yield
        if self.sync:
            _sync()
        dt = time.perf_counter() - t0
        self.times[name] = self.times.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        logger.debug("stage %s: %.4fs", name, dt)

    def summary(self) -> dict[str, float]:
        return dict(self.times)


def _sync() -> None:
    try:
        (jax.device_put(0.0) + 0).block_until_ready()
    except Exception:  # pragma: no cover - device-less edge cases
        pass


class MetricsLogger:
    """Structured JSON-lines metrics (SURVEY.md §5: keypoints/frame, match
    inlier ratio, BA residual, frames/s/chip)."""

    def __init__(self, stream=None):
        self.stream = stream if stream is not None else sys.stderr

    def log(self, event: str, **fields) -> None:
        rec = {"event": event, "time": time.time(), **fields}
        self.stream.write(json.dumps(rec) + "\n")
        self.stream.flush()


@contextlib.contextmanager
def profiler_trace(logdir: str | None) -> Iterator[None]:
    """Optional XLA profiler trace (Perfetto/XPlane) around a region."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_debug_checks() -> None:
    """Semantic sanitizers for tests (SURVEY.md §5 race-detection row):
    NaN debugging — XLA is data-race-free by construction; golden parity is
    the semantic sanitizer."""
    jax.config.update("jax_debug_nans", True)

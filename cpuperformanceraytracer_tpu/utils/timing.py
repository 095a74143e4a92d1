"""Monotonic timers + the offline benchmark protocol.

Replaces the reference's QueryPerformanceCounter wrappers (utils.cpp:9-36)
and its offline measurement protocol (Application.cpp:420-452): N warmup
frames, then mean wall-clock ms/frame over M timed frames. On an async
backend like JAX the protocol additionally requires blocking on device
results (block_until_ready) — the device-side analog of the reference's
CompleteAllWork join barrier.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List


def device_sync(tree) -> float:
    """Force completion of the computation producing ``tree``.

    jax.block_until_ready is not trustworthy on every backend (the
    tunneled TPU backend here returns before execution finishes), so the
    join barrier is a 4-byte fact: slice one element on device and fetch
    it to host — the fetch cannot complete before every producing op has.
    Returns the fetched scalar (so callers can also sanity-check it).
    """
    import jax

    leaf = jax.tree.leaves(tree)[0]
    return float(leaf.ravel()[0])


class Timer:
    """Context-manager wall-clock timer (monotonic, ns resolution)."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        return False

    @property
    def ms(self) -> float:
        return self.elapsed * 1e3


@dataclass
class FrameTimer:
    """Warmup-then-measure frame timer (Application.cpp:420-452 protocol)."""

    warmup_frames: int = 2
    _times: List[float] = field(default_factory=list)
    _seen: int = 0
    _t0: float = 0.0

    def frame_start(self):
        self._t0 = time.perf_counter()

    def frame_end(self):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup_frames:
            self._times.append(dt)

    def add_span(self, seconds: float, frames: int):
        """Record a timed span covering ``frames`` frames (chained-dispatch
        protocol: frames enqueued back-to-back, one join per span)."""
        for _ in range(frames):
            self._seen += 1
            if self._seen > self.warmup_frames:
                self._times.append(seconds / frames)

    @property
    def timed_frames(self) -> int:
        return len(self._times)

    @property
    def mean_ms(self) -> float:
        if not self._times:
            return float("nan")
        return 1e3 * sum(self._times) / len(self._times)

    def rays_per_second(self, rays_per_frame: float) -> float:
        if not self._times:
            return float("nan")
        return rays_per_frame * len(self._times) / sum(self._times)

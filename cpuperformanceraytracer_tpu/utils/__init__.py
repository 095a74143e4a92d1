"""Timing, logging, and misc host-side utilities (reference aux subsystems)."""

from cpuperformanceraytracer_tpu.utils.timing import Timer, FrameTimer  # noqa: F401
from cpuperformanceraytracer_tpu.utils.log import get_logger, progress  # noqa: F401

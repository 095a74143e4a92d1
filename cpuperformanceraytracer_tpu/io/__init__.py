"""Image writers + checkpoint/resume."""

from cpuperformanceraytracer_tpu.io.image import write_bmp, write_png  # noqa: F401
from cpuperformanceraytracer_tpu.io.checkpoint import (  # noqa: F401
    save_checkpoint,
    load_checkpoint,
)

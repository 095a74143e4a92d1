"""Checkpoint / resume for long progressive renders.

The reference has none (SURVEY.md section 5): its restartable state is
implicitly the f32 accumulation target + iFrame. Here that state is
serialized explicitly — accumulation planes, frame index, and config
fingerprint — so a multi-hour 4K/1024spp offline render survives
preemption. Plain npz; the state is tiny next to render time.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

import numpy as np

from cpuperformanceraytracer_tpu.config import RenderConfig
from cpuperformanceraytracer_tpu.core.vecmath import Vec3

_FORMAT_VERSION = 1


def save_checkpoint(path: str, accum, frame: int, cfg: RenderConfig) -> None:
    """``accum``: either layout (Vec3 planes or packed (H, W, 4)); the
    on-disk format is always channel planes, so checkpoints stay
    interchangeable across accum_layout settings."""
    from cpuperformanceraytracer_tpu.render.frame import accum_to_vec3

    v = accum_to_vec3(accum)
    np.savez_compressed(
        path,
        version=_FORMAT_VERSION,
        frame=int(frame),
        r=np.asarray(v.x),
        g=np.asarray(v.y),
        b=np.asarray(v.z),
        config=json.dumps(dataclasses.asdict(cfg)),
    )


def load_checkpoint(path: str) -> Tuple[Vec3, int, RenderConfig]:
    with np.load(path, allow_pickle=False) as z:
        if int(z["version"]) != _FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {z['version']}")
        cfg = RenderConfig(**json.loads(str(z["config"])))
        accum = Vec3(z["r"], z["g"], z["b"])
        return accum, int(z["frame"]), cfg


def resume_or_fresh(path: Optional[str], cfg: RenderConfig):
    """(accum, start_frame) — from checkpoint if compatible, else zeros.
    The returned buffer is in ``cfg``'s accumulation layout
    (config.accum_layout), whatever layout wrote the checkpoint."""
    import jax.numpy as jnp

    if path:
        try:
            accum, frame, saved_cfg = load_checkpoint(path)
            if (saved_cfg.width, saved_cfg.height) == (cfg.width, cfg.height):
                if cfg.packed_accum:
                    packed = np.stack(
                        [accum.x, accum.y, accum.z,
                         np.zeros_like(accum.x)], axis=-1)
                    return jnp.asarray(packed), frame
                return (
                    Vec3(jnp.asarray(accum.x), jnp.asarray(accum.y),
                         jnp.asarray(accum.z)),
                    frame,
                )
        except FileNotFoundError:
            pass
    from cpuperformanceraytracer_tpu.render.frame import zero_accum

    return zero_accum(cfg), 0

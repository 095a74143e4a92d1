"""Path-replay backward pass: O(1)-memory gradients through the bounce loop.

Plain reverse-mode through the 9-segment bounce loop stores every
intermediate of every segment for the backward sweep — O(bounces) live
state per pixel, the classic memory blowup. The path-replay strategy
(BASELINE.json north star; SURVEY.md section 7.7) stores only each
segment's INPUT state and replays the segment's computation during the
backward sweep. Because the RNG is counter-based (draws addressed by
(pixel, sample, draw-index), not sequential state), the replay
regenerates the identical lottery decisions and directions — this is
exactly ``jax.checkpoint`` (rematerialization) applied to the bounce
body, so that is the implementation: a thin, tested wrapper rather than
a hand-rolled VJP of the same jaxpr.

Usage: ``render_for_params_replay`` is a drop-in for
``diff.grad.render_for_params`` with rematerialized bounces.
"""

from __future__ import annotations

from typing import Dict

from cpuperformanceraytracer_tpu.config import RenderConfig
from cpuperformanceraytracer_tpu.core.vecmath import Vec3
from cpuperformanceraytracer_tpu.diff.grad import apply_params
from cpuperformanceraytracer_tpu.render.frame import render_frame


def render_for_params_replay(params: Dict, scene, camera, texture,
                             cfg: RenderConfig, frame=0) -> Vec3:
    """Differentiable render with rematerialized (replayed) bounce loop.

    The whole per-frame render function is checkpointed: the backward
    pass re-runs the forward trace per segment instead of storing it.
    Requires cfg.rng == "counter" for deterministic replay (wang's
    sequential state also replays correctly under remat, but counter is
    the contract we guarantee).
    """
    cfg = cfg.replace(remat_bounces=True)
    scene, texture = apply_params(scene, texture, params)
    return render_frame(scene, camera, texture, cfg, frame)

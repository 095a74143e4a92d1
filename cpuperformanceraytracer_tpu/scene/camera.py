"""Pinhole camera.

Mirror of Camera/InitializeCamera
(demofox_path_tracing_optimization_v4.cpp:380-386, 1498-1502): image
plane at unit distance scaled by 1/tan(FOV/2), aspect correction divides
the y target coordinate.

``forward_z`` covers the two conventions in the reference family:
the scalar ep.1 renderer looks down +z from the origin
(demofox_path_tracing_scalar.cpp:335-351, rayTarget.z = +dist), the v4
renderer sits at z=40 looking down -z (rayTarget.z = -camera.Distance,
demofox_path_tracing_optimization_v4.cpp:1112,1501).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from cpuperformanceraytracer_tpu.core.vecmath import Vec3, vec3


class Camera(NamedTuple):
    position: Vec3
    distance: jnp.ndarray  # image-plane distance, 1/tan(FOV/2)
    forward_z: jnp.ndarray  # +1.0 (scalar scene) or -1.0 (v4 scene)


def make_camera(
    position=(0.0, 0.0, 0.0), fov_degrees: float = 90.0, forward_z: float = 1.0
) -> Camera:
    dist = 1.0 / math.tan(math.radians(fov_degrees) * 0.5)
    return Camera(
        position=vec3(*position),
        distance=jnp.float32(dist),
        forward_z=jnp.float32(forward_z),
    )

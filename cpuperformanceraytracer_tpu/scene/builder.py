"""Host-side scene construction API.

Mirror of the reference's builder functions Add{Material,QuadObject,
SphereObject}ToScene (demofox_path_tracing_optimization_v4.cpp:1368-1401)
with two deliberate changes:

- materials are referenced by explicit index instead of the implicit
  object-order == material-order coupling of the reference;
- the reference's albedo bug — AddMaterialToScene writes ``albedo.x``
  into all three channels (:1371-1372), so every scene renders with grey
  albedo — is FIXED by default and reproducible with
  ``grey_albedo_bug=True`` for strict image parity experiments.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax.numpy as jnp

from cpuperformanceraytracer_tpu.core.vecmath import Vec3
from cpuperformanceraytracer_tpu.scene.types import (
    Material,
    Materials,
    Quads,
    Scene,
    Spheres,
)


def _vec3_stack(points: List[Tuple[float, float, float]]) -> Vec3:
    a = np.asarray(points, dtype=np.float32).reshape(-1, 3)
    return Vec3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]), jnp.asarray(a[:, 2]))


class SceneBuilder:
    def __init__(self, translation=(0.0, 0.0, 0.0), grey_albedo_bug: bool = False):
        """``translation`` mirrors scene.sceneTranslation (:1407-1412):
        every quad vertex and sphere center is offset by it at build time.
        """
        self._t = np.asarray(translation, dtype=np.float32)
        self._grey_bug = grey_albedo_bug
        self._materials: List[Material] = []
        self._quads: List[tuple] = []
        self._spheres: List[tuple] = []

    def add_material(self, m: Material) -> int:
        if self._grey_bug:
            # Strict reference parity: albedo.x copied into G and B
            # (demofox_path_tracing_optimization_v4.cpp:1370-1372).
            m = Material(
                albedo=(m.albedo[0], m.albedo[0], m.albedo[0]),
                emissive=m.emissive,
                specular_chance=m.specular_chance,
                specular_roughness=m.specular_roughness,
                specular_color=m.specular_color,
                ior=m.ior,
                refraction_chance=m.refraction_chance,
                refraction_roughness=m.refraction_roughness,
                refraction_color=m.refraction_color,
            )
        self._materials.append(m)
        return len(self._materials) - 1

    def add_quad(self, v0, v1, v2, v3, material: int, translate: bool = True) -> int:
        t = self._t if translate else 0.0
        vs = [np.asarray(v, dtype=np.float32) + t for v in (v0, v1, v2, v3)]
        self._quads.append((*vs, material))
        return len(self._quads) - 1

    def add_sphere(self, center, radius: float, material: int, translate: bool = True) -> int:
        t = self._t if translate else 0.0
        c = np.asarray(center, dtype=np.float32) + t
        self._spheres.append((c, float(radius), material))
        return len(self._spheres) - 1

    def build(self) -> Scene:
        if not self._quads:
            # keep shapes static and non-empty: one degenerate far-away quad
            self.add_quad(
                (1e7, 1e7, 1e7), (1e7 + 1, 1e7, 1e7), (1e7 + 1, 1e7 + 1, 1e7),
                (1e7, 1e7 + 1, 1e7), 0, translate=False,
            )
        if not self._spheres:
            self.add_sphere((1e7, 1e7, 1e7), 1e-3, 0, translate=False)
        if not self._materials:
            self.add_material(Material())

        quads = Quads(
            v0=_vec3_stack([q[0] for q in self._quads]),
            v1=_vec3_stack([q[1] for q in self._quads]),
            v2=_vec3_stack([q[2] for q in self._quads]),
            v3=_vec3_stack([q[3] for q in self._quads]),
            material=jnp.asarray([q[4] for q in self._quads], jnp.int32),
        )
        spheres = Spheres(
            center=_vec3_stack([s[0] for s in self._spheres]),
            radius=jnp.asarray([s[1] for s in self._spheres], jnp.float32),
            material=jnp.asarray([s[2] for s in self._spheres], jnp.int32),
        )

        ms = self._materials

        def f(get) -> jnp.ndarray:
            return jnp.asarray([get(m) for m in ms], jnp.float32)

        def f3(get) -> Vec3:
            return _vec3_stack([get(m) for m in ms])

        materials = Materials(
            albedo=f3(lambda m: m.albedo),
            emissive=f3(lambda m: m.emissive),
            specular_chance=f(lambda m: m.specular_chance),
            specular_roughness=f(lambda m: m.specular_roughness),
            specular_color=f3(lambda m: m.specular_color),
            ior=f(lambda m: m.ior),
            refraction_chance=f(lambda m: m.refraction_chance),
            refraction_roughness=f(lambda m: m.refraction_roughness),
            refraction_color=f3(lambda m: m.refraction_color),
        )
        return Scene(quads=quads, spheres=spheres, materials=materials)

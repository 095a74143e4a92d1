"""Named scene presets mirroring the reference's variant-ladder scene family.

Two scene families exist in the reference (SCENE selector,
demofox_path_tracing_optimization_v4.cpp:697 and ..._v3_redo.cpp:382-607):

- ``cornell_box``: the ep.1 Cornell-ish box from the scalar renderer —
  back/floor/ceiling/red/green walls, 20*(1,.9,.7) area light, three
  diffuse spheres (demofox_path_tracing_scalar.cpp:186-287).
- ``glass_spheres``: the v4 hero scene — floor, striped background
  (untranslated!), ceiling, area light, and seven glass spheres with a
  0..0.5 roughness ramp (demofox_path_tracing_optimization_v4.cpp:
  1403-1496).

Both return (Scene, Camera). The reference's grey-albedo builder bug is
fixed by default; pass grey_albedo_bug=True for strict parity with the
reference's actual (buggy) output.
"""

from __future__ import annotations

from typing import Tuple

from cpuperformanceraytracer_tpu.scene.builder import SceneBuilder
from cpuperformanceraytracer_tpu.scene.camera import Camera, make_camera
from cpuperformanceraytracer_tpu.scene.types import Material, Scene


def cornell_box_scene() -> Tuple[Scene, Camera]:
    """Scalar ep.1 scene (demofox_path_tracing_scalar.cpp:186-287).

    Camera at the origin looking +z; scene translated (0,0,10). The
    scalar renderer assigns materials inline per object, not via the
    (buggy) SoA builder, so colors here are exact.
    """
    b = SceneBuilder(translation=(0.0, 0.0, 10.0))
    grey = b.add_material(Material(albedo=(0.7, 0.7, 0.7)))
    red = b.add_material(Material(albedo=(0.7, 0.1, 0.1)))
    green = b.add_material(Material(albedo=(0.1, 0.7, 0.1)))
    light = b.add_material(Material(emissive=(20.0, 18.0, 14.0)))  # 20*(1,.9,.7)
    s1 = b.add_material(Material(albedo=(0.9, 0.9, 0.75)))
    s2 = b.add_material(Material(albedo=(0.9, 0.75, 0.9)))
    s3 = b.add_material(Material(albedo=(0.75, 0.9, 0.9)))

    # back wall
    b.add_quad((-12.6, -12.6, 25.0), (12.6, -12.6, 25.0),
               (12.6, 12.6, 25.0), (-12.6, 12.6, 25.0), grey)
    # floor
    b.add_quad((-12.6, -12.45, 25.0), (12.6, -12.45, 25.0),
               (12.6, -12.45, 15.0), (-12.6, -12.45, 15.0), grey)
    # ceiling
    b.add_quad((-12.6, 12.5, 25.0), (12.6, 12.5, 25.0),
               (12.6, 12.5, 15.0), (-12.6, 12.5, 15.0), grey)
    # left (red) wall
    b.add_quad((-12.5, -12.6, 25.0), (-12.5, -12.6, 15.0),
               (-12.5, 12.6, 15.0), (-12.5, 12.6, 25.0), red)
    # right (green) wall
    b.add_quad((12.5, -12.6, 25.0), (12.5, -12.6, 15.0),
               (12.5, 12.6, 15.0), (12.5, 12.6, 25.0), green)
    # area light
    b.add_quad((-5.0, 12.4, 22.5), (5.0, 12.4, 22.5),
               (5.0, 12.4, 17.5), (-5.0, 12.4, 17.5), light)

    b.add_sphere((-9.0, -9.5, 20.0), 3.0, s1)
    b.add_sphere((0.0, -9.5, 20.0), 3.0, s2)
    b.add_sphere((9.0, -9.5, 20.0), 3.0, s3)

    camera = make_camera(position=(0.0, 0.0, 0.0), fov_degrees=90.0, forward_z=1.0)
    return b.build(), camera


def glass_spheres_scene(grey_albedo_bug: bool = False) -> Tuple[Scene, Camera]:
    """v4 hero scene (demofox_path_tracing_optimization_v4.cpp:1403-1496).

    Scene translated (0,0,10); the striped-background quad is added
    WITHOUT the translation, faithfully reproducing :1430-1436. Camera at
    (0,0,40) looking -z (:1498-1502). Seven refractive spheres, IOR 1.1,
    refraction chance 1, specular chance 0.02, roughness ramp 0..0.5.
    """
    b = SceneBuilder(translation=(0.0, 0.0, 10.0), grey_albedo_bug=grey_albedo_bug)

    floor = b.add_material(Material(albedo=(0.7, 0.7, 0.7)))
    b.add_quad((-25.0, -12.5, 5.0), (25.0, -12.5, 5.0),
               (25.0, -12.5, -5.0), (-25.0, -12.5, -5.0), floor)

    stripes = b.add_material(Material(albedo=(0.35, 0.35, 0.35)))
    b.add_quad((-25.0, -1.5, 5.0), (25.0, -1.5, 5.0),
               (25.0, -10.5, 5.0), (-25.0, -10.5, 5.0), stripes,
               translate=False)  # quirk: built untranslated in the reference

    ceiling = b.add_material(Material(albedo=(0.7, 0.7, 0.7)))
    b.add_quad((-7.5, 12.5, 5.0), (7.5, 12.5, 5.0),
               (7.5, 12.5, -5.0), (-7.5, 12.5, -5.0), ceiling)

    light = b.add_material(Material(emissive=(20.0, 18.0, 14.0)))
    b.add_quad((-5.0, 12.4, 2.5), (5.0, 12.4, 2.5),
               (5.0, 12.4, -2.5), (-5.0, 12.4, -2.5), light)

    n_spheres = 7
    for i in range(n_spheres):
        r = (i / (n_spheres - 1)) * 0.5
        mat = b.add_material(
            Material(
                albedo=(0.9, 0.25, 0.25),
                specular_chance=0.02,
                specular_roughness=r,
                specular_color=(0.8, 0.8, 0.8),
                ior=1.1,
                refraction_chance=1.0,
                refraction_roughness=r,
                refraction_color=(0.0, 0.5, 1.0),
            )
        )
        b.add_sphere((-18.0 + 6.0 * i, -8.0, 0.0), 2.8, mat)

    camera = make_camera(position=(0.0, 0.0, 40.0), fov_degrees=90.0, forward_z=-1.0)
    return b.build(), camera


_PRESETS = {
    "cornell_box": cornell_box_scene,
    "glass_spheres": glass_spheres_scene,
}


def scene_by_name(name: str, **kwargs) -> Tuple[Scene, Camera]:
    """Named preset lookup — the config-system analog of the reference's
    compile-time SCENE selector macro."""
    try:
        return _PRESETS[name](**kwargs)
    except KeyError:
        raise ValueError(f"unknown scene {name!r}; have {sorted(_PRESETS)}") from None

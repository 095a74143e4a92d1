"""Integrator tests: intersection ops vs analytic geometry, bounce-loop
invariants, config-matrix smoke renders, accumulation math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpuperformanceraytracer_tpu.config import RenderConfig
from cpuperformanceraytracer_tpu.core.vecmath import Vec3, vec3, normalize
from cpuperformanceraytracer_tpu.render.frame import (
    accumulate_frame,
    render_frame,
    zero_accum,
)
from cpuperformanceraytracer_tpu.render.integrator import (
    SUPER_FAR,
    camera_ray,
    trace_scene,
)
from cpuperformanceraytracer_tpu.core.rng import WangRng
from cpuperformanceraytracer_tpu.scene.builder import SceneBuilder
from cpuperformanceraytracer_tpu.scene.presets import cornell_box_scene, glass_spheres_scene
from cpuperformanceraytracer_tpu.scene.types import Material, precompute_quads
from cpuperformanceraytracer_tpu.texture.procedural import gradient_sky
from cpuperformanceraytracer_tpu.texture.texture import texture_from_array


def _simple_scene():
    b = SceneBuilder()
    m = b.add_material(Material(albedo=(1.0, 0.5, 0.25)))
    b.add_quad((-1, -1, 5), (1, -1, 5), (1, 1, 5), (-1, 1, 5), m)
    b.add_sphere((0, 0, 10), 1.0, m)
    return b.build()


def _trace(scene, pos, dir):
    derived = precompute_quads(scene.quads)
    return trace_scene(scene, derived, vec3(*pos), normalize(vec3(*dir)))


class TestIntersection:
    def test_quad_frontal_hit(self):
        hit = _trace(_simple_scene(), (0, 0, 0), (0, 0, 1))
        assert np.isclose(float(hit.dist), 5.0, atol=1e-5)
        # double-sided: normal faces the ray origin
        assert float(hit.normal.z) < 0
        assert not bool(hit.from_inside)

    def test_quad_miss_outside(self):
        hit = _trace(_simple_scene(), (0, 0, 0), (0, 3, 1))  # exits above quad
        # passes over the quad and misses the sphere
        assert float(hit.dist) >= SUPER_FAR

    def test_quad_backside_hit(self):
        hit = _trace(_simple_scene(), (0, 0, 7), (0, 0, -1))
        assert np.isclose(float(hit.dist), 2.0, atol=1e-5)
        assert float(hit.normal.z) > 0  # flipped toward the ray

    def test_quad_diagonal_both_triangles(self):
        s = _simple_scene()
        for target in [(-0.9, -0.9), (0.9, 0.9), (-0.9, 0.9), (0.9, -0.9)]:
            hit = _trace(s, (target[0], target[1], 0), (0, 0, 1))
            assert float(hit.dist) < SUPER_FAR, target

    def test_sphere_outside_hit(self):
        s = _simple_scene()
        hit = _trace(s, (0, 5, 10), (0, -1, 0))  # straight down at the sphere
        assert np.isclose(float(hit.dist), 4.0, atol=1e-5)
        assert not bool(hit.from_inside)
        assert np.isclose(float(hit.normal.y), 1.0, atol=1e-5)

    def test_sphere_inside_hit(self):
        s = _simple_scene()
        hit = _trace(s, (0, 0, 10), (0, 1, 0))  # from the center
        assert np.isclose(float(hit.dist), 1.0, atol=1e-5)
        assert bool(hit.from_inside)
        assert np.isclose(float(hit.normal.y), -1.0, atol=1e-5)  # flipped inward

    def test_sphere_behind_misses(self):
        s = _simple_scene()
        hit = _trace(s, (0, 5, 10), (0, 1, 0))  # pointing away
        assert float(hit.dist) >= SUPER_FAR

    def test_nearest_wins(self):
        # ray through both quad (z=5) and sphere (z=10): quad wins
        hit = _trace(_simple_scene(), (0, 0, 0), (0, 0, 1))
        assert np.isclose(float(hit.dist), 5.0, atol=1e-5)
        # starting past the quad: sphere wins
        hit = _trace(_simple_scene(), (0, 0, 6), (0, 0, 1))
        assert np.isclose(float(hit.dist), 3.0, atol=1e-5)

    def test_min_hit_time_epsilon(self):
        # origin exactly on the quad: dist 0 < c_minimumRayHitTime -> miss it
        hit = _trace(_simple_scene(), (0, 0, 5), (0, 0, 1))
        assert np.isclose(float(hit.dist), 4.0, atol=1e-4)  # hits sphere instead

    def test_material_index(self):
        b = SceneBuilder()
        m0 = b.add_material(Material(albedo=(1, 0, 0)))
        m1 = b.add_material(Material(albedo=(0, 1, 0)))
        b.add_quad((-1, -1, 5), (1, -1, 5), (1, 1, 5), (-1, 1, 5), m0)
        b.add_sphere((0, 0, 10), 1.0, m1)
        s = b.build()
        assert int(_trace(s, (0, 0, 0), (0, 0, 1)).material_index) == 0
        assert int(_trace(s, (0, 0, 6), (0, 0, 1)).material_index) == 1


class TestCameraRay:
    def test_center_pixel_axis(self):
        from cpuperformanceraytracer_tpu.scene.camera import make_camera

        cam = make_camera(position=(0, 0, 40), fov_degrees=90, forward_z=-1.0)
        rng = WangRng.from_pixel(0, 0, 0)
        # center of a 100x100 image: fragCoord (50,50) -> NDC 0 at +0.5 pixel
        origin, d, rng = camera_ray(cam, jnp.float32(50.0), jnp.float32(50.0),
                                    100, 100, rng, jitter=False)
        assert float(origin.z) == 40.0
        assert float(d.z) < -0.99
        # edges map to +-45 degrees for 90-degree FOV (square image)
        origin, d, _ = camera_ray(cam, jnp.float32(100.0), jnp.float32(50.0),
                                  100, 100, rng, jitter=False)
        assert np.isclose(abs(float(d.x) / float(d.z)), 1.0, atol=1e-5)


class TestRenderInvariants:
    def _cfg(self, **kw):
        base = dict(width=32, height=24, spp=1, bounces=2, scene="cornell_box",
                    env_mode="none", ambient=(0.1, 0.1, 0.1), env_flip_xz=False,
                    jitter=False, roulette="off", num_frames=1, warmup_frames=0)
        base.update(kw)
        return RenderConfig(**base)

    def test_render_deterministic(self):
        scene, cam = cornell_box_scene()
        cfg = self._cfg()
        a = render_frame(scene, cam, None, cfg, 3)
        b = render_frame(scene, cam, None, cfg, 3)
        assert np.array_equal(np.asarray(a.x), np.asarray(b.x))

    def test_render_finite_nonnegative(self):
        scene, cam = cornell_box_scene()
        c = render_frame(scene, cam, None, self._cfg(), 0)
        for plane in (c.x, c.y, c.z):
            p = np.asarray(plane)
            assert np.isfinite(p).all() and (p >= 0).all()

    def test_frames_differ(self):
        scene, cam = cornell_box_scene()
        cfg = self._cfg()
        a = render_frame(scene, cam, None, cfg, 0)
        b = render_frame(scene, cam, None, cfg, 1)
        assert not np.allclose(np.asarray(a.x), np.asarray(b.x))

    def test_empty_scene_is_ambient(self):
        scene = SceneBuilder().build()
        from cpuperformanceraytracer_tpu.scene.camera import make_camera

        cam = make_camera()
        cfg = self._cfg(ambient=(0.25, 0.5, 0.75))
        c = render_frame(scene, cam, None, cfg, 0)
        assert np.allclose(np.asarray(c.x), 0.25, atol=1e-6)
        assert np.allclose(np.asarray(c.y), 0.5, atol=1e-6)
        assert np.allclose(np.asarray(c.z), 0.75, atol=1e-6)

    @pytest.mark.parametrize("roulette", ["off", "terminate", "v4_quirk"])
    @pytest.mark.parametrize("sampler", ["normalized3", "zangle"])
    def test_config_matrix_glass(self, roulette, sampler):
        scene, cam = glass_spheres_scene()
        cfg = self._cfg(scene="glass_spheres", roulette=roulette,
                        unit_vector_sampler=sampler, bounces=4, jitter=True)
        c = render_frame(scene, cam, None, cfg, 0)
        p = np.asarray(c.x)
        assert np.isfinite(p).all() and (p >= 0).all()
        assert p.mean() > 1e-3  # scene is lit

    @pytest.mark.parametrize("env_sampling", ["stochastic", "bilinear", "nearest"])
    def test_env_modes(self, env_sampling):
        scene, cam = glass_spheres_scene()
        tex = texture_from_array(gradient_sky(32, 16))
        for env_mode in ("equirect", "cubemap"):
            # cubemap texture must be W x 6H-stacked; reuse sky tiled 6x
            t = tex
            if env_mode == "cubemap":
                sky = gradient_sky(16, 16)
                t = texture_from_array(np.concatenate([sky] * 6, axis=0))
            cfg = self._cfg(scene="glass_spheres", env_mode=env_mode,
                            env_sampling=env_sampling, bounces=3, jitter=True)
            c = render_frame(scene, cam, t, cfg, 0)
            p = np.asarray(c.x)
            assert np.isfinite(p).all(), (env_mode, env_sampling)

    def test_counter_rng_mode(self):
        scene, cam = cornell_box_scene()
        cfg = self._cfg(rng="counter", spp=2)
        c = render_frame(scene, cam, None, cfg, 0)
        assert np.isfinite(np.asarray(c.x)).all()

    def test_spp_reduces_variance(self):
        scene, cam = cornell_box_scene()
        lo = render_frame(scene, cam, None, self._cfg(spp=1, jitter=True), 0)
        hi = render_frame(scene, cam, None, self._cfg(spp=8, jitter=True), 0)
        # proxy for variance: total variation between neighboring pixels
        def tv(c):
            p = np.asarray(c.x)
            return np.abs(np.diff(p, axis=0)).mean()
        assert tv(hi) < tv(lo)


class TestAccumulation:
    def test_running_mean_exact(self):
        cfg = RenderConfig(width=4, height=4)
        acc = zero_accum(cfg)
        vals = [3.0, 5.0, 10.0]
        for i, v in enumerate(vals):
            frame = Vec3(*(jnp.full((4, 4), v, jnp.float32) for _ in range(3)))
            acc = accumulate_frame(acc, frame, i)
        assert np.allclose(np.asarray(acc.x), np.mean(vals), rtol=1e-6)

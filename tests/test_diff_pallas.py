"""Backward Pallas megakernel tests (interpret mode on CPU).

Strategy mirrors the forward parity tests: decision-STABLE configs
(diffuse materials, roulette off) must match jax.grad of the oracle
integrator to float tolerance — the two paths share the gradient policy
(detached estimator weights) by construction. Finite differences
spot-check the absolute correctness of a few parameters. The glass
scene checks finiteness + aggregate agreement only (a 1-ulp lottery
flip legitimately diverges individual path gradients).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpuperformanceraytracer_tpu.config import RenderConfig
from cpuperformanceraytracer_tpu.diff.grad import image_loss, render_for_params
from cpuperformanceraytracer_tpu.diff.segsum import segment_sum_sorted
from cpuperformanceraytracer_tpu.scene.builder import SceneBuilder
from cpuperformanceraytracer_tpu.scene.camera import make_camera
from cpuperformanceraytracer_tpu.scene.presets import (
    cornell_box_scene,
    glass_spheres_scene,
)
from cpuperformanceraytracer_tpu.scene.types import Material
from cpuperformanceraytracer_tpu.texture.procedural import gradient_sky
from cpuperformanceraytracer_tpu.texture.texture import texture_from_array


def _cfg(**kw):
    base = dict(width=128, height=16, spp=1, bounces=2,
                scene="diffuse_sky", env_mode="equirect",
                env_sampling="stochastic", env_flip_xz=True,
                jitter=True, roulette="off", rng="counter",
                backend="pallas", tile_height=8, tile_width=128,
                bake_scene=False)
    base.update(kw)
    return RenderConfig(**base)


def _diffuse_sky_scene():
    """Open diffuse scene: floor + two matte spheres under the sky —
    most paths escape to the env map, so env-texel gradients are dense
    and every decision (no lottery, no roulette) is stable."""
    b = SceneBuilder(translation=(0.0, 0.0, 10.0))
    grey = b.add_material(Material(albedo=(0.6, 0.55, 0.5)))
    rust = b.add_material(Material(albedo=(0.7, 0.3, 0.2)))
    blue = b.add_material(Material(albedo=(0.2, 0.3, 0.7)))
    b.add_quad((-25.0, -12.45, 15.0), (25.0, -12.45, 15.0),
               (25.0, -12.45, -15.0), (-25.0, -12.45, -15.0), grey)
    b.add_sphere((-6.0, -9.5, 0.0), 3.0, rust)
    b.add_sphere((6.0, -9.5, 0.0), 3.0, blue)
    cam = make_camera(position=(0.0, 0.0, 40.0), fov_degrees=90.0,
                      forward_z=-1.0)
    return b.build(), cam


def _params(scene, tex=None):
    albedo = jnp.stack([scene.materials.albedo.x, scene.materials.albedo.y,
                        scene.materials.albedo.z], -1)
    centers = jnp.stack([scene.spheres.center.x, scene.spheres.center.y,
                         scene.spheres.center.z], -1)
    p = {"albedo": albedo, "sphere_centers": centers}
    if tex is not None:
        p["env_rgb"] = jnp.stack([tex.r, tex.g, tex.b], -1)
    return p


def _grads(cfg, scene, cam, tex, params, target):
    def loss(p):
        img = render_for_params(p, scene, cam, tex, cfg, frame=1)
        return image_loss(img, target)

    return jax.value_and_grad(loss)(params)


class TestSegmentSum:
    def test_matches_scatter_add(self):
        rng = np.random.RandomState(0)
        idx = jnp.asarray(rng.randint(0, 50, size=4096), jnp.int32)
        vals = [jnp.asarray(rng.randn(4096), jnp.float32) for _ in range(3)]
        got = segment_sum_sorted(idx, vals, 50)
        for g, v in zip(got, vals):
            want = jnp.zeros((50,), jnp.float32).at[idx].add(v)
            np.testing.assert_allclose(np.asarray(g), np.asarray(want),
                                       rtol=1e-5, atol=1e-5)

    def test_empty_segments(self):
        idx = jnp.asarray([3, 3, 7], jnp.int32)
        (got,) = segment_sum_sorted(idx, [jnp.asarray([1., 2., 4.])], 10)
        want = np.zeros(10, np.float32)
        want[3], want[7] = 3.0, 4.0
        np.testing.assert_allclose(np.asarray(got), want)

    def test_frame_scale_rounding_error(self):
        """Production size (720p pixels -> 512x256 texels): the f32
        prefix sum's running total can dwarf individual segment sums, so
        bound the cancellation error against an exact f64 scatter-add —
        mixed-sign (the real gradient regime: loss residuals of both
        signs) and the adversarial all-positive case."""
        P, T = 1280 * 720, 512 * 256
        rng = np.random.RandomState(7)
        idx = jnp.asarray(rng.randint(0, T, size=P), jnp.int32)
        mixed = rng.randn(P).astype(np.float32)
        # boundary-difference error is intrinsically ~ulp(running total):
        # measured 3e-6 relative for mixed signs (the real gradient
        # regime — loss residuals cancel) and 2.7e-3 for the adversarial
        # all-positive case (documented bound; far below SGD noise)
        for name, v, rel_bound in (("mixed", mixed, 1e-4),
                                   ("positive", np.abs(mixed), 1e-2)):
            (got,) = segment_sum_sorted(idx, [jnp.asarray(v)], T)
            want = np.zeros(T, np.float64)
            np.add.at(want, np.asarray(idx), v.astype(np.float64))
            err = np.abs(np.asarray(got, np.float64) - want)
            # error scale = a few ulp of the worst-case running total
            scale = np.abs(v.astype(np.float64)).sum() * 2 ** -23
            assert err.max() <= 4 * scale, (name, err.max(), scale)
            rel = np.linalg.norm(err) / max(np.linalg.norm(want), 1e-9)
            assert rel < rel_bound, (name, rel)


class TestPallasGradParity:
    def test_forward_value_matches_pallas_kernel(self):
        """The custom_vjp forward IS the megakernel + env combine: values
        must equal render_frame_pallas exactly."""
        from cpuperformanceraytracer_tpu.kernels.backward import (
            render_frame_pallas_diff,
        )
        from cpuperformanceraytracer_tpu.kernels.megakernel import (
            render_frame_pallas,
        )

        scene, cam = _diffuse_sky_scene()
        tex = texture_from_array(gradient_sky(64, 32))
        cfg = _cfg(spp=2)
        a = render_frame_pallas(scene, cam, tex, cfg.replace(bake_scene=False), 1)
        b = render_frame_pallas_diff(scene, cam, tex, cfg, 1)
        for ca, cb in zip(a, b):
            np.testing.assert_allclose(np.asarray(cb), np.asarray(ca),
                                       rtol=1e-6, atol=1e-7)

    def test_grad_parity_diffuse_env(self):
        """Decision-stable diffuse scene + env: pallas adjoint grads must
        match jax.grad of the oracle for every parameter family."""
        scene, cam = _diffuse_sky_scene()
        tex = texture_from_array(gradient_sky(64, 32))
        cfg = _cfg()
        params = _params(scene, tex)
        target = render_for_params(
            {}, scene, cam, tex, cfg.replace(backend="xla"), 0)

        lx, gx = _grads(cfg.replace(backend="xla"), scene, cam, tex,
                        params, target)
        lp, gp = _grads(cfg, scene, cam, tex, params, target)

        np.testing.assert_allclose(float(lp), float(lx), rtol=1e-4)
        for key in params:
            a, b = np.asarray(gx[key]), np.asarray(gp[key])
            assert np.isfinite(b).all(), key
            scale = max(np.abs(a).max(), 1e-6)
            np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-3 * scale,
                                       err_msg=key)

    def test_grad_parity_cornell_no_env(self):
        """env_mode none: ambient adds in-kernel; geometry + albedo grads
        must match the oracle."""
        scene, cam = cornell_box_scene()
        cfg = _cfg(scene="cornell_box", env_mode="none",
                   ambient=(0.1, 0.1, 0.1), env_flip_xz=False, bounces=2)
        params = _params(scene)
        target = render_for_params(
            {}, scene, cam, None, cfg.replace(backend="xla"), 0)

        lx, gx = _grads(cfg.replace(backend="xla"), scene, cam, None,
                        params, target)
        lp, gp = _grads(cfg, scene, cam, None, params, target)

        np.testing.assert_allclose(float(lp), float(lx), rtol=1e-4)
        for key in params:
            a, b = np.asarray(gx[key]), np.asarray(gp[key])
            assert np.isfinite(b).all(), key
            scale = max(np.abs(a).max(), 1e-6)
            np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-3 * scale,
                                       err_msg=key)

    def test_finite_difference_albedo_and_env(self):
        """Absolute correctness spot-check: central finite differences on
        a material albedo channel and one env texel (both enter the
        estimator smoothly — no decision boundaries)."""
        scene, cam = _diffuse_sky_scene()
        tex = texture_from_array(gradient_sky(32, 16))
        cfg = _cfg()
        params = _params(scene, tex)
        target = render_for_params(
            {}, scene, cam, tex, cfg.replace(backend="xla"), 0)

        def loss(p):
            img = render_for_params(p, scene, cam, tex, cfg, frame=1)
            return image_loss(img, target)

        _, grads = jax.value_and_grad(loss)(params)

        eps = 1e-2
        for key, index in (("albedo", (1, 0)), ("env_rgb", (100, 1))):
            up = {**params, key: params[key].at[index].add(eps)}
            dn = {**params, key: params[key].at[index].add(-eps)}
            fd = (float(loss(up)) - float(loss(dn))) / (2 * eps)
            an = float(grads[key][index])
            assert abs(fd - an) < 2e-3 + 0.05 * abs(fd), (key, fd, an)

    def test_glass_env_grads_finite_and_close(self):
        """Glass scene (full lottery + Fresnel + Beer + roulette):
        gradients must be finite; aggregate magnitudes must agree with
        the oracle (individual entries may diverge on lottery flips)."""
        scene, cam = glass_spheres_scene()
        tex = texture_from_array(gradient_sky(64, 32))
        # bounces=2: the full lottery/Fresnel/Beer/roulette pipeline is
        # already exercised per segment; extra segments only slow the
        # CPU-interpret trace
        cfg = _cfg(scene="glass_spheres", bounces=2, roulette="v4_quirk")
        params = _params(scene, tex)
        target = render_for_params(
            {}, scene, cam, tex, cfg.replace(backend="xla"), 0)

        lx, gx = _grads(cfg.replace(backend="xla"), scene, cam, tex,
                        params, target)
        lp, gp = _grads(cfg, scene, cam, tex, params, target)

        np.testing.assert_allclose(float(lp), float(lx), rtol=1e-3)
        for key in params:
            b = np.asarray(gp[key])
            assert np.isfinite(b).all(), key
            a = np.asarray(gx[key])
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            assert abs(na - nb) <= 0.05 * max(na, 1e-6) + 1e-6, (
                key, na, nb)

    def test_sharded_diff_grads_match_unsharded(self, devices8):
        """The multi-chip training path: px-row + spp sharded forward
        with the adjoint megakernel per shard; parameter grads
        all-reduce through the shard_map transpose and must equal the
        unsharded gradients."""
        from jax.sharding import Mesh

        from cpuperformanceraytracer_tpu.parallel.shard import (
            sharded_render_frame_diff,
        )

        scene, cam = _diffuse_sky_scene()
        tex = texture_from_array(gradient_sky(32, 16))
        cfg = _cfg(height=64, spp=2)
        mesh = Mesh(np.asarray(devices8).reshape(4, 2), ("px", "spp"))
        params = _params(scene, tex)
        target = render_for_params(
            {}, scene, cam, tex, cfg.replace(backend="xla"), 0)

        from cpuperformanceraytracer_tpu.diff.grad import apply_params

        def loss_sharded(p):
            s, t = apply_params(scene, tex, p)
            img = sharded_render_frame_diff(s, cam, t, cfg, 1, mesh)
            return image_loss(img, target)

        lu, gu = _grads(cfg, scene, cam, tex, params, target)  # unsharded
        ls, gs = jax.value_and_grad(loss_sharded)(params)

        np.testing.assert_allclose(float(ls), float(lu), rtol=1e-5)
        for key in params:
            a, b = np.asarray(gu[key]), np.asarray(gs[key])
            scale = max(np.abs(a).max(), 1e-6)
            np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5 * scale,
                                       err_msg=key)

    def test_quad_and_radius_grads_match_oracle(self):
        """The less-common trained families (quad vertices, sphere
        radii) exercise their own cells in the adjoint kernel's
        partial-theta spec — wiring bugs there would show as wildly
        different or non-finite gradients vs the oracle. Glass scene:
        radii and vertices enter smoothly through hit distances, Beer
        absorption, and Fresnel."""
        scene, cam = glass_spheres_scene()
        tex = texture_from_array(gradient_sky(32, 16))
        cfg = _cfg(scene="glass_spheres", bounces=2, roulette="v4_quirk")
        v0 = jnp.stack([scene.quads.v0.x, scene.quads.v0.y,
                        scene.quads.v0.z], -1)
        params = {"quad_v0": v0, "sphere_radii": scene.spheres.radius}
        target = render_for_params(
            {}, scene, cam, tex, cfg.replace(backend="xla"), 0)

        lx, gx = _grads(cfg.replace(backend="xla"), scene, cam, tex,
                        params, target)
        lp, gp = _grads(cfg, scene, cam, tex, params, target)

        np.testing.assert_allclose(float(lp), float(lx), rtol=1e-3)
        for key in params:
            b = np.asarray(gp[key])
            assert np.isfinite(b).all(), key
            a = np.asarray(gx[key])
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            assert abs(na - nb) <= 0.05 * max(na, 1e-6) + 1e-6, (
                key, na, nb)

    def test_camera_grads_match_oracle(self):
        """Camera gradients flow through the adjoint kernel's dedicated
        camera vjp (cam cols 0..4) — previously untested. Glass scene at
        FULL bounce depth: the only smooth camera dependence under the
        estimator's detachment policy (stochastic env taps and lottery
        weights are detached) is Beer absorption's path-length term, and
        refracted paths only reach the sky — and hence contribute — from
        ~4 bounces up (at bounces=2 the camera gradient is genuinely
        zero a.e., verified while writing this test)."""
        from cpuperformanceraytracer_tpu.core.vecmath import Vec3

        scene, cam = glass_spheres_scene()
        tex = texture_from_array(gradient_sky(32, 16))
        cfg = _cfg(scene="glass_spheres", bounces=8, roulette="v4_quirk")
        target = render_for_params(
            {}, scene, cam, tex, cfg.replace(backend="xla"), 0)

        def loss_for(cvec, c):
            cam2 = cam._replace(
                position=Vec3(cvec[0], cvec[1], cvec[2]),
                distance=cvec[3])
            img = render_for_params({}, scene, cam2, tex, c, 1)
            return image_loss(img, target)

        c0 = jnp.array([cam.position.x, cam.position.y, cam.position.z,
                        cam.distance], jnp.float32)
        gx = jax.grad(loss_for)(c0, cfg.replace(backend="xla"))
        gp = jax.grad(loss_for)(c0, cfg)
        a, b = np.asarray(gx), np.asarray(gp)
        assert np.isfinite(b).all()
        assert np.abs(a).sum() > 1e-6  # the scene makes them nonzero
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        assert abs(na - nb) <= 0.05 * max(na, 1e-6) + 1e-6, (na, nb)

    def test_partial_baking_albedo_only(self):
        """Only the traced families stay in the kernel (round 5):
        with params = {albedo}, every other cell is a compile-time
        constant and the env segment-sum is skipped — gradients must
        still match the oracle exactly for the trained key, and the
        jitted forward value must match the fully-traced kernel."""
        from cpuperformanceraytracer_tpu.kernels.backward import (
            render_frame_pallas_diff,
        )
        from cpuperformanceraytracer_tpu.kernels.megakernel import (
            render_frame_pallas,
        )

        scene, cam = _diffuse_sky_scene()
        tex = texture_from_array(gradient_sky(32, 16))
        cfg = _cfg()
        albedo = jnp.stack([scene.materials.albedo.x,
                            scene.materials.albedo.y,
                            scene.materials.albedo.z], -1)
        params = {"albedo": albedo}
        target = render_for_params(
            {}, scene, cam, tex, cfg.replace(backend="xla"), 0)

        def loss(p, c):
            return image_loss(
                render_for_params(p, scene, cam, tex, c, 1), target)

        lx, gx = jax.value_and_grad(loss)(params, cfg.replace(backend="xla"))
        # jit so params really are tracers (partial baking engages)
        lp, gp = jax.jit(jax.value_and_grad(
            lambda p: loss(p, cfg)))(params)
        np.testing.assert_allclose(float(lp), float(lx), rtol=1e-4)
        a, b = np.asarray(gx["albedo"]), np.asarray(gp["albedo"])
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-3 * scale)

        # forward VALUE: partially-baked == fully-traced kernel
        want = render_frame_pallas(scene, cam, tex,
                                   cfg.replace(bake_scene=False), 1)

        @jax.jit
        def fwd(p):
            from cpuperformanceraytracer_tpu.diff.grad import apply_params

            s, t = apply_params(scene, tex, p)
            return render_frame_pallas_diff(s, cam, t, cfg, 1)

        got = fwd(params)
        for cw, cg in zip(want, got):
            np.testing.assert_allclose(np.asarray(cg), np.asarray(cw),
                                       rtol=1e-5, atol=1e-6)

    def test_derive_trained(self):
        """derive_trained maps traced leaves to the right families."""
        from cpuperformanceraytracer_tpu.diff.grad import apply_params
        from cpuperformanceraytracer_tpu.kernels.backward import (
            derive_trained,
        )

        scene, cam = _diffuse_sky_scene()
        tex = texture_from_array(gradient_sky(16, 8))
        centers = jnp.stack([scene.spheres.center.x, scene.spheres.center.y,
                             scene.spheres.center.z], -1)
        env = jnp.stack([tex.r, tex.g, tex.b], -1)

        got = {}

        def probe(p):
            s, t = apply_params(scene, tex, p)
            got["trained"] = derive_trained(s, cam, t)
            leaves = [x.sum() for x in jax.tree.leaves(p)]
            return sum(leaves)

        jax.grad(probe)({"sphere_centers": centers, "env_rgb": env})
        assert got["trained"] == frozenset({"sphere_centers", "env_rgb"})

        jax.grad(probe)({"albedo": jnp.zeros((3, 3))
                         + jnp.stack([scene.materials.albedo.x,
                                      scene.materials.albedo.y,
                                      scene.materials.albedo.z], -1)})
        assert got["trained"] == frozenset({"albedo"})

    def test_bwd_height_vmem_downgrade(self):
        """The scoped-vmem fitter picks the tallest block that fits the
        measured 16 MB Mosaic stack limit (round 5) and errors with a
        sized message only when nothing fits."""
        from cpuperformanceraytracer_tpu.kernels.backward import (
            _BWD_VMEM_BUDGET_BYTES,
            _bwd_stack_bytes,
            _fit_bwd_height,
        )

        # headline-like: 9 segments, ~46 trained planes -> 24 fits
        assert _fit_bwd_height(24, 128, 720, 9, 46) == 24
        # many segments: 24 no longer fits, 16 does
        segs = 9
        while _bwd_stack_bytes(segs, 24, 128, 46) <= _BWD_VMEM_BUDGET_BYTES:
            segs += 8
        assert _fit_bwd_height(24, 128, 720, segs, 46) < 24
        # nothing fits -> sized error naming the limit
        with pytest.raises(ValueError, match="Mosaic stack limit"):
            _fit_bwd_height(8, 128, 720, 600, 500)

    def test_wang_rng_rejected(self):
        from cpuperformanceraytracer_tpu.kernels.backward import (
            render_frame_pallas_diff,
        )

        scene, cam = _diffuse_sky_scene()
        tex = texture_from_array(gradient_sky(16, 8))
        with pytest.raises(ValueError, match="counter"):
            render_frame_pallas_diff(scene, cam, tex, _cfg(rng="wang"), 0)


class TestBenchGradProtocol:
    def test_fwd_bwd_benchmark_tiny(self):
        """The driver-metric protocol (diff/benchgrad.py, used by
        bench.py and `cli bench-grad`) runs end-to-end at toy scale:
        finite grads over the full param surface, sane timing fields."""
        from cpuperformanceraytracer_tpu.diff.benchgrad import (
            fwd_bwd_benchmark,
        )

        scene, cam = _diffuse_sky_scene()
        tex = texture_from_array(gradient_sky(16, 8))
        cfg = _cfg(bounces=1)
        r = fwd_bwd_benchmark(cfg, scene, cam, tex, steps=2,
                              steps_per_dispatch=2, warmup_calls=1,
                              spans=1)
        assert r["grads_finite"]
        assert r["ms_per_step"] > 0 and r["Mrays_per_s"] > 0
        assert r["steps_per_dispatch"] == 2
        assert r["param_leaves"] == ["albedo", "env_rgb",
                                     "sphere_centers"]
        assert len(r["span_ms"]) == 1 and r["spread"] == 0.0

"""Differentiability tests: finite-difference gradient checks on smooth
parameters, NaN-freedom through every material path, inverse-render
convergence (BASELINE.json config 4 in miniature)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpuperformanceraytracer_tpu.config import RenderConfig
from cpuperformanceraytracer_tpu.diff.grad import (
    apply_params,
    image_loss,
    loss_and_grad,
    render_for_params,
)
from cpuperformanceraytracer_tpu.diff.inverse import (
    InverseProblem,
    adam_inverse_render,
)
from cpuperformanceraytracer_tpu.scene.presets import (
    cornell_box_scene,
    glass_spheres_scene,
)
from cpuperformanceraytracer_tpu.texture.procedural import gradient_sky
from cpuperformanceraytracer_tpu.texture.texture import texture_from_array


def _cfg(**kw):
    base = dict(width=32, height=24, spp=2, bounces=2, scene="cornell_box",
                env_mode="none", ambient=(0.1, 0.1, 0.1), env_flip_xz=False,
                jitter=True, roulette="off", rng="counter")
    base.update(kw)
    return RenderConfig(**base)


def _stack3(v):
    return jnp.stack([v.x, v.y, v.z], axis=-1)


class TestGradients:
    def test_albedo_grad_matches_fd(self):
        """Albedo gradients are smooth (multiplicative throughput): exact
        AD must match central finite differences closely."""
        scene, cam = cornell_box_scene()
        cfg = _cfg()
        albedo0 = _stack3(scene.materials.albedo)
        target = render_for_params({}, scene, cam, None, cfg, 0)

        def loss(albedo):
            img = render_for_params({"albedo": albedo}, scene, cam, None, cfg, 0)
            return image_loss(img, target)

        # perturbed start so the gradient is nonzero
        a = albedo0 + 0.1
        g = jax.grad(loss)(a)
        eps = 1e-3
        for idx in [(0, 0), (1, 1), (4, 2)]:
            e = jnp.zeros_like(a).at[idx].set(eps)
            fd = (loss(a + e) - loss(a - e)) / (2 * eps)
            ad = g[idx]
            assert np.isclose(float(fd), float(ad), rtol=0.05, atol=1e-5), (
                idx, float(fd), float(ad))

    def test_emissive_grad_matches_fd(self):
        scene, cam = cornell_box_scene()
        cfg = _cfg()
        em0 = _stack3(scene.materials.emissive)
        target = render_for_params({}, scene, cam, None, cfg, 0)

        def loss(em):
            img = render_for_params({"emissive": em}, scene, cam, None, cfg, 0)
            return image_loss(img, target)

        e0 = em0 * 0.8
        g = jax.grad(loss)(e0)
        eps = 1e-2
        idx = (3, 0)  # the light material's red emissive
        step = jnp.zeros_like(e0).at[idx].set(eps)
        fd = (loss(e0 + step) - loss(e0 - step)) / (2 * eps)
        assert np.isclose(float(fd), float(g[idx]), rtol=0.05), (float(fd), float(g[idx]))

    def test_env_texel_grads_flow(self):
        scene, cam = cornell_box_scene()
        tex = texture_from_array(gradient_sky(16, 8))
        cfg = _cfg(env_mode="equirect", env_sampling="bilinear")
        target = render_for_params({}, scene, cam, tex, cfg, 0)
        env0 = jnp.stack([tex.r, tex.g, tex.b], axis=-1) * 1.2

        def loss(env):
            img = render_for_params({"env_rgb": env}, scene, cam, tex, cfg, 0)
            return image_loss(img, target)

        g = jax.grad(loss)(env0)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    def test_sphere_center_grads_zero_in_pure_diffuse(self):
        """In a pure diffuse+emissive scene radiance is piecewise-CONSTANT
        in geometry (throughput is a product of constant albedos; the
        cosine cancels against cosine-weighted sampling), so a.e. the
        geometry gradient is exactly zero — AD must agree, not NaN."""
        scene, cam = cornell_box_scene()
        cfg = _cfg()
        c0 = _stack3(scene.spheres.center)
        target = render_for_params({}, scene, cam, None, cfg, 0)
        moved = c0.at[(0, 0)].add(0.5)
        _, g = loss_and_grad({"sphere_centers": moved}, target, scene, cam,
                             None, cfg, 0)
        gc = np.asarray(g["sphere_centers"])
        assert np.isfinite(gc).all()

    def test_sphere_center_grads_nonzero_in_glass(self):
        """Glass scene: Beer absorption exp(-c*dist) and normal-dependent
        refraction into a smooth env map give real geometry gradients."""
        scene, cam = glass_spheres_scene()
        tex = texture_from_array(gradient_sky(16, 8))
        cfg = _cfg(scene="glass_spheres", env_mode="equirect",
                   env_sampling="bilinear", bounces=4)
        c0 = _stack3(scene.spheres.center)
        target = render_for_params({}, scene, cam, tex, cfg, 0)
        moved = c0.at[(3, 0)].add(0.3)
        _, g = loss_and_grad({"sphere_centers": moved}, target, scene, cam,
                             tex, cfg, 0)
        gc = np.asarray(g["sphere_centers"])
        assert np.isfinite(gc).all()
        assert np.abs(gc).sum() > 0

    def test_glass_scene_grads_all_finite(self):
        """Gradients through Fresnel/refraction/Beer/roulette paths must
        be NaN-free (the _safe_normalize / clamped-sqrt guards)."""
        scene, cam = glass_spheres_scene()
        tex = texture_from_array(gradient_sky(16, 8))
        cfg = _cfg(scene="glass_spheres", env_mode="equirect",
                   env_sampling="bilinear", bounces=4, roulette="v4_quirk")
        target = render_for_params({}, scene, cam, tex, cfg, 0)
        params = {
            "sphere_centers": _stack3(scene.spheres.center) + 0.1,
            "albedo": _stack3(scene.materials.albedo),
            "ior": scene.materials.ior + 0.05,
            "refraction_color": _stack3(scene.materials.refraction_color),
        }
        _, g = loss_and_grad(params, target, scene, cam, tex, cfg, 1)
        for k, v in g.items():
            assert np.isfinite(np.asarray(v)).all(), k

    def test_quad_vertex_grads_flow(self):
        """Quad-vertex grads need a SMOOTH light source to be nonzero: in
        a pure diffuse+emissive scene radiance is piecewise constant in
        geometry (same argument as the sphere-center test above), so the
        scene gets a bilinear env map — vertex moves change normals,
        normals change bounce directions, directions change env radiance
        smoothly."""
        scene, cam = cornell_box_scene()
        tex = texture_from_array(gradient_sky(16, 8))
        cfg = _cfg(env_mode="equirect", env_sampling="bilinear")
        target = render_for_params({}, scene, cam, tex, cfg, 0)
        v0 = _stack3(scene.quads.v0) + 0.05
        _, g = loss_and_grad({"quad_v0": v0}, target, scene, cam, tex, cfg, 0)
        gv = np.asarray(g["quad_v0"])
        assert np.isfinite(gv).all() and np.abs(gv).sum() > 0


class TestInverse:
    def test_albedo_recovery(self):
        """Miniature of BASELINE config 4: recover wall albedos from the
        target image by pixel-gradient descent. 64x48/spp4 so the three
        small spheres get enough pixels to be observable."""
        scene, cam = cornell_box_scene()
        cfg = _cfg(width=64, height=48, spp=4)
        true_albedo = _stack3(scene.materials.albedo)
        target = render_for_params({}, scene, cam, None, cfg, 0)

        # perturb only observable materials (skip the black light quad)
        init = {"albedo": jnp.clip(true_albedo + 0.2, 0, 1)}
        prob = InverseProblem(scene, cam, None, cfg, target)
        params, losses = adam_inverse_render(prob, init, steps=200,
                                             learning_rate=0.02)
        assert losses[-1] < losses[0] * 0.05, (losses[0], losses[-1])
        rec = np.asarray(params["albedo"])
        want = np.asarray(true_albedo)
        # observable materials (walls + spheres, not the light) recovered
        obs = list(range(3)) + [4, 5, 6]
        assert np.abs(rec[obs] - want[obs]).max() < 0.05

    def test_fused_dispatch_matches_per_step(self):
        """K optimizer steps fused into one dispatch (lax.scan) must
        follow the per-step host loop's trajectory."""
        scene, cam = cornell_box_scene()
        cfg = _cfg(width=32, height=24, spp=2)
        true_albedo = _stack3(scene.materials.albedo)
        target = render_for_params({}, scene, cam, None, cfg, 0)
        init = {"albedo": jnp.clip(true_albedo + 0.2, 0, 1)}
        prob = InverseProblem(scene, cam, None, cfg, target)

        p1, l1 = adam_inverse_render(prob, init, steps=10,
                                     learning_rate=0.02,
                                     steps_per_dispatch=1)
        p4, l4 = adam_inverse_render(prob, init, steps=10,
                                     learning_rate=0.02,
                                     steps_per_dispatch=4)  # 4+4+2 tail
        np.testing.assert_allclose(l4, l1, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(p4["albedo"]),
                                   np.asarray(p1["albedo"]),
                                   rtol=1e-5, atol=1e-6)

    def test_sphere_position_recovery(self):
        """Geometry recovery needs smooth geometry gradients -> glass
        scene with a smooth (bilinear) env map: refraction makes interior
        appearance geometry-dependent (diffuse spheres only move their
        silhouette, which path AD cannot see). The 0.3 offset stays inside
        the convex basin — the spheres sit 0.4 apart, so a 0.5+ offset
        couples neighboring spheres' refraction paths chaotically."""
        scene, cam = glass_spheres_scene()
        tex = texture_from_array(gradient_sky(16, 8))
        cfg = _cfg(scene="glass_spheres", env_mode="equirect",
                   env_sampling="bilinear", width=48, height=36, spp=4,
                   bounces=4)
        true_c = _stack3(scene.spheres.center)
        target = render_for_params({}, scene, cam, tex, cfg, 0)
        err0 = 0.3
        init = {"sphere_centers": true_c.at[(3, 0)].add(err0)}
        prob = InverseProblem(scene, cam, tex, cfg, target)
        params, losses = adam_inverse_render(prob, init, steps=250,
                                             learning_rate=0.01, eps=1e-2)
        err = float(jnp.abs(params["sphere_centers"] - true_c).max())
        assert err < err0 * 0.5, (err0, err, losses[-1])


class TestPathReplay:
    def test_replay_grads_match_plain(self):
        """Rematerialized (path-replay) backward must produce the SAME
        gradients as the stored-residual backward — replay determinism."""
        import jax
        from cpuperformanceraytracer_tpu.diff.path_replay import (
            render_for_params_replay,
        )

        scene, cam = cornell_box_scene()
        cfg = _cfg()
        target = render_for_params({}, scene, cam, None, cfg, 0)
        albedo = _stack3(scene.materials.albedo) + 0.1
        params = {"albedo": albedo}

        def loss_plain(p):
            img = render_for_params(p, scene, cam, None, cfg, 0)
            return image_loss(img, target)

        def loss_replay(p):
            img = render_for_params_replay(p, scene, cam, None, cfg, 0)
            return image_loss(img, target)

        g1 = jax.grad(loss_plain)(params)["albedo"]
        g2 = jax.grad(loss_replay)(params)["albedo"]
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                   rtol=1e-4, atol=1e-7)

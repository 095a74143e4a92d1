"""Pallas kernel parity tests (interpret mode on CPU).

Strategy: decision-STABLE configs (pure diffuse materials, no lottery
sensitivity) must match the oracle integrator to float tolerance
everywhere; stochastic glass configs are checked with robust statistics
(means + outlier fraction) because a 1-ulp transcendental difference can
flip a lottery roll and legitimately diverge a single path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpuperformanceraytracer_tpu.config import RenderConfig
from cpuperformanceraytracer_tpu.core.vecmath import Vec3
from cpuperformanceraytracer_tpu.kernels.env_gather import gather_texels_mxu
from cpuperformanceraytracer_tpu.kernels.megakernel import render_frame_pallas
from cpuperformanceraytracer_tpu.kernels.tonemap import postprocess_pallas
from cpuperformanceraytracer_tpu.core.color import postprocess_color
from cpuperformanceraytracer_tpu.render.frame import render_frame
from cpuperformanceraytracer_tpu.scene.presets import (
    cornell_box_scene,
    glass_spheres_scene,
)
from cpuperformanceraytracer_tpu.texture.procedural import gradient_sky
from cpuperformanceraytracer_tpu.texture.texture import texture_from_array


def _cfg(**kw):
    base = dict(width=256, height=32, spp=1, bounces=2, scene="cornell_box",
                env_mode="none", ambient=(0.1, 0.1, 0.1), env_flip_xz=False,
                jitter=False, roulette="off", rng="wang",
                tile_height=8, tile_width=128)
    base.update(kw)
    return RenderConfig(**base)


class TestMegakernelParity:
    def test_diffuse_scene_allclose(self):
        """Pure-diffuse cornell: no lottery sensitivity -> strict parity."""
        scene, cam = cornell_box_scene()
        cfg = _cfg()
        a = render_frame(scene, cam, None, cfg, 2)
        b = render_frame_pallas(scene, cam, None, cfg, 2)
        np.testing.assert_allclose(np.asarray(b.x), np.asarray(a.x),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(b.y), np.asarray(a.y),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(b.z), np.asarray(a.z),
                                   rtol=1e-4, atol=1e-5)

    def test_diffuse_with_jitter_and_spp(self):
        scene, cam = cornell_box_scene()
        cfg = _cfg(jitter=True, spp=2)
        a = render_frame(scene, cam, None, cfg, 1)
        b = render_frame_pallas(scene, cam, None, cfg, 1)
        np.testing.assert_allclose(np.asarray(b.x), np.asarray(a.x),
                                   rtol=1e-4, atol=1e-5)

    def test_counter_rng_mode(self):
        scene, cam = cornell_box_scene()
        cfg = _cfg(rng="counter", spp=2, jitter=True)
        a = render_frame(scene, cam, None, cfg, 1)
        b = render_frame_pallas(scene, cam, None, cfg, 1)
        np.testing.assert_allclose(np.asarray(b.x), np.asarray(a.x),
                                   rtol=1e-4, atol=1e-5)

    def test_glass_scene_robust(self):
        """Glass scene: lottery decisions can flip on 1-ulp differences;
        means must agree and outliers must be rare."""
        scene, cam = glass_spheres_scene()
        cfg = _cfg(scene="glass_spheres", bounces=4, jitter=True,
                   roulette="v4_quirk")
        a = render_frame(scene, cam, None, cfg, 2)
        b = render_frame_pallas(scene, cam, None, cfg, 2)
        pa, pb = np.asarray(a.x), np.asarray(b.x)
        assert abs(pa.mean() - pb.mean()) < 5e-3 * max(pa.mean(), 1e-3)
        frac_diff = np.mean(np.abs(pa - pb) > 1e-3)
        assert frac_diff < 0.01, f"{frac_diff:.4%} pixels diverged"

    def test_env_textured_robust(self):
        scene, cam = glass_spheres_scene()
        tex = texture_from_array(gradient_sky(64, 32))
        cfg = _cfg(scene="glass_spheres", bounces=3, jitter=True,
                   env_mode="equirect", env_sampling="stochastic",
                   env_flip_xz=True)
        a = render_frame(scene, cam, tex, cfg, 1)
        b = render_frame_pallas(scene, cam, tex, cfg, 1)
        pa, pb = np.asarray(a.x), np.asarray(b.x)
        assert abs(pa.mean() - pb.mean()) < 1e-2 * max(pa.mean(), 1e-3)
        assert np.mean(np.abs(pa - pb) > 1e-3) < 0.02

    def test_env_cubemap_parity(self):
        """Cubemap env through the KERNEL's deferred path vs the oracle
        (VERDICT r4 item 8: the kernel's cubemap branch had no frame-
        level parity test). Robust stats like test_env_textured_robust
        (glass lottery flips allowed)."""
        scene, cam = glass_spheres_scene()
        sky = gradient_sky(16, 16)
        # DISTINCT faces (scaled differently) so any face-order or
        # uv-mapping divergence between kernel and oracle shows up
        faces = [sky * (0.3 + 0.2 * i) for i in range(6)]
        tex = texture_from_array(np.concatenate(faces, axis=0))
        cfg = _cfg(scene="glass_spheres", bounces=3, jitter=True,
                   env_mode="cubemap", env_sampling="stochastic",
                   env_flip_xz=True)
        a = render_frame(scene, cam, tex, cfg, 1)
        b = render_frame_pallas(scene, cam, tex, cfg, 1)
        pa, pb = np.asarray(a.x), np.asarray(b.x)
        assert abs(pa.mean() - pb.mean()) < 1e-2 * max(pa.mean(), 1e-3)
        assert np.mean(np.abs(pa - pb) > 1e-3) < 0.02

    def test_spp_env_restriction(self):
        """wang streams are sequential across the sample loop and cannot
        split into per-sample dispatches."""
        scene, cam = glass_spheres_scene()
        tex = texture_from_array(gradient_sky(16, 8))
        cfg = _cfg(scene="glass_spheres", env_mode="equirect", spp=2)
        with pytest.raises(NotImplementedError):
            render_frame_pallas(scene, cam, tex, cfg, 0)

    def test_multi_spp_env_counter(self):
        """spp>1 with an env map splits into per-sample dispatches on
        addressable counter streams; robust stats vs the oracle (glass
        lottery flips allowed)."""
        scene, cam = glass_spheres_scene()
        tex = texture_from_array(gradient_sky(64, 32))
        cfg = _cfg(scene="glass_spheres", bounces=3, jitter=True,
                   env_mode="equirect", env_sampling="stochastic",
                   env_flip_xz=True, rng="counter", spp=3)
        a = render_frame(scene, cam, tex, cfg, 1)
        b = render_frame_pallas(scene, cam, tex, cfg, 1)
        pa, pb = np.asarray(a.x), np.asarray(b.x)
        assert abs(pa.mean() - pb.mean()) < 1e-2 * max(pa.mean(), 1e-3)
        assert np.mean(np.abs(pa - pb) > 1e-3) < 0.02


class TestFusedCombine:
    """kernels/combine.py: the lane-shuffle deinterleave + fused
    combine/accumulate must match the unfused pallas path bit-tightly
    (same kernel, same gather — only the combine arithmetic refactors)."""

    def _run(self, cfg, frames=3):
        from cpuperformanceraytracer_tpu.kernels.megakernel import (
            render_accumulate_pallas,
            supports_fused_combine,
        )
        from cpuperformanceraytracer_tpu.render.frame import (
            accumulate_frame,
            zero_accum,
        )

        assert supports_fused_combine(cfg)
        scene, cam = glass_spheres_scene()
        tex = texture_from_array(gradient_sky(64, 32))
        a_old = zero_accum(cfg.replace(accum_layout="planar"))
        a_new = zero_accum(cfg)
        from cpuperformanceraytracer_tpu.render.frame import accum_to_vec3

        for f in range(frames):
            color = render_frame_pallas(scene, cam, tex, cfg, f)
            a_old = accumulate_frame(a_old, color, f)
            a_new = render_accumulate_pallas(scene, cam, tex, cfg, f, a_new)
        for c_new, c_old in zip(accum_to_vec3(a_new, cfg),
                                accum_to_vec3(a_old, cfg)):
            np.testing.assert_allclose(np.asarray(c_new), np.asarray(c_old),
                                       rtol=1e-5, atol=1e-6)

    def test_fused_equals_unfused_wang_spp1(self):
        self._run(_cfg(scene="glass_spheres", bounces=3, jitter=True,
                       env_mode="equirect", env_sampling="stochastic",
                       env_flip_xz=True, backend="pallas"))

    def test_fused_equals_unfused_counter_spp3(self):
        self._run(_cfg(scene="glass_spheres", bounces=2, jitter=True,
                       env_mode="equirect", env_sampling="stochastic",
                       env_flip_xz=True, rng="counter", spp=3,
                       backend="pallas"), frames=2)

    def test_fused_flat128_spp1(self):
        """The opt-in flat128 layout (kept as a measured alternative)
        must stay output-identical to the image-layout path."""
        self._run(_cfg(scene="glass_spheres", bounces=3, jitter=True,
                       env_mode="equirect", env_sampling="stochastic",
                       env_flip_xz=True, backend="pallas",
                       accum_layout="flat128"))

    def test_flat128_odd_groups_per_row(self):
        """flat128 at width 1920 (15 groups/row — an odd divisor whose
        magic division needs the pre-shift-free path) must match the
        image-layout render exactly."""
        self._run(_cfg(width=1920, height=8, scene="glass_spheres",
                       bounces=2, jitter=True, env_mode="equirect",
                       env_sampling="stochastic", env_flip_xz=True,
                       backend="pallas", tile_height=8,
                       accum_layout="flat128"), frames=2)

    def test_packed4_env_frame_step(self):
        """Regression (round-3 advisor finding): packed4 accumulation with
        pallas+env must route around the fused step (which emits planar
        Vec3 only) and still match the planar path bit-for-bit."""
        from cpuperformanceraytracer_tpu.kernels.megakernel import (
            supports_fused_combine,
        )
        from cpuperformanceraytracer_tpu.render.frame import (
            accum_to_vec3,
            make_frame_fn,
            zero_accum,
        )

        cfg = _cfg(scene="glass_spheres", bounces=2, jitter=True,
                   env_mode="equirect", env_sampling="stochastic",
                   env_flip_xz=True, backend="pallas",
                   accum_layout="packed4")
        assert not supports_fused_combine(cfg)
        scene, cam = glass_spheres_scene()
        tex = texture_from_array(gradient_sky(64, 32))
        step_packed = make_frame_fn(cfg, scene=scene, camera=cam)
        planar = cfg.replace(accum_layout="planar")
        step_planar = make_frame_fn(planar, scene=scene, camera=cam)
        a_pack = zero_accum(cfg)
        a_plan = zero_accum(planar)
        for f in range(2):
            a_pack = step_packed(scene, cam, tex, f, a_pack)
            a_plan = step_planar(scene, cam, tex, f, a_plan)
        for c_new, c_old in zip(accum_to_vec3(a_pack, cfg),
                                accum_to_vec3(a_plan, planar)):
            np.testing.assert_allclose(np.asarray(c_new), np.asarray(c_old),
                                       rtol=1e-5, atol=1e-6)

    def test_deinterleave_exact(self):
        from cpuperformanceraytracer_tpu.kernels.combine import (
            combine_accumulate,
        )

        rs = np.random.RandomState(0)
        h, w = 16, 256
        e4 = rs.rand(h * w, 4).astype(np.float32)
        rgb = Vec3(*(jnp.asarray(rs.rand(h, w).astype(np.float32))
                     for _ in range(3)))
        thr = Vec3(*(jnp.asarray(rs.rand(h, w).astype(np.float32))
                     for _ in range(3)))
        acc = Vec3(*(jnp.asarray(rs.rand(h, w).astype(np.float32))
                     for _ in range(3)))
        out = combine_accumulate(jnp.asarray(e4), rgb, thr, acc, 0.5)
        e_img = e4.reshape(h, w, 4)
        for c, (r_, t_, a_, o_) in enumerate(zip(rgb, thr, acc, out)):
            want = np.asarray(a_) + (np.asarray(r_)
                                     + e_img[:, :, c] * np.asarray(t_)
                                     - np.asarray(a_)) * 0.5
            np.testing.assert_allclose(np.asarray(o_), want,
                                       rtol=1e-6, atol=1e-7)


class TestTonemapKernel:
    def test_matches_xla_postprocess(self):
        rs = np.random.RandomState(0)
        acc = Vec3(*(jnp.asarray(rs.rand(32, 256).astype(np.float32) * 3)
                     for _ in range(3)))
        a = postprocess_color(acc, 1.0)
        b = postprocess_pallas(acc, 1.0)
        np.testing.assert_allclose(np.asarray(b.x), np.asarray(a.x),
                                   rtol=1e-5, atol=1e-6)

    def test_fallback_on_awkward_shapes(self):
        acc = Vec3(*(jnp.ones((7, 13)) for _ in range(3)))
        b = postprocess_pallas(acc, 1.0)
        assert np.asarray(b.x).shape == (7, 13)


class TestEnvGatherKernel:
    def test_exact_vs_direct_index(self):
        tex = texture_from_array(gradient_sky(64, 32, seed=3))
        rs = np.random.RandomState(1)
        rows = jnp.asarray(rs.randint(0, tex.height, (2048,)), jnp.int32)
        cols = jnp.asarray(rs.randint(0, tex.width, (2048,)), jnp.int32)
        got = gather_texels_mxu(tex, rows, cols)
        want_r = np.asarray(tex.r)[np.asarray(rows) * tex.width + np.asarray(cols)]
        want_g = np.asarray(tex.g)[np.asarray(rows) * tex.width + np.asarray(cols)]
        np.testing.assert_allclose(np.asarray(got.x), want_r, rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got.y), want_g, rtol=2e-5, atol=1e-6)

    def test_nonmultiple_chunk_padding(self):
        tex = texture_from_array(gradient_sky(16, 8, seed=4))
        rows = jnp.asarray([0, 7, 3], jnp.int32)
        cols = jnp.asarray([0, 15, 9], jnp.int32)
        got = gather_texels_mxu(tex, rows, cols)
        want = np.asarray(tex.r)[np.asarray(rows) * 16 + np.asarray(cols)]
        np.testing.assert_allclose(np.asarray(got.x), want, rtol=2e-5, atol=1e-6)

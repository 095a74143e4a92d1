"""Per-stage timing breakdown: dispatch overhead vs kernel vs env gather.

Separates the frame cost into (a) per-dispatch overhead of the tunneled
backend (timed with a trivial jitted op), (b) the Pallas megakernel
alone, (c) the deferred env gather alone, (d) the full jitted frame
step — each chained N-deep with one device_sync join (timing.py
protocol).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cpuperformanceraytracer_tpu.config import RenderConfig
from cpuperformanceraytracer_tpu.kernels.megakernel import render_frame_pallas
from cpuperformanceraytracer_tpu.render.frame import make_frame_fn, zero_accum
from cpuperformanceraytracer_tpu.scene.presets import scene_by_name
from cpuperformanceraytracer_tpu.texture.texture import (
    load_texture,
    sample_environment_deferred,
)
from cpuperformanceraytracer_tpu.core.vecmath import Vec3
from cpuperformanceraytracer_tpu.utils.timing import device_sync

N = 64


def bench(name, step, init):
    x = step(init, 0)
    device_sync(x)
    t0 = time.perf_counter()
    for i in range(1, N + 1):
        x = step(x, i)
    device_sync(x)
    ms = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:40s} {ms:9.3f} ms/step", flush=True)
    return ms


def main():
    cfg = RenderConfig(width=1280, height=720, spp=1, bounces=8,
                       scene="glass_spheres", env_mode="equirect",
                       env_sampling="stochastic", rng="wang",
                       backend="pallas").validate()
    scene, camera = scene_by_name(cfg.scene)
    texture = load_texture("/root/reference/Textures/HDR_040_Field_Env.hdr")

    # (a) dispatch overhead: trivial op on a (H, W) plane
    @jax.jit
    def triv(x, i):
        return x + 1.0

    bench("trivial jitted op (dispatch floor)", triv,
          jnp.zeros((720, 1280), jnp.float32))

    # (a2) chain of 4 trivial ops per step
    @jax.jit
    def triv4(x, i):
        for _ in range(4):
            x = x * 1.00001 + 1.0
        return x

    bench("4 chained trivial ops", triv4, jnp.zeros((720, 1280), jnp.float32))

    # (b) megakernel alone (env add included, as in the frame step)
    @jax.jit
    def kern(accum, frame):
        c = render_frame_pallas(scene, camera, texture, cfg, frame)
        return Vec3(accum.x + c.x, accum.y + c.y, accum.z + c.z)

    bench("megakernel + env gather + add", kern, zero_accum(cfg))

    # (b2) megakernel with env=none (no gather at all)
    cfg_none = cfg.replace(env_mode="none")

    @jax.jit
    def kern_none(accum, frame):
        c = render_frame_pallas(scene, camera, texture, cfg_none, frame)
        return Vec3(accum.x + c.x, accum.y + c.y, accum.z + c.z)

    bench("megakernel only (env=none)", kern_none, zero_accum(cfg))

    # (c) env gather alone: 921600 stochastic equirect lookups
    dirs = Vec3(
        jnp.full((720, 1280), 0.3, jnp.float32),
        jnp.full((720, 1280), 0.5, jnp.float32),
        jnp.full((720, 1280), 0.8, jnp.float32),
    )

    @jax.jit
    def env_only(x, i):
        d = Vec3(dirs.x + x * 1e-12, dirs.y, dirs.z)
        e = sample_environment_deferred(texture, d, cfg,
                                        jnp.zeros((720, 1280)),
                                        jnp.zeros((720, 1280)))
        return e.x + e.y + e.z

    bench("deferred env gather alone", env_only,
          jnp.zeros((720, 1280), jnp.float32))

    # (d) full frame step as the driver runs it
    fn = make_frame_fn(cfg)

    def full(accum, frame):
        return fn(scene, camera, texture, frame, accum)

    bench("full frame step (driver path)", full, zero_accum(cfg))

    # (e) K frames fused into one dispatch via lax.fori_loop
    for k in (4, 16):
        from functools import partial

        @partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
        def multi(accum, frame0, k):
            def body(i, acc):
                c = render_frame_pallas(scene, camera, texture, cfg,
                                        frame0 + i)
                blend = 1.0 / (jnp.float32(frame0 + i) + 1.0)
                return Vec3(acc.x + (c.x - acc.x) * blend,
                            acc.y + (c.y - acc.y) * blend,
                            acc.z + (c.z - acc.z) * blend)

            return jax.lax.fori_loop(0, k, body, accum)

        x = multi(zero_accum(cfg), 0, k)
        device_sync(x)
        t0 = time.perf_counter()
        reps = max(1, N // k)
        for r in range(reps):
            x = multi(x, r * k, k)
        device_sync(x)
        ms = (time.perf_counter() - t0) / (reps * k) * 1e3
        print(f"{'fori-fused x' + str(k) + ' frames/dispatch':40s} "
              f"{ms:9.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()

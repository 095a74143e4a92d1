"""Round-3 perf sweep: exit granularity x block shape on the fused path.

Times the fused multi-frame dispatch (make_multi_frame_fn: megakernel ->
batched gather -> combine/accumulate kernel) at the headline workload.
One device_sync joins each K-frame chain (timing.py protocol).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cpuperformanceraytracer_tpu.config import RenderConfig
from cpuperformanceraytracer_tpu.render.frame import make_multi_frame_fn, zero_accum
from cpuperformanceraytracer_tpu.scene.presets import scene_by_name
from cpuperformanceraytracer_tpu.texture.texture import load_texture
from cpuperformanceraytracer_tpu.utils.timing import device_sync

K = 16


def time_cfg(name, cfg, texture, reps=4):
    cfg = cfg.validate()
    scene, camera = scene_by_name(cfg.scene)
    fn = make_multi_frame_fn(cfg, K, scene=scene, camera=camera)
    accum = fn(scene, camera, texture, 0, zero_accum(cfg))
    device_sync(accum)
    t0 = time.perf_counter()
    for i in range(reps):
        accum = fn(scene, camera, texture, (i + 1) * K, accum)
    device_sync(accum)
    ms = (time.perf_counter() - t0) / (reps * K) * 1e3
    rays = cfg.width * cfg.height * cfg.spp
    print(f"{name:40s} {ms:8.3f} ms/frame  {rays / ms / 1e3:7.1f} Mrays/s",
          flush=True)


def main():
    texture = load_texture("/root/reference/Textures/HDR_040_Field_Env.hdr")
    base = RenderConfig(width=1280, height=720, spp=1, bounces=8,
                        scene="glass_spheres", env_mode="equirect",
                        env_sampling="stochastic", rng="wang",
                        backend="pallas", tile_height=24)
    for kv in sys.argv[1:]:
        k, v = kv.split("=")
        cur = getattr(base, k)
        base = base.replace(**{k: type(cur)(v) if not isinstance(cur, bool)
                               else v in ("1", "true", "True")})

    variants = [
        ("gran1 (24,256)", base),
        ("gran2 (24,256)", base.replace(exit_granularity=2)),
        ("gran3 (24,256)", base.replace(exit_granularity=3)),
        ("gran2 (16,256)", base.replace(exit_granularity=2, tile_height=16)),
        ("gran2 (8,256)", base.replace(exit_granularity=2, tile_height=8)),
        ("gran2 (24,128)", base.replace(exit_granularity=2, tile_width=128)),
        ("gran2 (48,256)", base.replace(exit_granularity=2, tile_height=48)),
        ("gran8 (24,256)", base.replace(exit_granularity=8)),
    ]
    for name, cfg in variants:
        try:
            time_cfg(name, cfg, texture)
        except Exception as e:
            print(f"{name:40s} FAIL {str(e).splitlines()[0][:90]}", flush=True)


if __name__ == "__main__":
    main()

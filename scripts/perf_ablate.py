"""Perf ablation harness: time pallas/xla frames under varying knobs.

Timing: N frames are enqueued back-to-back (each depends on the previous
accum via donation) and ONE device_sync (4-byte fetch) at the end forces
the whole chain: block_until_ready is untrustworthy on the tunneled TPU
backend (see utils/timing.py), a data-dependent fetch is not.
"""

import os
import sys
import time

# self-bootstrap: `python scripts/x.py` puts scripts/ (not the repo root)
# on sys.path, and setting PYTHONPATH breaks this environment's TPU
# plugin registration — so insert the repo root here instead.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cpuperformanceraytracer_tpu.config import RenderConfig
from cpuperformanceraytracer_tpu.render.frame import make_frame_fn, zero_accum
from cpuperformanceraytracer_tpu.scene.presets import scene_by_name
from cpuperformanceraytracer_tpu.texture.texture import load_texture
from cpuperformanceraytracer_tpu.utils.timing import device_sync


def time_cfg(name, cfg, texture, frames=16):
    cfg = cfg.validate()
    scene, camera = scene_by_name(cfg.scene)
    fn = make_frame_fn(cfg)
    accum = zero_accum(cfg)
    tex = texture if cfg.env_mode != "none" else None
    accum = fn(scene, camera, tex, 0, accum)
    device_sync(accum)
    t0 = time.perf_counter()
    for i in range(1, frames + 1):
        accum = fn(scene, camera, tex, i, accum)
    device_sync(accum)
    ms = (time.perf_counter() - t0) / frames * 1e3
    rays = cfg.width * cfg.height * cfg.spp
    print(f"{name:44s} {ms:9.2f} ms/frame  {rays / ms / 1e3:9.1f} Mrays/s",
          flush=True)


def main():
    texture = load_texture("/root/reference/Textures/HDR_040_Field_Env.hdr")
    base = RenderConfig(width=1280, height=720, spp=1, bounces=8,
                        scene="glass_spheres", env_mode="equirect",
                        env_sampling="stochastic", rng="wang",
                        backend="pallas")

    time_cfg("pallas base (8 bounce, env, wang)", base, texture)
    time_cfg("pallas 0 bounce", base.replace(bounces=0), texture)
    time_cfg("pallas 2 bounce", base.replace(bounces=2), texture)
    time_cfg("pallas 4 bounce", base.replace(bounces=4), texture)
    time_cfg("pallas env=none", base.replace(env_mode="none"), texture)
    time_cfg("pallas counter rng", base.replace(rng="counter"), texture)
    time_cfg("pallas tile 8x128", base.replace(tile_width=128), texture)
    time_cfg("pallas tile 16x256", base.replace(tile_height=16), texture)
    time_cfg("pallas tile 32x256", base.replace(tile_height=32), texture)
    time_cfg("pallas roulette off", base.replace(roulette="off"), texture)
    time_cfg("xla base", base.replace(backend="xla"), texture)
    time_cfg("xla env=none", base.replace(backend="xla", env_mode="none"),
             texture)


if __name__ == "__main__":
    main()

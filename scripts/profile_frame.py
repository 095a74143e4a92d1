"""Profile one fused 16-frame dispatch and print the device-op breakdown."""

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cpuperformanceraytracer_tpu.config import RenderConfig
from cpuperformanceraytracer_tpu.render.frame import make_multi_frame_fn, zero_accum
from cpuperformanceraytracer_tpu.scene.presets import scene_by_name
from cpuperformanceraytracer_tpu.texture.texture import load_texture
from cpuperformanceraytracer_tpu.utils.timing import device_sync


def main():
    cfg = RenderConfig(width=1280, height=720, spp=1, bounces=8,
                       scene="glass_spheres", env_mode="equirect",
                       env_sampling="stochastic", rng="wang",
                       backend="pallas").validate()
    for kv in sys.argv[1:]:
        k, v = kv.split("=")
        cur = getattr(cfg, k)
        cfg = cfg.replace(**{k: type(cur)(v) if not isinstance(cur, bool)
                             else v in ("1", "true", "True")})
    scene, camera = scene_by_name(cfg.scene)
    texture = load_texture("/root/reference/Textures/HDR_040_Field_Env.hdr")
    fn = make_multi_frame_fn(cfg, 16)
    accum = fn(scene, camera, texture, 0, zero_accum(cfg))
    device_sync(accum)
    accum = fn(scene, camera, texture, 16, accum)
    device_sync(accum)
    accum = zero_accum(cfg)
    with jax.profiler.trace("/tmp/jaxprof_frame"):
        accum = fn(scene, camera, texture, 0, accum)
        device_sync(accum)

    path = sorted(glob.glob(
        "/tmp/jaxprof_frame/plugins/profile/*/*.trace.json.gz"))[-1]
    data = json.load(gzip.open(path))
    pids = {e["pid"]: e["args"].get("name") for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and "TPU" in str(pids.get(e["pid"], "")):
            dur[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    for n, d in dur.most_common(12):
        print(f"{d / 16e3:9.3f} ms/frame x{cnt[n]:4d}  {n[:90]}", flush=True)


if __name__ == "__main__":
    main()

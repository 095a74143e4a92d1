"""Identify every device op >0.5 ms in the fwd+bwd step (VERDICT r4
item 2: name fusion.4).

Profiles ONE value_and_grad step at the headline workload (1280x720,
8 bounces, env, counter RNG, pallas adjoint), prints the device-op
breakdown from the trace, then maps each big fusion name to its
optimized-HLO computation body so nothing stays unidentified.

Run ALONE on the TPU (concurrent TPU jobs contaminate timings).
"""

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
from cpuperformanceraytracer_tpu.diff.grad import image_loss, render_for_params
from cpuperformanceraytracer_tpu.scene.presets import glass_spheres_scene
from cpuperformanceraytracer_tpu.texture.texture import load_texture
from cpuperformanceraytracer_tpu.utils.timing import device_sync


def main():
    W, H, B = 1280, 720, 8
    cfg = RenderConfig(width=W, height=H, spp=1, bounces=B,
                       scene="glass_spheres", env_mode="equirect",
                       env_sampling="stochastic", rng="counter",
                       backend="pallas", tile_height=16, tile_width=128,
                       exit_granularity=8, bake_scene=False)
    scene, cam = glass_spheres_scene()
    tex = load_texture("/root/reference/Textures/HDR_040_Field_Env.hdr")
    albedo = jnp.stack([scene.materials.albedo.x, scene.materials.albedo.y,
                        scene.materials.albedo.z], -1)
    centers = jnp.stack([scene.spheres.center.x, scene.spheres.center.y,
                         scene.spheres.center.z], -1)
    params = {"albedo": albedo + 0.05, "sphere_centers": centers + 0.1,
              "env_rgb": jnp.stack([tex.r, tex.g, tex.b], -1)}
    target = render_for_params({}, scene, cam, tex, cfg, 0)
    target = jax.tree.map(jax.lax.stop_gradient, target)

    def loss(p, frame):
        return image_loss(render_for_params(p, scene, cam, tex, cfg, frame),
                          target)

    vg = jax.jit(jax.value_and_grad(loss))
    for w in range(6):
        l, g = vg(params, w)
        device_sync(l)
    print(f"warm ok, loss={float(l):.5f}", flush=True)

    reps = 4
    with jax.profiler.trace("/tmp/jaxprof_bwd"):
        for i in range(reps):
            l, g = vg(params, 10 + i)
        device_sync(l)
        device_sync(g)

    path = sorted(glob.glob(
        "/tmp/jaxprof_bwd/plugins/profile/*/*.trace.json.gz"))[-1]
    data = json.load(gzip.open(path))
    pids = {e["pid"]: e["args"].get("name") for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and "TPU" in str(pids.get(e["pid"], "")):
            dur[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    total = sum(dur.values()) / reps / 1e3
    print(f"\ndevice total {total:.3f} ms/step; breakdown:", flush=True)
    big = []
    for n, d in dur.most_common(24):
        ms = d / reps / 1e3
        print(f"{ms:9.3f} ms/step x{cnt[n] // reps:4d}  {n[:90]}",
              flush=True)
        if ms > 0.5:
            big.append(n)

    # ---- map big fusion names to their HLO bodies -------------------
    hlo = vg.lower(params, 0).compile().as_text()
    lines = hlo.splitlines()
    for name in big:
        base = name.split("/")[0].strip()
        if "fusion" not in base and "sort" not in base and \
                "custom-call" not in base:
            continue
        # find the op definition line: '%NAME = ... fusion(...), calls=%comp'
        defline = None
        for ln in lines:
            s = ln.strip()
            if s.startswith(f"%{base} ") or s.startswith(f"{base} "):
                defline = s
                break
        print(f"\n==== {base} ====")
        if defline is None:
            print("  (no HLO def found)")
            continue
        print("  " + defline[:400])
        # if it calls a fused computation, print that body's op mix
        import re
        m = re.search(r"calls=%?([\w.\-]+)", defline)
        if m:
            comp = m.group(1)
            in_body = False
            opmix = collections.Counter()
            for ln in lines:
                s = ln.strip()
                if s.startswith(f"%{comp} ") or s.startswith(f"{comp} "):
                    in_body = True
                    continue
                if in_body:
                    if s.startswith("}"):
                        break
                    mm = re.search(r"= \S+ ([\w\-]+)\(", s)
                    if mm:
                        opmix[mm.group(1)] += 1
            print("  op mix:", dict(opmix.most_common(14)))


if __name__ == "__main__":
    main()

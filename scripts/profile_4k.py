"""Per-stage profile of the offline_4k config (VERDICT round-3 item 3).

Measures, at 3840x2160 / 1 spp / 8 bounces / env:
  1. canary: the 720p no-env kernel (known 1.42 ms) — if inflated, the
     shared chip is contended and the session's numbers are invalid
  2. megakernel only (12 output planes, no env resolve)
  3. env gather alone on REAL 4K miss indices, at several chunk sizes
  4. chunked-gather concat vs preallocated dynamic_update_slice
  5. the full production frame step (render_accumulate_pallas)

Run ALONE on the TPU.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import cpuperformanceraytracer_tpu.texture.texture as tt
from cpuperformanceraytracer_tpu.config import BENCH_CONFIGS, RenderConfig
from cpuperformanceraytracer_tpu.core.vecmath import Vec3
from cpuperformanceraytracer_tpu.kernels.megakernel import _pallas_render
from cpuperformanceraytracer_tpu.scene.presets import glass_spheres_scene
from cpuperformanceraytracer_tpu.texture.texture import (
    env_texel_flat_index,
    load_texture,
)
from cpuperformanceraytracer_tpu.utils.timing import device_sync


def timed(name, fn, *args, n=8):
    # first executions of a fresh executable run 5-13x slow on this
    # backend: warm until steady state before timing
    for _ in range(6):
        out = fn(*args)
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    device_sync(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:52s} {ms:9.3f} ms")
    return ms


scene, cam = glass_spheres_scene()
tex = load_texture("/root/reference/Textures/HDR_040_Field_Env.hdr")

# 1. contention canary
ccfg = RenderConfig(width=1280, height=720, spp=1, bounces=8,
                    scene="glass_spheres", env_mode="none", rng="wang",
                    backend="pallas", tile_height=16, tile_width=128,
                    exit_granularity=8)
can = timed("canary 720p no-env kernel (expect ~1.5)",
            jax.jit(lambda f: _pallas_render(scene, cam, None, ccfg,
                                             f)[0].sum()), jnp.int32(3))
if can > 3.0:
    print("!! canary inflated — chip contended, numbers unreliable !!")

cfg = BENCH_CONFIGS["offline_4k"]

# 2. megakernel only
timed("4K megakernel only (12 planes out)",
      jax.jit(lambda f: _pallas_render(scene, cam, tex, cfg, f)[0].sum()),
      jnp.int32(3))

# 3. real 4K miss indices
outs = _pallas_render(scene, cam, tex, cfg, 3)
(_, _, _, mdx, mdy, mdz, mtx, mty, mtz, jr, jc, _) = outs
idx = env_texel_flat_index(tex, Vec3(mdx, mdy, mdz), cfg, jr, jc)
idx = jax.block_until_ready(idx)

for chunk in (1 << 20, 1 << 22, 1 << 33):
    tt._GATHER_CHUNK = chunk
    label = f"4K env gather, chunk={chunk >> 20}M queries"
    try:
        timed(label, jax.jit(lambda i: tt._gather(tex, i).x.sum()), idx)
    except Exception as e:  # noqa: BLE001 — OOM is a finding
        print(f"{label:52s} FAILED: {type(e).__name__}: {str(e)[:160]}")
tt._GATHER_CHUNK = 1 << 20

# 4. concat vs preallocated consume (gather + elementwise combine)
def combined_concat(i):
    e = tt._gather(tex, i)
    return (e.x * mtx + e.y * mty + e.z * mtz).sum()

timed("4K gather+combine (chunk concat, 1M)",
      jax.jit(combined_concat), idx)

def combined_dus(i):
    rows = i.shape[0]
    step = max(1, (1 << 20) // i.shape[1])
    acc = jnp.zeros(i.shape, jnp.float32)
    for r in range(0, rows, step):
        part = tt._gather(tex, i[r:r + step])
        contrib = (part.x * mtx[r:r + step] + part.y * mty[r:r + step]
                   + part.z * mtz[r:r + step])
        acc = jax.lax.dynamic_update_slice(acc, contrib, (r, 0))
    return acc.sum()

timed("4K gather+combine (dyn-update-slice, 1M)",
      jax.jit(combined_dus), idx)

# 5. full production frame step
from cpuperformanceraytracer_tpu.render.frame import make_frame_fn, zero_accum

step = make_frame_fn(cfg, scene=scene, camera=cam)
accum = zero_accum(cfg)
accum = step(scene, cam, tex, 0, accum)
device_sync(accum)
t0 = time.perf_counter()
N = 8
for f in range(1, N + 1):
    accum = step(scene, cam, tex, f, accum)
device_sync(accum)
ms = (time.perf_counter() - t0) / N * 1e3
rays = cfg.width * cfg.height * cfg.spp
print(f"{'4K full frame step (production)':52s} {ms:9.3f} ms "
      f"= {rays / ms / 1e3:.1f} Mrays/s")

"""P5 probe (VERDICT r4 item 5): can reducing env gather QUERIES beat
the measured serialization bound?

The kernel issues ONE env query per pixel per sample regardless of
whether the path ever missed (never-missed pixels rely on env*0 == 0,
megakernel deferred combine). Measures, at the headline workload
(1280x720, 8 bounces, glass_spheres, HDR env):

  1. the never-miss pixel fraction (the maximum query savings),
  2. the gather cost at full query count vs the compacted count
     (simulated by gathering a prefix of that many queries — the
     gather engine cost is per-query, so a prefix is a faithful cost
     model for any compaction of the same size),
  3. the cost of one candidate compaction itself (sort pixels by
     missed flag — the only vectorized TPU compaction primitive).

Decision rule: compaction wins only if
    saved_gather_time > compaction_cost + scatter-back cost.

Run ALONE on the TPU.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cpuperformanceraytracer_tpu.config import RenderConfig
from cpuperformanceraytracer_tpu.core.vecmath import Vec3
from cpuperformanceraytracer_tpu.kernels.megakernel import _pallas_render
from cpuperformanceraytracer_tpu.scene.presets import glass_spheres_scene
from cpuperformanceraytracer_tpu.texture.texture import (
    _gather,
    env_texel_flat_index,
    load_texture,
)
from cpuperformanceraytracer_tpu.utils.timing import device_sync

W, H, B = 1280, 720, 8
cfg = RenderConfig(width=W, height=H, spp=1, bounces=B,
                   scene="glass_spheres", env_mode="equirect",
                   env_sampling="stochastic", rng="wang",
                   backend="pallas", tile_height=16, tile_width=128,
                   exit_granularity=8).validate()
scene, cam = glass_spheres_scene()
tex = load_texture("/root/reference/Textures/HDR_040_Field_Env.hdr")


def timed(name, fn, *args, n=16):
    out = fn(*args)
    device_sync(out)
    for _ in range(5):
        out = fn(*args)
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    device_sync(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:44s} {ms:9.3f} ms", flush=True)
    return ms


# ---- 1. never-miss fraction over several frames ----------------------
@jax.jit
def miss_fraction(frame):
    outs = _pallas_render(scene, cam, tex, cfg, frame)
    missed = outs[11]
    return missed.mean()


fracs = [float(miss_fraction(f)) for f in range(4)]
never = 1.0 - float(np.mean(fracs))
print(f"missed fraction {np.mean(fracs):.4f} -> never-miss {never:.4f} "
      f"(max query savings {never * 100:.1f}%)", flush=True)

# ---- 2. gather cost vs query count ----------------------------------
outs = _pallas_render(scene, cam, tex, cfg, 0)
(r, g, b, mdx, mdy, mdz, mtx, mty, mtz, jr, jc, missed) = outs
idx_full = env_texel_flat_index(tex, Vec3(mdx, mdy, mdz), cfg, jr, jc)
idx1 = jnp.asarray(idx_full).reshape(-1)
P = idx1.shape[0]


def gather_n(n):
    n = int(n)
    sub = idx1[:n].reshape(n // 128, 128)

    @jax.jit
    def go(ix):
        e = _gather(tex, ix)
        return e.x.sum() + e.y.sum() + e.z.sum()

    return timed(f"gather {n} queries", go, sub)


t_full = gather_n(P)
keep = int(np.ceil((1.0 - never) * P / 128) * 128)
t_kept = gather_n(keep)
print(f"gather savings at compaction: {t_full - t_kept:.3f} ms", flush=True)

# ---- 3. compaction cost: sort (missed, idx, 3 planes) by missed ------
key = (missed < 0.5).astype(jnp.int32).reshape(-1)


@jax.jit
def compact(k, ix, a, bb, c):
    # bring missed pixels to the front; values ride along (the pattern
    # any real compaction would need: idx + 3 throughput planes + the
    # inverse permutation to scatter results back)
    perm = jnp.arange(P, dtype=jnp.int32)
    s = jax.lax.sort((k, ix, a.reshape(-1), bb.reshape(-1), c.reshape(-1),
                      perm), dimension=0, num_keys=1)
    return s[1][:128].sum() + s[5][:128].sum()


t_sort = timed("compaction sort (6 operands, P)", compact, key, idx1,
               mtx, mty, mtz)
print(f"\nP5 verdict: savings {t_full - t_kept:.3f} ms vs compaction "
      f"{t_sort:.3f} ms (+ scatter-back)", flush=True)

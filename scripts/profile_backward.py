"""Per-stage breakdown of the fwd+bwd step (backward Pallas megakernel).

Times, at the BASELINE workload (1280x720, 8 bounces, env, counter RNG):
  1. forward only (non-baked megakernel + env combine)
  2. env-texel segment-sum alone (sort + cumsum + boundary diff)
  3. full value_and_grad step
  4. inferred backward-kernel cost = (3) - (1) - (2) - small glue

Run ALONE on the TPU (concurrent jobs contaminate timings).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from cpuperformanceraytracer_tpu.config import RenderConfig
from cpuperformanceraytracer_tpu.diff.grad import image_loss, render_for_params
from cpuperformanceraytracer_tpu.diff.segsum import segment_sum_sorted
from cpuperformanceraytracer_tpu.scene.presets import glass_spheres_scene
from cpuperformanceraytracer_tpu.texture.texture import load_texture
from cpuperformanceraytracer_tpu.utils.timing import device_sync

W, H, B = 1280, 720, 8
cfg = RenderConfig(width=W, height=H, spp=1, bounces=B,
                   scene="glass_spheres", env_mode="equirect",
                   env_sampling="stochastic", rng="counter",
                   backend="pallas", tile_height=16, tile_width=128,
                   bake_scene=False)
scene, cam = glass_spheres_scene()
tex = load_texture("/root/reference/Textures/HDR_040_Field_Env.hdr")
albedo = jnp.stack([scene.materials.albedo.x, scene.materials.albedo.y,
                    scene.materials.albedo.z], -1)
centers = jnp.stack([scene.spheres.center.x, scene.spheres.center.y,
                     scene.spheres.center.z], -1)
params = {"albedo": albedo + 0.05, "sphere_centers": centers + 0.1,
          "env_rgb": jnp.stack([tex.r, tex.g, tex.b], -1)}

def timed(name, fn, *args, n=8):
    out = fn(*args); device_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    device_sync(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:36s} {ms:9.3f} ms")
    return ms

# 1. forward only
fwd = jax.jit(lambda p: render_for_params(p, scene, cam, tex, cfg, 1).x.sum())
timed("forward (non-baked + env combine)", fwd, params)

# 2. segment-sum alone at frame scale
P, T = W * H, tex.width * tex.height
rng = np.random.RandomState(0)
idx = jnp.asarray(rng.randint(0, T, size=P), jnp.int32)
vals = tuple(jnp.asarray(rng.randn(P), jnp.float32) for _ in range(3))
seg = jax.jit(lambda i, v: segment_sum_sorted(i, v, T)[0].sum())
timed("segment_sum_sorted (sort path)", seg, idx, vals)

# 2b. pieces of segsum
srt = jax.jit(lambda i, v: jax.lax.sort((i,) + v, dimension=0, num_keys=1)[1].sum())
timed("  sort (4 operands)", srt, idx, vals)
cs = jax.jit(lambda v: jnp.cumsum(v[0]).sum())
timed("  cumsum 1M 1-D", cs, vals)
ss = jax.jit(lambda i: jnp.searchsorted(jnp.sort(i), jnp.arange(T, dtype=jnp.int32), side="right").sum())
timed("  sort+searchsorted", ss, idx)

# 3. full step
def loss(p):
    return image_loss(render_for_params(p, scene, cam, tex, cfg, 1),
                      render_for_params(p, scene, cam, tex, cfg, 0))
# fixed target instead (precompute)
target = render_for_params(params, scene, cam, tex, cfg, 0)
target = jax.tree.map(jax.lax.stop_gradient, target)
def loss2(p):
    return image_loss(render_for_params(p, scene, cam, tex, cfg, 1), target)
vg = jax.jit(jax.value_and_grad(loss2))
timed("value_and_grad (full step)", vg, params, n=4)

# --- bench-grad-style loop (traced frame, chained carry, one sync) ----
def loss3(p, frame):
    return image_loss(render_for_params(p, scene, cam, tex, cfg, frame),
                      target)
vg2 = jax.jit(jax.value_and_grad(loss3))
l, g = vg2(params, 0)
device_sync(l)
t0 = time.perf_counter()
carry = g
STEPS = 8
for i in range(STEPS):
    l, g = vg2(params, i + 1)
    carry = jax.tree.map(lambda c, gg: c + gg, carry, g)
device_sync(l)
print(f"{'bench-grad-style loop (traced frame)':36s} "
      f"{(time.perf_counter()-t0)/STEPS*1e3:9.3f} ms")

# pullback alone (fwd linearized once, bwd applied per rep)
_, pull = jax.vjp(lambda p: render_for_params(p, scene, cam, tex, cfg, 1), params)
cotan = jax.tree.map(jnp.ones_like, render_for_params(params, scene, cam, tex, cfg, 1))
pj = jax.jit(lambda c: pull(c)[0]["env_rgb"].sum())
timed("bwd pullback alone (jit)", pj, cotan, n=8)

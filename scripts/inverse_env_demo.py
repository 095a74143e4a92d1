"""Production-rate inverse render demo (BASELINE config 4 at scale):
recover material albedos + the FULL 131k-texel env map from one
rendered target via the pallas adjoint path. Reports ms/step with the
fused-K protocol and the loss trajectory; optionally writes the
recovered-env preview (docs/inverse_env_recovered.png).

Round-4 measurement: 147 ms/step. Round 5 re-measure after partial
baking + the scatter-free segment sum.

Run ALONE on the TPU.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cpuperformanceraytracer_tpu.config import RenderConfig
from cpuperformanceraytracer_tpu.diff.grad import render_for_params
from cpuperformanceraytracer_tpu.diff.inverse import (
    InverseProblem,
    adam_inverse_render,
)
from cpuperformanceraytracer_tpu.scene.presets import glass_spheres_scene
from cpuperformanceraytracer_tpu.texture.texture import load_texture
from cpuperformanceraytracer_tpu.utils.timing import device_sync

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 200

cfg = RenderConfig(width=256, height=144, spp=2, bounces=3,
                   scene="glass_spheres", env_mode="equirect",
                   env_sampling="stochastic", rng="counter",
                   backend="pallas", tile_height=16, tile_width=128,
                   exit_granularity=8).validate()
scene, cam = glass_spheres_scene()
tex = load_texture("/root/reference/Textures/HDR_040_Field_Env.hdr")

target = render_for_params({}, scene, cam, tex, cfg, 0)
albedo = jnp.stack([scene.materials.albedo.x, scene.materials.albedo.y,
                    scene.materials.albedo.z], -1)
init = {"albedo": jnp.clip(albedo + 0.2, 0.0, 1.0),
        "env_rgb": jnp.full((tex.width * tex.height, 3), 0.5, jnp.float32)}

prob = InverseProblem(scene, cam, tex, cfg, target)
t0 = time.perf_counter()
params, losses = adam_inverse_render(prob, init, steps=STEPS,
                                     learning_rate=0.02,
                                     steps_per_dispatch=16)
wall = time.perf_counter() - t0
print(f"{STEPS} steps in {wall:.1f} s = {wall / STEPS * 1e3:.1f} ms/step "
      f"(incl. compile); loss {losses[0]:.4f} -> {losses[-1]:.5f}")

# steady-state ms/step (post-compile): one more fused chunk, timed
from cpuperformanceraytracer_tpu.diff.inverse import make_train_step_k
import optax

optimizer = optax.adam(0.02)
opt_state = optimizer.init(params)
step_k = make_train_step_k(prob, optimizer, 16)
p, s = params, opt_state
for _ in range(3):
    p, s, chunk = step_k(p, s, jnp.uint32(0))
    device_sync(chunk)
t0 = time.perf_counter()
for c in range(4):
    p, s, chunk = step_k(p, s, jnp.uint32(16 * c))
device_sync(chunk)
print(f"steady-state: {(time.perf_counter() - t0) / 64 * 1e3:.2f} ms/step")

err = float(np.abs(np.asarray(params["albedo"]) - np.asarray(albedo)).max())
print(f"albedo max err {err:.4f}; grads finite "
      f"{bool(np.isfinite(np.asarray(params['env_rgb'])).all())}")

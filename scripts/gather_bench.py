"""Race env-texture gather strategies on the TPU.

P = 1280*720 queries from an (H=256, W=512) f32 RGB texture.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 256, 512
P = 1280 * 720

key = jax.random.PRNGKey(0)
tex = jax.random.uniform(key, (H, W, 3), jnp.float32)
texf = tex.reshape(-1, 3)
rows = jax.random.randint(jax.random.PRNGKey(1), (P,), 0, H, jnp.int32)
cols = jax.random.randint(jax.random.PRNGKey(2), (P,), 0, W, jnp.int32)
flat = rows * W + cols


def sync(x):
    return float(jax.tree.leaves(x)[0].ravel()[0])


def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:40s} {ms:8.2f} ms", flush=True)
    return out


# 1. XLA flat take of 3 channel planes
@jax.jit
def xla_take(flatidx, r, g, b):
    return r[flatidx], g[flatidx], b[flatidx]


r_pl, g_pl, b_pl = texf[:, 0], texf[:, 1], texf[:, 2]
ref = timeit("xla flat take x3", xla_take, flat, r_pl, g_pl, b_pl)

# 2. XLA take of (N,3) rows (one gather, minor dim contiguous)
@jax.jit
def xla_take_rows(flatidx, t):
    return jnp.take(t, flatidx, axis=0)


out2 = timeit("xla take rows (N,3)", xla_take_rows, flat, texf)

# 3. existing MXU onehot kernel
from cpuperformanceraytracer_tpu.texture.texture import Texture
from cpuperformanceraytracer_tpu.kernels.env_gather import gather_texels_mxu

texT = Texture(r=r_pl, g=g_pl, b=b_pl, width=W, height=H)
out3 = timeit("mxu onehot (bf16x2)", lambda: gather_texels_mxu(texT, rows, cols))

# 4. pallas take_along_axis within kernel (dynamic_gather probe)
CH = 2048


def _tga_kernel(idx_ref, tab_ref, o_ref):
    idx = idx_ref[:]  # (8, CH//8) int32
    tab = tab_ref[:]  # (8, H*W//8)? -- try flat (1, N) broadcast
    # gather along lanes: take_along_axis over axis=1 with full table rows
    o_ref[:] = jnp.take_along_axis(
        jnp.broadcast_to(tab, (idx.shape[0], tab.shape[1])), idx, axis=1
    )


def pallas_tga(flatidx, plane):
    n = flatidx.shape[0]
    idx2 = flatidx.reshape(n // 256, 256)
    tab = plane.reshape(1, H * W)
    spec_i = pl.BlockSpec((8, 256), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_t = pl.BlockSpec((1, H * W), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _tga_kernel,
        grid=(n // 256 // 8,),
        in_specs=[spec_i, spec_t],
        out_specs=spec_i,
        out_shape=jax.ShapeDtypeStruct(idx2.shape, jnp.float32),
    )(idx2, tab)


try:
    out4 = timeit("pallas take_along_axis lanes",
                  jax.jit(pallas_tga), flat, r_pl)
    ok = np.allclose(np.asarray(out4).ravel(), np.asarray(ref[0]))
    print("   correct:", ok)
except Exception as e:
    print("pallas take_along_axis FAILED:", type(e).__name__, str(e)[:300])

print("mxu allclose:",
      np.allclose(np.asarray(out3.x), np.asarray(ref[0]), atol=2e-4))

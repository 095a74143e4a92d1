"""Probe: can Mosaic run the trace dot-products on the MXU profitably?

Per (8, 256) grid block, 9 emulated bounce segments each computing 54
feature dot-products (the object-major trace shape):
  A) direct VPU dots: unrolled mul/add chains
  B) dot_general(B (54,8), F (8, 8, 256)) contracting the feature axis —
     output (54, 8, 256), sliced back to (8, 256) planes for free.
Grid = a full 1280x720 frame of blocks so kernel time dominates dispatch.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpuperformanceraytracer_tpu.utils.timing import device_sync

BH, BW = 8, 256
H, W = 720, 1280
NBLK = (H // BH) * (W // BW)  # 450
NCOL = 54
NF = 8
REPEAT = 9

B = jnp.asarray(np.random.default_rng(0).standard_normal((NCOL, NF)),
                jnp.float32)


def body(planes, b):
    acc = jnp.zeros((BH, BW))
    for rep in range(REPEAT):
        if b is None:  # VPU: unrolled scalar-constant FMA chains
            Bh = np.asarray(B)
            outs = []
            for c in range(NCOL):
                s = float(Bh[c, 0]) * planes[0]
                for f in range(1, NF):
                    s = s + float(Bh[c, f]) * planes[f]
                outs.append(s)
            U0, U1, U2, rest = outs[0], outs[1], outs[2], outs[3:]
            acc = acc + U0 * U1 - U2
            for u in rest:
                acc = acc + u
        else:  # MXU: one rank-3 dot_general per segment
            F = jnp.stack(planes)  # (NF, BH, BW)
            U = jax.lax.dot_general(
                b, F, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (NCOL, BH, BW)
            acc = acc + U[0] * U[1] - U[2]
            acc = acc + jnp.sum(U[3:], axis=0)
        planes = [acc * 1e-6] + planes[1:]
    return acc


def kernel_vpu(x_ref, b_ref, o_ref):
    planes = [x_ref[i] for i in range(NF)]
    o_ref[:] = body(planes, None)


def kernel_mxu(x_ref, b_ref, o_ref):
    planes = [x_ref[i] for i in range(NF)]
    o_ref[:] = body(planes, b_ref[:])


def run(kern, x):
    f = jax.jit(partial(
        pl.pallas_call, kern,
        grid=(H // BH, W // BW),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        in_specs=[
            pl.BlockSpec((NF, BH, BW), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NCOL, NF), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BH, BW), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
    )())
    y = f(x, B)
    device_sync(y)
    for _ in range(2):
        t0 = time.perf_counter()
        z = y
        for _ in range(16):
            z = f(x + z[0, 0] * 1e-20, B)
        device_sync(z)
        dt = (time.perf_counter() - t0) / 16 * 1e3
    return y, dt


def main():
    r = np.random.default_rng(1)
    x = jnp.asarray(r.standard_normal((NF, H, W)), jnp.float32)
    try:
        ym, tm = run(kernel_mxu, x)
        print(f"mxu  dot_general: {tm:8.3f} ms/frame-equivalent")
    except Exception as e:
        print("mxu path failed:", str(e)[:400])
        ym = None
    yv, tv = run(kernel_vpu, x)
    print(f"vpu  unrolled   : {tv:8.3f} ms/frame-equivalent")
    if ym is not None:
        err = float(jnp.max(jnp.abs(ym - yv)) / (jnp.max(jnp.abs(yv)) + 1e-9))
        print(f"max rel err mxu vs vpu: {err:.3e}")


if __name__ == "__main__":
    main()

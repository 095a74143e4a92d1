"""Pallas tonemap/display-encode kernel.

Mirror of the reference's split postprocess pass (OutputToScreen /
OutputToFile, demofox_path_tracing_optimization_v4.cpp:1260-1331):
exposure -> ACES -> sRGB -> u8, fused over (BH, BW) tiles. Output is
three u32-packed-as-f32? No — three u8-planes are awkward on TPU; the
kernel emits the final f32 display values and the (cheap, bandwidth-
bound) u8 conversion happens host-side at IO time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpuperformanceraytracer_tpu.core.color import postprocess_color
from cpuperformanceraytracer_tpu.core.vecmath import Vec3


def postprocess_pallas(accum: Vec3, exposure: float = 1.0,
                       tile=(8, 256)) -> Vec3:
    """ACES+sRGB display transform as one fused Pallas kernel over the
    accumulation planes; returns f32 display-space planes in [0,1]."""
    h, w = accum.x.shape
    bh, bw = tile
    bh = min(bh, h)
    bw = min(bw, w)
    if h % bh or w % bw:
        # fall back to plain XLA for awkward shapes
        return postprocess_color(accum, exposure)

    def kernel(r_ref, g_ref, b_ref, or_ref, og_ref, ob_ref):
        v = Vec3(r_ref[:], g_ref[:], b_ref[:])
        out = postprocess_color(v, exposure)
        or_ref[:] = out.x
        og_ref[:] = out.y
        ob_ref[:] = out.z

    blk = pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                       memory_space=pltpu.VMEM)
    plane = jax.ShapeDtypeStruct((h, w), jnp.float32)
    import jax as _jax

    r, g, b = pl.pallas_call(
        kernel,
        grid=(h // bh, w // bw),
        in_specs=[blk] * 3,
        out_specs=[blk] * 3,
        out_shape=[plane] * 3,
        interpret=_jax.default_backend() == "cpu",
    )(accum.x, accum.y, accum.z)
    return Vec3(r, g, b)

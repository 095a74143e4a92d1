"""MXU-backed environment-texture gather kernel.

**STATUS: kept NEGATIVE RESULT — not used by any production path.**
This kernel predates the (N, 4) padded-row gather discovery
(texture._gather: 16-byte power-of-two rows hit the hardware gather fast
path, ~1.8-3.6 ns/query, scripts/gather_microbench.py), which beats this
MXU approach by >5x at the 131k-texel env table (docs/PERFORMANCE.md,
"Negative results"). It stays in the tree as a measured design artifact
(one-hot matmuls are O(queries x texels); the serial gather engine wins)
and keeps its parity tests so the claim remains verifiable.

Original problem statement (now solved differently): XLA's TPU gather lowers to a serial dynamic-slice loop
(~40 ns/texel — 37 ms for one 1280x720 deferred env lookup), and Mosaic's
``tpu.dynamic_gather`` only shuffles within identically-shaped tiles, so
neither gives a fast arbitrary texture fetch.

Trick: the MXU is COMPLETELY IDLE in a path tracer (no matmuls anywhere),
so spend it: a texel fetch T[r, c] becomes

    U   = onehot(r) @ T        (CHUNK,H) @ (H, 3W) on the MXU
    out = sum(U * onehot(c))   exact column select on the VPU

One-hot operands are exactly representable in bf16, and T rides as a
double-bf16 pair (hi = bf16(T), lo = bf16(T - hi)) with f32 accumulation,
so the fetched texel matches the f32 texture to ~2^-17 relative — far
inside image-parity tolerance. Net cost ~8-12 ms/frame of otherwise-idle
MXU time instead of 37 ms of serial gather.

Used for the deferred once-per-path env lookup (stochastic single-tap and
the four bilinear taps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpuperformanceraytracer_tpu.core.vecmath import Vec3
from cpuperformanceraytracer_tpu.texture.texture import Texture

CHUNK = 1024  # pixels per grid step


def pack_texture_bf16x2(tex: Texture):
    """(H, 3W) f32 -> (hi, lo) bf16 pair. Call under jit; cache by id."""
    h, w = tex.height, tex.width
    t3 = jnp.concatenate(
        [tex.r.reshape(h, w), tex.g.reshape(h, w), tex.b.reshape(h, w)],
        axis=1,
    )  # (H, 3W)
    hi = t3.astype(jnp.bfloat16)
    lo = (t3 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _gather_kernel(h: int, w: int, r_ref, c_ref, hi_ref, lo_ref,
                   out_r, out_g, out_b):
    r = r_ref[:]  # (CHUNK, 1) int32
    c = c_ref[:]

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, h), 1)
    onehot_r = (row_iota == r).astype(jnp.bfloat16)  # exact in bf16

    u = jax.lax.dot_general(
        onehot_r, hi_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        onehot_r, lo_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (CHUNK, 3W) f32

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, w), 1)
    mask = (col_iota == c).astype(jnp.float32)  # shared by all 3 channels

    out_r[:] = jnp.sum(u[:, 0:w] * mask, axis=1, keepdims=True)
    out_g[:] = jnp.sum(u[:, w:2 * w] * mask, axis=1, keepdims=True)
    out_b[:] = jnp.sum(u[:, 2 * w:3 * w] * mask, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def _env_gather(rows, cols, hi, lo, height: int, width: int):
    p = rows.shape[0]
    pad = (-p) % CHUNK
    if pad:
        rows = jnp.pad(rows, (0, pad))
        cols = jnp.pad(cols, (0, pad))
    n = rows.shape[0]

    kern = functools.partial(_gather_kernel, height, width)
    idx_spec = pl.BlockSpec((CHUNK, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tex_spec = pl.BlockSpec((height, 3 * width), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((CHUNK, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    plane = jax.ShapeDtypeStruct((n, 1), jnp.float32)

    r, g, b = pl.pallas_call(
        kern,
        grid=(n // CHUNK,),
        in_specs=[idx_spec, idx_spec, tex_spec, tex_spec],
        out_specs=[out_spec] * 3,
        out_shape=[plane] * 3,
        interpret=jax.default_backend() == "cpu",
    )(rows.reshape(n, 1), cols.reshape(n, 1), hi, lo)
    return r[:p, 0], g[:p, 0], b[:p, 0]


def gather_texels_mxu(tex: Texture, rows, cols) -> Vec3:
    """tex[rows, cols] for flat int32 index arrays of any shape; returns
    Vec3 planes of the same shape."""
    shape = rows.shape
    hi, lo = pack_texture_bf16x2(tex)
    r, g, b = _env_gather(rows.reshape(-1), cols.reshape(-1), hi, lo,
                          tex.height, tex.width)
    return Vec3(r.reshape(shape), g.reshape(shape), b.reshape(shape))

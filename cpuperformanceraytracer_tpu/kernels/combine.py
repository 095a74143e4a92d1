"""Fused env-combine + progressive-accumulate Pallas kernel.

**STATUS: kept MEASURED ALTERNATIVE — not used by the production path.**
The kernel itself runs at ~0.19 ms/frame (720p, v5e) and does eliminate
XLA's gather-output relayout copy, but feeding it requires densifying
the (P, 4) gather output into a (H, W*4) lane-interleaved view, and that
densify costs ~1.2 ms/frame — more than the 0.63 ms relayout it avoids
(scripts/combine_paths_bench.py). The production path instead makes the
env gather CHANNEL-MAJOR (texture._gather: operand (4, N) with
offset_dims=(0,)), which writes planar planes directly and measures
cheapest end-to-end. This module stays as the measured record of the
lane-shuffle deinterleave technique (Mosaic dynamic_gather on 128-lane
tiles), with parity tests keeping the claim verifiable.

Original problem statement (measured, v5e): the deferred env gather returns
packed (P, 4) RGBX texel rows in the gather's channel-minor layout, but
the megakernel's radiance/throughput planes and the progressive
accumulation buffer are planar (H, W) — XLA reconciles the two by
relayouting the gather output into planar (H, W, 4), a retile copy that
costs ~0.63 ms/frame at 720p (docs/PERFORMANCE.md), and the "packed4"
accumulation layout merely moved the same copy rather than removing it.

The TPU-native fix: consume the gather output IN ITS OWN LAYOUT. A
(P, 4) f32 row-major buffer bitcasts for free to (H, W*4) — RGBX
interleaved along lanes — and Mosaic's dynamic-gather lowers
``jnp.take_along_axis(x, idx, axis=1)`` on exactly-128-lane tiles, so
the deinterleave becomes a handful of in-register lane shuffles
(4 gathers + 3 selects per 128-lane output group) instead of an HBM
retile. This kernel does, in one pass over the frame:

    env_c   = deinterleave(E, c)                   (VPU lane shuffles)
    color_c = rgb_c + env_c * thr_c                (deferred env add)
    accum_c += (color_c - accum_c) * 1/(frame+1)   (progressive mean,
                                                    v4 :1199-1241)

with the accumulation planes aliased in-place (input_output_aliases),
replacing relayout copy + combine fusion + accumulate fusion.

The multi-sample variant (``spp`` > 1) consumes per-sample miss planes
stacked on a leading axis — one batched gather for all samples of a
frame (the reference's per-bounce stochastic env sampling,
texture.cpp:78-86 + demofox_path_tracing_optimization_v4.cpp:745-779,
deferred to one lookup per path) — and averages the samples in-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _deinterleave_channel(e_blk, c: int, bh: int, w: int):
    """(bh, 4w) interleaved RGBX lanes -> (bh, w) plane of channel ``c``.

    Output 128-lane group g takes input lanes [512g, 512g+512): output
    lane j reads input lane 4j+c, i.e. sub-block b = j//32, sub-lane
    4*(j%32)+c. Mosaic's dynamic_gather handles the per-vreg shuffle;
    the b-selection is three lane-range selects.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (bh, 128), 1)
    shuffle_idx = 4 * (lane % 32) + c
    sel = lane // 32
    groups = []
    for g in range(w // 128):
        cands = []
        for b in range(4):
            sub = e_blk[:, 512 * g + 128 * b:512 * g + 128 * (b + 1)]
            cands.append(jnp.take_along_axis(sub, shuffle_idx, axis=1))
        out = cands[0]
        for b in range(1, 4):
            out = jnp.where(sel == b, cands[b], out)
        groups.append(out)
    return jnp.concatenate(groups, axis=1)


def _make_kernel(spp: int, bh: int, w: int):
    def kernel(blend_ref, e_ref, r_ref, g_ref, b_ref, tx_ref, ty_ref,
               tz_ref, ax_ref, ay_ref, az_ref, ox_ref, oy_ref, oz_ref):
        blend = blend_ref[0]
        inv_spp = 1.0 / spp
        for c, (rgb_ref, thr_ref, acc_ref, out_ref) in enumerate((
                (r_ref, tx_ref, ax_ref, ox_ref),
                (g_ref, ty_ref, ay_ref, oy_ref),
                (b_ref, tz_ref, az_ref, oz_ref))):
            if spp == 1:
                env_c = _deinterleave_channel(e_ref[:], c, bh, w)
                color = rgb_ref[:] + env_c * thr_ref[:]
            else:
                # per-sample miss planes ride a leading axis; rgb is
                # already the in-kernel spp mean, so only the env term
                # needs the 1/spp weight
                env_sum = jnp.zeros((bh, w), jnp.float32)
                for s in range(spp):
                    env_c = _deinterleave_channel(e_ref[s], c, bh, w)
                    env_sum = env_sum + env_c * thr_ref[s]
                color = rgb_ref[:] + env_sum * inv_spp
            acc = acc_ref[:]
            out_ref[:] = acc + (color - acc) * blend
    return kernel


def combine_accumulate(e4, rgb, thr, accum, blend, bh: int = 8):
    """Fused deferred-env combine + progressive accumulate.

    Args:
      e4: gather output — (P, 4) f32 RGBX rows for spp=1, or
          (spp, P, 4) for the batched multi-sample frame (P = H*W).
      rgb: Vec3 of (H, W) radiance planes (megakernel output; for
          spp > 1 already the mean over samples).
      thr: Vec3 of (H, W) miss-throughput planes, or (spp, H, W) each.
      accum: Vec3 of (H, W) planes — DONATED, updated in place.
      blend: f32 scalar, 1/(frame+1).
      bh: row-block height (full-width blocks; H % bh == 0, W % 128 == 0).

    Returns the new accum Vec3.
    """
    from cpuperformanceraytracer_tpu.core.vecmath import Vec3

    h, w = rgb.x.shape
    if w % 128:
        raise ValueError(f"combine kernel needs width % 128 == 0, got {w}")
    while h % bh:
        bh //= 2
    spp = 1 if e4.ndim == 2 else e4.shape[0]
    # (P, 4) row-major == (H, W*4) lane-interleaved, bitcast-free
    e_view = e4.reshape((h, w * 4) if spp == 1 else (spp, h, w * 4))

    blk = pl.BlockSpec((bh, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    if spp == 1:
        e_spec = pl.BlockSpec((bh, w * 4), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
        s_spec = blk
    else:
        e_spec = pl.BlockSpec((spp, bh, w * 4), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((spp, bh, w), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)

    plane = jax.ShapeDtypeStruct((h, w), jnp.float32)
    out = pl.pallas_call(
        _make_kernel(spp, bh, w),
        grid=(h // bh,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            e_spec,
            blk, blk, blk,          # rgb planes
            s_spec, s_spec, s_spec,  # thr planes
            blk, blk, blk,          # accum planes (aliased to outputs)
        ],
        out_specs=[blk, blk, blk],
        out_shape=[plane, plane, plane],
        input_output_aliases={8: 0, 9: 1, 10: 2},
        interpret=_use_interpret(),
    )(jnp.asarray(blend, jnp.float32).reshape(1),
      e_view, rgb.x, rgb.y, rgb.z, thr.x, thr.y, thr.z,
      accum.x, accum.y, accum.z)
    return Vec3(*out)

"""Backward Pallas megakernel: path-replay adjoint of the forward
megakernel, per docs/BACKWARD_KERNEL_DESIGN.md.

One grid step = one (bh, bw) pixel block, mirroring the forward kernel:

1. **Forward sweep in VMEM**: re-run the bounce loop (the SAME
   ``make_bounce_body`` the forward kernel uses — one physics
   implementation, zero drift) and store each segment's input state
   (22 f32 + counter-RNG planes) in VMEM scratch. The counter RNG makes
   the replay bit-exact: streams are (pixel, frame, sample, draw)-
   addressed, nothing sequential survives across segments.
2. **Adjoint sweep**: walk segments in reverse; for each, ``jax.vjp`` of
   the segment body at the stored state gives the exact cotangent
   pullback — including the oracle's gradient policy, because the shared
   body detaches lottery/roulette estimator weights (diff/grad.py
   docstring). Scene parameters enter the body as (bh, bw) broadcast
   PLANES so their cotangents come back as planes (no per-scalar
   cross-lane reductions in-kernel — the measured killer).
3. **Parameter reduction**: per-block plane cotangents are accumulated
   in a (T, bh, bw) scratch, reduced over sublanes only, and written as
   a (T, bw) row block; the cross-lane + cross-block reduction happens
   in one cheap XLA sum outside the kernel.
4. **Env texel gradients** stay OUTSIDE the kernel: the deferred miss
   planes give (texel index, cotangent) pairs that
   diff/segsum.segment_sum_sorted bins with one sort instead of an
   (H*W)-update serialized scatter.

Wired as jax.custom_vjp over the packed scene tables, so XLA's transpose
of pack_scene/precompute_quads carries gradients the rest of the way to
scene pytree leaves (sphere centers, quad vertices, materials, camera).

The loop being differentiated is the reference bounce loop,
/root/reference/CPUPerformanceRayTracer/demofox_path_tracing_optimization_v4.cpp:722-910
(which has no gradient story at all — this is a driver-set capability,
BASELINE.json metric "image+pixel-grad allclose parity").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

from cpuperformanceraytracer_tpu.config import RenderConfig
from cpuperformanceraytracer_tpu.core.vecmath import Vec3
from cpuperformanceraytracer_tpu.kernels.megakernel import (
    MAT_COLS,
    MAT_FIELD_KEYS,
    QUAD_COLS,
    SPH_COLS,
    _CtrRng,
    _flatten_state,
    _make_kernel,
    _pallas_render,
    _unflatten_state,
    _use_interpret,
    pack_camera,
    pack_scene,
    rng_flatten,
)

# every trainable family (trained=None means "all of these")
_ALL_TRAINED = frozenset(
    {"quad", "sphere_centers", "sphere_radii", "camera", "env_rgb"}
    | set(MAT_FIELD_KEYS))


class _BakedTables:
    """Hashable-by-content wrapper for the numpy base tables, so the
    partial-baking spec can participate in the kernel builders'
    lru_cache keys."""

    def __init__(self, tables):
        self.tables = tables
        self._key = tuple((t.shape, t.tobytes()) for t in tables)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return (isinstance(other, _BakedTables)
                and self._key == other._key)


def _any_tracer(x) -> bool:
    from jax.core import Tracer

    return any(isinstance(leaf, Tracer) for leaf in jax.tree.leaves(x))


def derive_trained(scene, camera, texture):
    """Which parameter families are actually being differentiated?

    A family is 'trained' iff any of its leaves is a jax Tracer in the
    current trace — exactly the leaves a caller can take gradients
    with respect to (diff/grad.apply_params overlays params as traced
    arrays; everything else stays a concrete closure constant). Every
    non-trained cell can then be baked into the kernels as a
    compile-time constant (VERDICT r4 item 4: partial scene baking).
    """
    part = set()
    if _any_tracer(scene.quads):
        part.add("quad")
    if _any_tracer(scene.spheres.center):
        part.add("sphere_centers")
    if _any_tracer(scene.spheres.radius):
        part.add("sphere_radii")
    for f in ("albedo", "emissive", "specular_chance",
              "specular_roughness", "specular_color", "ior",
              "refraction_chance", "refraction_roughness",
              "refraction_color"):
        if _any_tracer(getattr(scene.materials, f)):
            part.add(f)
    if _any_tracer(camera):
        part.add("camera")
    if texture is not None and _any_tracer(
            (texture.r, texture.g, texture.b)):
        part.add("env_rgb")
    return frozenset(part)


def _concretize(x):
    """Replace traced leaves with zeros (their table cells are never
    read by a partially-baked kernel); concrete leaves pass through."""
    from jax.core import Tracer

    return jax.tree.map(
        lambda l: np.zeros(np.shape(l), np.float32)
        if isinstance(l, Tracer) else np.asarray(l, np.float32), x)


def bake_base_tables(scene, camera, cfg) -> _BakedTables:
    """Numpy base tables for partial baking: concrete leaves keep their
    values, traced (trained) cells are placeholders. Packing runs at
    compile time (inputs are concrete by construction — _concretize —
    but inside a jit trace jnp ops would otherwise be staged)."""
    with jax.ensure_compile_time_eval():
        cs = _concretize(scene)
        quad_np, sph_np, mat_np = (np.asarray(t) for t in pack_scene(cs))
        cam_np = np.asarray(pack_camera(_concretize(camera), cfg),
                            np.float32)
    return _BakedTables((quad_np, sph_np, mat_np, cam_np))

# f32 state-plane indices within _flatten_state's 22-slot layout
_RET = 0      # ret.xyz at 0..2
_POS = 6      # pos.xyz at 6..8
_DIR = 9      # dir.xyz at 9..11
_ALIVE = 12   # alive mask (0/1 f32)
_MISS_THR = 16  # miss throughput .xyz at 16..18
_NF32 = 22


def _bwd_tiles(cfg: RenderConfig):
    """Backward block shape: (cfg.bwd_tile_height, 128) preferred —
    24 by default, the round-5 v5e sweep winner — falling back to 8 /
    the config's tiles when the height is not divisible. The knob lives
    on RenderConfig (not an env var) so it participates in
    _make_bwd_call's cache key and benchmark configs state it
    explicitly. _make_bwd_call additionally DOWNGRADES the height when
    the scene/bounce count would blow the scoped-vmem stack (see
    _bwd_stack_bytes)."""
    pref_h = cfg.bwd_tile_height
    bh = pref_h if cfg.height % pref_h == 0 else (
        8 if cfg.height % 8 == 0 else cfg.tile_height)
    bw = 128 if cfg.width % 128 == 0 else cfg.tile_width
    if cfg.height % bh or cfg.width % bw:
        raise ValueError(
            f"backward kernel: {cfg.width}x{cfg.height} not divisible by "
            f"({bh}, {bw}) blocks")
    return bh, bw


# Mosaic's scoped-vmem stack limit is 16 MB on v5e (measured round 5:
# bwd_tile_height=40 at the 12-object glass scene failed AOT compile
# with "size 18.88M and limit 16.00M"). The kernel's stack holds the
# declared scratch (per-segment state store + theta accumulator + cot
# planes) PLUS the jax.vjp residual temporaries — empirically ~3.1x
# the declared scratch at the headline workload (18.88M actual vs
# 6.0M declared at bh=40). _make_bwd_call downgrades the block height
# until the estimate fits, and raises a sized error only if even the
# minimum block cannot.
_BWD_VMEM_BUDGET_BYTES = 16 * 1024 * 1024
_BWD_STACK_MULTIPLIER = 3.1


def _bwd_scratch_bytes(n_segments, bh, bw, t_pl):
    """Declared f32/u32 scratch footprint of one backward-kernel block."""
    state_store = n_segments * bh * bw * (_NF32 + 3)
    theta_acc = t_pl * bh * bw
    cot_planes = _NF32 * bh * bw
    return 4 * (state_store + theta_acc + cot_planes)


def _bwd_stack_bytes(n_segments, bh, bw, t_pl):
    """Estimated Mosaic stack use incl. vjp residual temporaries."""
    return int(_BWD_STACK_MULTIPLIER
               * _bwd_scratch_bytes(n_segments, bh, bw, t_pl))


def _fit_bwd_height(bh, bw, local_h, n_segments, t_pl,
                    scene_desc="scene"):
    """Downgrade the block height until the scoped-vmem stack estimate
    fits (bigger scenes / more bounces / full-theta builds need shorter
    blocks than the round-5 default); raise a sized error only when
    even the minimum block cannot fit."""
    while _bwd_stack_bytes(n_segments, bh, bw, t_pl) > \
            _BWD_VMEM_BUDGET_BYTES:
        cand = next((h for h in (24, 16, 8)
                     if h < bh and local_h % h == 0), None)
        if cand is None:
            raise ValueError(
                f"backward kernel needs ~"
                f"{_bwd_stack_bytes(n_segments, bh, bw, t_pl) / 2**20:.1f}"
                f" MiB scoped vmem per ({bh},{bw}) block ({t_pl} theta "
                f"planes from {scene_desc}, {n_segments} segments) — "
                f"over the {_BWD_VMEM_BUDGET_BYTES / 2**20:.0f} MiB "
                "Mosaic stack limit even at the minimum block height. "
                "Reduce scene size or bounces "
                "(docs/BACKWARD_KERNEL_DESIGN.md, 'VMEM ceiling').")
        bh = cand
    return bh


@functools.lru_cache(maxsize=None)
def _make_bwd_call(cfg: RenderConfig, nq: int, ns: int, nm: int,
                   local_h: int = 0, trained=None, baked=None):
    """Build the cached backward pallas_call for static (cfg, sizes).

    Returns (fn, spec): fn(scalars, quad_tbl, sph_tbl, mat_tbl, cam_tbl,
    cot6) -> (n_blocks, T_rows, bw) per-block parameter-cotangent
    partials, where the first len(spec) rows are the TRAINED theta
    cells in ``spec`` order ((kind, i, col) triples over
    quad/sph/mat/amb) and the last 5 rows are the camera scalars; the
    caller reduces over (blocks, lanes) and re-inflates to full tables
    (_bwd_tables).

    ``trained``: frozenset of trained families (kernels partial-bake
    everything else from ``baked`` — smaller theta, smaller VMEM
    scratch, and the shared bounce body specializes on the constant
    cells exactly like the baked forward kernel). None = all families.
    ``baked``: _BakedTables numpy base tables (always required — they
    also supply structural cells like material indices).

    ``local_h``: rows handled by THIS invocation (a shard's pixel-row
    window under shard_map; 0 = full height). The scalars' row0 entry
    names the window's first global row — camera math and RNG seeds are
    global-pixel quantities, exactly like the forward kernel.
    """
    cfg = cfg.validate()
    if cfg.rng != "counter":
        raise ValueError("backward megakernel requires rng='counter' "
                         "(addressable per-sample streams for replay)")
    local_h = local_h or cfg.height
    bh, bw = _bwd_tiles(cfg.replace(height=local_h))
    height, width = cfg.height, cfg.width
    n_segments = cfg.bounces + 1
    part = trained if trained is not None else _ALL_TRAINED
    bt = baked.tables

    # ---- the trained-theta spec: ordered (kind, i, col) cells.
    # Material indices (quad col 24 handled inside the quad family;
    # sphere col 4) are structural and never trained on their own.
    spec = []
    if "quad" in part:
        spec += [("quad", qi, c)
                 for qi in range(nq) for c in range(QUAD_COLS)]
    for si in range(ns):
        if "sphere_centers" in part:
            spec += [("sph", si, c) for c in range(3)]
        if "sphere_radii" in part:
            spec.append(("sph", si, 3))
    for mi in range(nm):
        for c in range(MAT_COLS):
            if MAT_FIELD_KEYS[c] in part:
                spec.append(("mat", mi, c))
    amb_start = len(spec)
    spec += [("amb", 0, c) for c in range(3)]
    spec = tuple(spec)
    t_pl = len(spec)
    t_rows = t_pl + 5         # + camera scalars (cam cols 0..4)
    pos_of = {cell: p for p, cell in enumerate(spec)}
    _TBL = {"quad": 0, "sph": 1, "mat": 2}

    bh = _fit_bwd_height(bh, bw, local_h, n_segments, t_pl,
                         scene_desc=f"{nq} quads/{ns} spheres/{nm} "
                                    "materials")

    # built AFTER the height downgrade: the exported bounce body closes
    # over the final (bh, bw) block shape
    parts = _make_kernel(cfg, nq, ns, nm, bh, bw, baked=None,
                         export_parts=True)

    def unpack(theta):
        """theta planes -> (quads, spheres, materials, cam_shim) in the
        exact structure load_quads/load_spheres/load_materials emit
        (megakernel._make_kernel), so make_bounce_body is reusable.
        Non-trained cells come back as python floats from the baked
        tables — the bounce body specializes on them (_is_const)."""
        def cell(kind, i, c):
            p = pos_of.get((kind, i, c))
            return theta[p] if p is not None else float(
                bt[_TBL[kind]][i, c])

        def v3(kind, i, c0):
            return Vec3(cell(kind, i, c0), cell(kind, i, c0 + 1),
                        cell(kind, i, c0 + 2))

        quads = [(v3("quad", qi, 0), v3("quad", qi, 3),
                  v3("quad", qi, 6), v3("quad", qi, 12),
                  v3("quad", qi, 15), v3("quad", qi, 21),
                  cell("quad", qi, 24)) for qi in range(nq)]
        spheres = [(v3("sph", si, 0), cell("sph", si, 3),
                    cell("sph", si, 4)) for si in range(ns)]
        materials = [[cell("mat", mi, k) for k in range(MAT_COLS)]
                     for mi in range(nm)]
        # bounce_body reads cam_ref[5..7] (ambient) only
        cam_shim = [0.0] * 5 + [theta[amb_start], theta[amb_start + 1],
                                theta[amb_start + 2]]
        return quads, spheres, materials, cam_shim

    def seg_f32(theta, f32s, rngs):
        """Pure per-segment function for jax.vjp: f32 state planes in,
        f32 state planes out; RNG planes are non-diff replay constants."""
        quads, spheres, materials, cam_shim = unpack(theta)
        bounce = parts.make_bounce_body(quads, spheres, materials, cam_shim)
        state = _unflatten_state(list(f32s) + list(rngs))
        return tuple(_flatten_state(bounce(state))[:_NF32])

    def kernel(frame_ref, quad_ref, sph_ref, mat_ref, cam_ref,
               dr, dg, db, dmx, dmy, dmz, dtheta_out, *scratch):
        st_f32 = scratch[:_NF32]           # 22 x (S*bh, bw) f32
        st_u32 = scratch[_NF32:_NF32 + 3]  # 3 x (S*bh, bw) u32
        dth_acc = scratch[_NF32 + 3]       # (t_pl, bh, bw) f32
        cot_s = scratch[_NF32 + 4:]        # 22 x (bh, bw) f32 cotangents

        # ---- theta: the TRAINED cells (+ ambient), as broadcast planes
        refs = {"quad": quad_ref, "sph": sph_ref, "mat": mat_ref}
        cells = [cam_ref[5 + c] if kind == "amb" else refs[kind][i, c]
                 for kind, i, c in spec]
        theta = tuple(jnp.full((bh, bw), v, jnp.float32) for v in cells)

        # ---- frag coords + counter keys (same math as the fwd kernel)
        bi = pl.program_id(0)
        bj = pl.program_id(1)
        row0 = frame_ref[1]
        samp0 = frame_ref[2].astype(jnp.uint32)
        frame = frame_ref[0]
        row = row0 + bi * bh + jax.lax.broadcasted_iota(
            jnp.int32, (bh, bw), 0)
        col = bj * bw + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
        fy_i = (height - 1) - row
        frag_x = col.astype(jnp.float32)
        frag_y = fy_i.astype(jnp.float32)
        fx_u = col.astype(jnp.uint32)
        fy_u = fy_i.astype(jnp.uint32)

        key0 = fx_u * 1973 + fy_u * 9277
        key1 = jnp.broadcast_to(
            frame.astype(jnp.uint32) * 26699
            + samp0 * jnp.uint32(40503) + jnp.uint32(1), (bh, bw))
        rng0 = _CtrRng(key0, key1, jnp.zeros((bh, bw), jnp.uint32))

        # ---- camera (differentiable in cam cols 0..4)
        cam5 = tuple(cam_ref[i] for i in range(5))

        def cam_fn(c5):
            cam_list = list(c5) + [0.0, 0.0, 0.0]
            pos, direction, _ = parts.camera_ray_blk(cam_list, rng0,
                                                     frag_x, frag_y)
            return (pos.x, pos.y, pos.z,
                    direction.x, direction.y, direction.z)

        pd, cam_vjp = jax.vjp(cam_fn, cam5)
        _, _, rng_after = parts.camera_ray_blk(
            list(cam5) + [0.0, 0.0, 0.0], rng0, frag_x, frag_y)

        zero = jnp.zeros((bh, bw), jnp.float32)
        one = jnp.ones((bh, bw), jnp.float32)
        pos = Vec3(pd[0], pd[1], pd[2])
        direction = Vec3(pd[3], pd[4], pd[5])
        state = (Vec3(zero, zero, zero), Vec3(one, one, one), pos,
                 direction, jnp.ones((bh, bw), jnp.bool_),
                 Vec3(zero, zero, one), Vec3(zero, zero, zero), zero,
                 zero, jnp.zeros((bh, bw), jnp.bool_),
                 rng_flatten(rng_after))

        # ---- forward sweep: store each segment's INPUT state. Segments
        # whose input has no live lane are identities — copy the slot
        # instead of re-tracing it (the adjoint-side analog of the
        # forward kernel's block early-exit, v4 :731,781): sky blocks
        # die at segment 0 and skip the remaining 8 segments entirely.
        quads, spheres, materials, cam_shim = unpack(theta)
        bounce = parts.make_bounce_body(quads, spheres, materials, cam_shim)
        flat0 = _flatten_state(state)
        for k in range(_NF32):
            st_f32[k][0:bh, :] = flat0[k]
        for k in range(3):
            st_u32[k][0:bh, :] = flat0[_NF32 + k]
        for s in range(n_segments - 1):
            any_alive = jnp.max(st_f32[_ALIVE][s * bh:(s + 1) * bh, :]) > 0.0

            @pl.when(any_alive)
            def _(s=s):
                st = _unflatten_state(
                    [st_f32[k][s * bh:(s + 1) * bh, :]
                     for k in range(_NF32)]
                    + [st_u32[k][s * bh:(s + 1) * bh, :] for k in range(3)])
                flat = _flatten_state(bounce(st))
                for k in range(_NF32):
                    st_f32[k][(s + 1) * bh:(s + 2) * bh, :] = flat[k]
                for k in range(3):
                    st_u32[k][(s + 1) * bh:(s + 2) * bh, :] = flat[_NF32 + k]

            @pl.when(jnp.logical_not(any_alive))
            def _(s=s):
                for k in range(_NF32):
                    st_f32[k][(s + 1) * bh:(s + 2) * bh, :] = (
                        st_f32[k][s * bh:(s + 1) * bh, :])
                for k in range(3):
                    st_u32[k][(s + 1) * bh:(s + 2) * bh, :] = (
                        st_u32[k][s * bh:(s + 1) * bh, :])

        # ---- cotangent init from the kernel's output planes
        # acc = ret * (1/spp); miss_thr cot arrives from the env combine
        inv_spp = 1.0 / cfg.spp
        cot_init = [zero] * _NF32
        cot_init[_RET + 0] = dr[...] * inv_spp
        cot_init[_RET + 1] = dg[...] * inv_spp
        cot_init[_RET + 2] = db[...] * inv_spp
        cot_init[_MISS_THR + 0] = dmx[...]
        cot_init[_MISS_THR + 1] = dmy[...]
        cot_init[_MISS_THR + 2] = dmz[...]
        for k in range(_NF32):
            cot_s[k][...] = cot_init[k]

        for t in range(t_pl):
            dth_acc[t] = zero

        # ---- adjoint sweep (reverse): vjp of the segment body at the
        # stored state; accumulate theta cotangent planes. Dead segments
        # are identities: the cotangent passes through unchanged and the
        # theta contribution is zero, so the skip is exact.
        for s in reversed(range(n_segments)):
            any_alive = jnp.max(st_f32[_ALIVE][s * bh:(s + 1) * bh, :]) > 0.0

            @pl.when(any_alive)
            def _(s=s):
                f32_in = tuple(st_f32[k][s * bh:(s + 1) * bh, :]
                               for k in range(_NF32))
                rng_in = tuple(st_u32[k][s * bh:(s + 1) * bh, :]
                               for k in range(3))
                _, seg_vjp = jax.vjp(
                    lambda th, fs: seg_f32(th, fs, rng_in), theta, f32_in)
                cot = tuple(cot_s[k][...] for k in range(_NF32))
                d_th, d_f32 = seg_vjp(cot)
                for t in range(t_pl):
                    dth_acc[t] = dth_acc[t] + d_th[t]
                for k in range(_NF32):
                    cot_s[k][...] = d_f32[k]

        # ---- camera backward from the segment-0 pos/dir cotangents
        cot0 = [cot_s[k][...] for k in range(_NF32)]
        d_cam5 = cam_vjp((cot0[_POS], cot0[_POS + 1], cot0[_POS + 2],
                          cot0[_DIR], cot0[_DIR + 1], cot0[_DIR + 2]))[0]

        # ---- write per-block partials: sublane-reduced theta planes +
        # camera scalars in lane 0 of their rows (cross-lane and
        # cross-block reduction happens outside, in one XLA sum)
        dtheta_out[0, :t_pl, :] = jnp.sum(dth_acc[...], axis=1)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, bw), 1)
        for i in range(5):
            dtheta_out[0, t_pl + i:t_pl + i + 1, :] = jnp.where(
                lane1 == 0, d_cam5[i], 0.0)

    gh, gw = local_h // bh, width // bw
    n_blocks = gh * gw

    def smem(shape):
        return pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                            memory_space=pltpu.SMEM)

    blk = pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                       memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, t_rows, bw), lambda i, j: (i * gw + j, 0, 0),
                            memory_space=pltpu.VMEM)
    scratch_shapes = (
        [pltpu.VMEM((n_segments * bh, bw), jnp.float32)] * _NF32
        + [pltpu.VMEM((n_segments * bh, bw), jnp.uint32)] * 3
        + [pltpu.VMEM((t_pl, bh, bw), jnp.float32)]
        + [pltpu.VMEM((bh, bw), jnp.float32)] * _NF32  # cot planes
    )

    call = pl.pallas_call(
        kernel,
        grid=(gh, gw),
        in_specs=[smem((3,)), smem((nq, QUAD_COLS)), smem((ns, SPH_COLS)),
                  smem((nm, MAT_COLS)), smem((8,))] + [blk] * 6,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, t_rows, bw), jnp.float32),
        scratch_shapes=scratch_shapes,
        interpret=_use_interpret(),
    )

    def run(scalars, quad_tbl, sph_tbl, mat_tbl, cam_tbl, cot6):
        return call(scalars, quad_tbl, sph_tbl, mat_tbl, cam_tbl, *cot6)

    return run, spec


def _inflate(flat, spec, kind, n, n_cols):
    """Re-inflate one table's trained-cell rows of ``flat`` (spec order)
    to a dense (n, n_cols) cotangent table, zeros at baked cells.

    Spec rows per family are contiguous and i-major with an identical
    column pattern per row, so this is a reshape + zero-column
    interleave (stack) — no scatters (TPU scatter is a serial loop)."""
    rows = [p for p, (k, _, _) in enumerate(spec) if k == kind]
    if not rows:
        return jnp.zeros((n, n_cols), jnp.float32)
    cols = sorted({c for (k, _, c) in spec if k == kind})
    blk = flat[rows[0]:rows[0] + len(rows)].reshape(n, len(cols))
    if len(cols) == n_cols:
        return blk
    zero = jnp.zeros((n,), jnp.float32)
    return jnp.stack(
        [blk[:, cols.index(c)] if c in cols else zero
         for c in range(n_cols)], axis=1)


def _bwd_tables(cfg, quad_tbl, sph_tbl, mat_tbl, cam_tbl, frame, sample0,
                cot6, row0=0, local_h=0, trained=None, baked=None):
    """Run the backward kernel and reduce partials to table cotangents."""
    nq, ns, nm = quad_tbl.shape[0], sph_tbl.shape[0], mat_tbl.shape[0]
    run, spec = _make_bwd_call(cfg, nq, ns, nm, local_h, trained, baked)
    scalars = jnp.stack([jnp.asarray(frame, jnp.int32).reshape(()),
                         jnp.asarray(row0, jnp.int32).reshape(()),
                         jnp.asarray(sample0, jnp.int32).reshape(())])
    partials = run(scalars, quad_tbl, sph_tbl, mat_tbl, cam_tbl, cot6)
    flat = jnp.sum(partials, axis=(0, 2))  # (t_rows,)
    t_pl = len(spec)
    d_quad = _inflate(flat, spec, "quad", nq, QUAD_COLS)
    d_sph = _inflate(flat, spec, "sph", ns, SPH_COLS)
    d_mat = _inflate(flat, spec, "mat", nm, MAT_COLS)
    d_amb = flat[t_pl - 3:t_pl]
    d_cam5 = flat[t_pl:t_pl + 5]
    d_cam = jnp.concatenate([d_cam5, d_amb])
    return d_quad, d_sph, d_mat, d_cam


# ---------------------------------------------------------------------------
# custom_vjp wiring: one sample (spp=1 dispatch) at the table level
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _diff_sample_fn(cfg: RenderConfig, tex_n: int, local_h: int = 0,
                    trained=None, baked=None):
    """Differentiable single-sample render over packed tables.

    ``tex_n``: flat env texel count (0 = no env texture). Returns
    fn(quad, sph, mat, cam, tex_r, tex_g, tex_b, frame, sample0, row0)
    -> (r, g, b) planes. frame/sample0/row0 are non-differentiable
    int32. ``local_h``: this invocation's pixel-row window (a shard's
    rows under shard_map; 0 = full frame), with row0 naming the window's
    first global row.

    ``trained``/``baked``: partial-baking spec (frozenset of trained
    families + _BakedTables base tables): both the forward megakernel
    and the adjoint kernel bake every non-trained cell as a
    compile-time constant; gradients flow only to trained families —
    exactly the ones whose leaves are traced at the call site
    (derive_trained). None = fully traced (all families trainable).
    """
    cfg = cfg.validate().replace(spp=1, bake_scene=False)
    if cfg.env_mode != "none" and cfg.env_sampling == "bilinear":
        raise NotImplementedError(
            "pallas backward: env_sampling='bilinear' is 4-tap (use "
            "stochastic — the reference default — or nearest; the XLA "
            "oracle path differentiates bilinear)")
    if cfg.rng != "counter":
        raise ValueError("pallas backward requires rng='counter'")

    from cpuperformanceraytracer_tpu.diff.segsum import segment_sum_sorted
    from cpuperformanceraytracer_tpu.texture.texture import (
        Texture,
        _gather,
        env_texel_flat_index,
    )

    def tex_of(tr, tg, tb):
        if tex_n == 0:
            return None
        # width/height ride on cfg via env_tex_shape (set by caller)
        w, h = cfg.env_tex_shape
        return Texture(r=tr, g=tg, b=tb, width=w, height=h)

    part = trained if trained is not None else _ALL_TRAINED
    env_trained = tex_n > 0 and "env_rgb" in part

    def forward(quad, sph, mat, cam, tr, tg, tb, frame, sample0, row0):
        outs = _pallas_render(None, None, None, cfg, frame,
                              sample0=sample0, row0=row0,
                              local_height=local_h or None,
                              tables=(quad, sph, mat, cam),
                              baked_tables=(baked.tables
                                            if trained is not None
                                            else None),
                              trained=trained)
        (r, g, b, mdx, mdy, mdz, mtx, mty, mtz, jr, jc, missed) = outs
        if cfg.env_mode == "none":
            return (r, g, b), None
        tex = tex_of(tr, tg, tb)
        idx = env_texel_flat_index(tex, Vec3(mdx, mdy, mdz), cfg, jr, jc)
        env = _gather(tex, idx)
        color = (r + env.x * mtx, g + env.y * mty, b + env.z * mtz)
        return color, (idx, (mtx, mty, mtz), (env.x, env.y, env.z))

    @jax.custom_vjp
    def sample(quad, sph, mat, cam, tr, tg, tb, frame, sample0, row0):
        return forward(quad, sph, mat, cam, tr, tg, tb, frame, sample0,
                       row0)[0]

    def sample_fwd(quad, sph, mat, cam, tr, tg, tb, frame, sample0, row0):
        color, env_res = forward(quad, sph, mat, cam, tr, tg, tb, frame,
                                 sample0, row0)
        return color, (quad, sph, mat, cam, env_res, frame, sample0, row0)

    def sample_bwd(res, g):
        quad, sph, mat, cam, env_res, frame, sample0, row0 = res
        gx, gy, gz = g
        if env_res is None:
            cot6 = (gx, gy, gz, jnp.zeros_like(gx), jnp.zeros_like(gy),
                    jnp.zeros_like(gz))
            z1 = jnp.zeros((1,), jnp.float32)  # placeholder tex planes
            d_tex = (z1, z1, z1)
        else:
            idx, (mtx, mty, mtz), (ex, ey, ez) = env_res
            # d color/d miss_thr = env; d color/d env_texel = miss_thr,
            # binned per texel by ONE sort (no serialized scatter); the
            # texel INDEX is piecewise constant (stochastic/nearest tap)
            # so miss_dir/jr/jc carry no gradient — matching the oracle.
            cot6 = (gx, gy, gz, gx * ex, gy * ey, gz * ez)
            if env_trained:
                d_tex = segment_sum_sorted(
                    idx.reshape(-1),
                    ((gx * mtx).reshape(-1), (gy * mty).reshape(-1),
                     (gz * mtz).reshape(-1)),
                    tex_n)
            else:
                # env texels are closure constants this trace: skip the
                # whole sort+segment-sum pipeline
                z = jnp.zeros((tex_n,), jnp.float32)
                d_tex = (z, z, z)
        d_quad, d_sph, d_mat, d_cam = _bwd_tables(
            cfg, quad, sph, mat, cam, frame, sample0, cot6,
            row0=row0, local_h=local_h, trained=trained, baked=baked)
        return (d_quad, d_sph, d_mat, d_cam,
                d_tex[0], d_tex[1], d_tex[2], None, None, None)

    sample.defvjp(sample_fwd, sample_bwd)
    return sample


def render_frame_pallas_diff(scene, camera, texture, cfg: RenderConfig,
                             frame, spp_offset=0, row0=0,
                             local_height=None, spp_count=None,
                             trained=None, baked=None) -> Vec3:
    """Differentiable Pallas frame render: forward = the megakernel +
    deferred env combine; backward = the adjoint megakernel + sorted
    env segment-sum. Drop-in for render_frame inside jax.grad when
    cfg.backend == 'pallas' (diff/grad.render_for_params dispatches).

    spp > 1 runs one differentiable sample dispatch per sample (counter
    streams are per-sample addressable; cotangents sum across samples
    automatically). ``spp_offset``/``row0``/``local_height``/
    ``spp_count``: sharding hooks mirroring render_frame_pallas —
    parallel.shard.sharded_render_frame_diff passes axis-index-derived
    values; spp_offset/row0 may be traced."""
    cfg = cfg.validate()
    if texture is not None and cfg.env_mode != "none":
        if not isinstance(texture.width, int):
            # under shard_map the NamedTuple's dims arrive traced; the
            # diff path needs them static (they size the backward kernel)
            raise ValueError(
                "diff path needs static texture.width/height — inside "
                "shard_map restore them from the enclosing scope (see "
                "parallel.shard.sharded_render_frame_diff)")
        tex_n = texture.width * texture.height
        cfg = cfg.replace(env_tex_shape=(texture.width, texture.height))
        tr, tg, tb = texture.r, texture.g, texture.b
    else:
        tex_n = 0
        z = jnp.zeros((1,), jnp.float32)
        tr = tg = tb = z
    quad, sph, mat = pack_scene(scene)
    cam = pack_camera(camera, cfg)
    n_spp = spp_count if spp_count is not None else cfg.spp
    # partial baking: families whose leaves are traced HERE are the
    # trainable surface; everything else bakes to kernel constants.
    # Under shard_map every operand leaf is traced, so the sharded
    # caller (parallel.shard.sharded_render_frame_diff) derives the
    # spec OUTSIDE the shard body and passes it through.
    if trained is None:
        trained = derive_trained(scene, camera, texture)
    if baked is None:
        baked = bake_base_tables(scene, camera, cfg)
    fn = _diff_sample_fn(cfg.replace(spp=1), tex_n, local_height or 0,
                         trained, baked)

    acc = None
    for s in range(n_spp):
        r, g, b = fn(quad, sph, mat, cam, tr, tg, tb,
                     jnp.asarray(frame, jnp.int32),
                     jnp.asarray(spp_offset, jnp.int32) + s,
                     jnp.asarray(row0, jnp.int32))
        acc = (r, g, b) if acc is None else (acc[0] + r, acc[1] + g,
                                             acc[2] + b)
    inv = 1.0 / n_spp
    return Vec3(acc[0] * inv, acc[1] * inv, acc[2] * inv)

"""Fused Pallas path-tracing megakernel.

One grid step = one (BH, BW) pixel block. The whole per-sample pipeline —
wang-hash RNG, camera ray, the full bounce loop with blend-chain
intersection over every quad/sphere, Fresnel material lottery, Beer
absorption, Russian roulette — runs on (BH, BW) f32 tiles that live in
VMEM/vector registers; nothing per-ray ever round-trips to HBM. This is
the TPU re-derivation of the reference's 8-wide SIMD megaloop
(GetColorForRay, demofox_path_tracing_optimization_v4.cpp:722-910) with
the (8,128) vector register file as the "packet".

Scene data rides in SMEM ((N,K) f32 tables, scalar-read per object and
broadcast), mirroring how the reference keeps the scene in L1-resident
SoA (Scene :364-377). Per-object loops are python-unrolled blend chains
exactly like TestSceneTrace (:699-718).

Environment radiance is DEFERRED: each path needs at most one env-map
texel (first miss kills the path), so the kernel emits
(missed, miss_dir, miss_throughput, jitter) planes and the env gather +
final add happens outside in XLA — one gather per pixel per sample
instead of one per bounce. RNG draw order matches the oracle exactly
(render/integrator.py draw-order contract).

Constraint: the wang RNG stream is sequential per (pixel, frame) across
the spp loop, which the kernel reproduces; the counter RNG is also
supported. Parity: allclose vs the oracle integrator (tests/test_pallas.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpuperformanceraytracer_tpu.config import RenderConfig
from cpuperformanceraytracer_tpu.core.rng import CounterRng, WangRng
from cpuperformanceraytracer_tpu.core.vecmath import (
    Vec3,
    dot3,
    fresnel_reflect_amount,
    reflect,
    refract,
)
from cpuperformanceraytracer_tpu.render.integrator import (
    MIN_RAY_HIT_TIME,
    MIN_RAY_PROBABILITY,
    RAY_POS_NORMAL_NUDGE,
    SUPER_FAR,
)
from cpuperformanceraytracer_tpu.core.sampling import (
    random_unit_vector_normalized3,
    random_unit_vector_zangle,
)
from cpuperformanceraytracer_tpu.scene.types import Scene, precompute_quads
from cpuperformanceraytracer_tpu.texture.texture import sample_environment_deferred


def _safe_normalize(v: Vec3) -> Vec3:
    # exact 1/sqrt, bit-matching the oracle's _safe_normalize (parity
    # policy: no fast-math divergence between kernel and oracle)
    d2 = jnp.maximum(dot3(v, v), 1e-20)
    return v * (1.0 / jnp.sqrt(d2))


def _w3(cond, new: Vec3, old: Vec3) -> Vec3:
    if cond is True:
        return new
    if cond is False:
        return old
    return Vec3(
        jnp.where(cond, new.x, old.x),
        jnp.where(cond, new.y, old.y),
        jnp.where(cond, new.z, old.z),
    )


def _wh(cond, a, b):
    """jnp.where with python-bool shortcut (baked-scene specialization)."""
    if cond is True:
        return a
    if cond is False:
        return b
    return jnp.where(cond, a, b)


# ----------------------------------------------------------------------------
# Scene packing: pytrees -> flat f32 tables for SMEM
# ----------------------------------------------------------------------------

QUAD_COLS = 25  # v0(3) n(3) nxv01/12/20/02/23/30 (18) mat(1)
SPH_COLS = 5    # center(3) radius(1) mat(1)
MAT_COLS = 17   # SMaterialInfo fields in SoA order (v4 :330-349)


def pack_scene(scene: Scene):
    d = precompute_quads(scene.quads)
    q = scene.quads

    def cat3(v):
        return [v.x, v.y, v.z]

    quad_tbl = jnp.stack(
        cat3(q.v0) + cat3(d.normal) + cat3(d.nxv01) + cat3(d.nxv12)
        + cat3(d.nxv20) + cat3(d.nxv02) + cat3(d.nxv23) + cat3(d.nxv30)
        + [q.material.astype(jnp.float32)],
        axis=-1,
    )  # (NQ, 25)
    s = scene.spheres
    sph_tbl = jnp.stack(
        cat3(s.center) + [s.radius, s.material.astype(jnp.float32)], axis=-1
    )  # (NS, 5)
    m = scene.materials
    mat_tbl = jnp.stack(
        cat3(m.albedo) + cat3(m.emissive)
        + [m.specular_chance, m.specular_roughness]
        + cat3(m.specular_color)
        + [m.ior, m.refraction_chance, m.refraction_roughness]
        + cat3(m.refraction_color),
        axis=-1,
    )  # (NM, 17)
    return quad_tbl, sph_tbl, mat_tbl


def pack_camera(camera, cfg) -> "jnp.ndarray":
    """(8,) camera table: position(3), distance, forward_z, ambient(3).
    The ambient rides in the camera table because the kernel adds it
    inline on first miss when env_mode == 'none'."""
    a = cfg.ambient
    return jnp.stack([
        camera.position.x, camera.position.y, camera.position.z,
        camera.distance, camera.forward_z,
        jnp.float32(a[0]), jnp.float32(a[1]), jnp.float32(a[2]),
    ])


class _SmemRng:
    """WangRng-compatible draw API over a (BH, BW) u32 state tile."""

    def __init__(self, state):
        self.state = state

    def next01(self):
        from cpuperformanceraytracer_tpu.core.rng import rand01

        v, s = rand01(self.state)
        return v, _SmemRng(s)


class _CtrRng:
    """CounterRng-compatible draw API over (BH, BW) key tiles."""

    def __init__(self, key0, key1, ctr):
        self.key0, self.key1, self.ctr = key0, key1, ctr

    def next01(self):
        from cpuperformanceraytracer_tpu.core.rng import counter_rand01

        v = counter_rand01(self.key0, self.key1, self.ctr, 0)
        return v, _CtrRng(self.key0, self.key1, self.ctr + 1)


def rng_flatten(rng):
    """RNG object -> tuple of arrays (loop-carry friendly)."""
    if isinstance(rng, _SmemRng):
        return (rng.state,)
    return (rng.key0, rng.key1, rng.ctr)


def rng_unflatten(leaves):
    if len(leaves) == 1:
        return _SmemRng(leaves[0])
    return _CtrRng(*leaves)


def _scalar3(ref, row, col0) -> Vec3:
    return Vec3(ref[row, col0], ref[row, col0 + 1], ref[row, col0 + 2])


# Scratch layout for the early-exit bounce loop: 22 f32 planes of carried
# state (masks stored as 0/1 f32 — VMEM scratch is typed) + the RNG's u32
# planes (1 for wang, 3 for counter).
_ALIVE_SLOT = 12
_N_F32_SLOTS = 22


def _flatten_state(s):
    (ret, thr, pos, dir, alive, miss_dir, miss_thr, miss_jr, miss_jc,
     missed, rng_state) = s
    f = [ret.x, ret.y, ret.z, thr.x, thr.y, thr.z, pos.x, pos.y, pos.z,
         dir.x, dir.y, dir.z, alive.astype(jnp.float32),
         miss_dir.x, miss_dir.y, miss_dir.z,
         miss_thr.x, miss_thr.y, miss_thr.z, miss_jr, miss_jc,
         missed.astype(jnp.float32)]
    return f + list(rng_state)


def _unflatten_state(flat):
    (rx, ry, rz, tx, ty, tz, px, py, pz, dx, dy, dz, alive,
     mdx, mdy, mdz, mtx, mty, mtz, mjr, mjc, missed, *rng) = flat
    return (Vec3(rx, ry, rz), Vec3(tx, ty, tz), Vec3(px, py, pz),
            Vec3(dx, dy, dz), alive > 0.5, Vec3(mdx, mdy, mdz),
            Vec3(mtx, mty, mtz), mjr, mjc, missed > 0.5, tuple(rng))


def _const(x):
    """Python-float compile-time constant, or None if traced."""
    return float(x) if isinstance(x, (int, float)) else None


def _is_const(x, value=None):
    c = _const(x)
    return c is not None and (value is None or c == value)


def _magic_div(d: int, n: int):
    """(k, m, s) with ((g >> k) * m) >> s == g // d for every
    0 <= g < n, exhaustively verified ((g >> k) * m stays below 2^31 so
    i32 vector math is exact). Factoring d's power of two into the
    pre-shift k buys the precision headroom that divisors like 30 need
    at 4K group counts."""
    import numpy as np

    g = np.arange(n, dtype=np.int64)
    want = g // d
    k = (d & -d).bit_length() - 1  # trailing zeros of d
    d2 = d >> k
    gk = g >> k
    for s in range(1, 31):
        m = (1 << s) // d2 + 1
        if (gk[-1]) * m >= (1 << 31):
            continue
        if np.all((gk * m) >> s == want):
            return k, m, s
    raise ValueError(f"no exact magic divisor for d={d}, n={n}")


# param-key granularity for PARTIAL baking (the diff path): material
# table column -> the apply_params key that trains it (diff/grad.py)
MAT_FIELD_KEYS = (
    ["albedo"] * 3 + ["emissive"] * 3
    + ["specular_chance", "specular_roughness"] + ["specular_color"] * 3
    + ["ior", "refraction_chance", "refraction_roughness"]
    + ["refraction_color"] * 3
)


def _make_kernel(cfg: RenderConfig, nq: int, ns: int, nm: int,
                 bh: int, bw: int, baked=None, flat_gpr=None,
                 export_parts=False, trained=None):
    """Build the kernel body for static (cfg, scene sizes, block shape).

    ``baked``: optional (quad_np, sph_np, mat_np, cam_np) numpy tables —
    the scene as compile-time constants (the TPU analog of the
    reference's static InitializeScene data, v4 :1403-1496). Baking lets
    the material fetch collapse to distinct-value select chains and lets
    shading paths that the scene cannot exercise (refraction, Fresnel,
    Beer absorption, roughness lerps) drop out of the kernel entirely.

    ``trained``: optional frozenset of apply_params keys ("albedo",
    "sphere_centers", "quad", "camera", ...) enabling PARTIAL baking for
    the differentiable path: cells belonging to a trained family read
    from the SMEM tables (traced, gradients flow); every other cell is a
    compile-time constant from ``baked`` (which must then be provided).
    None = the all-or-nothing behavior (fully baked when ``baked`` is
    given, fully traced otherwise).

    The scalar input carries [frame, row0, sample0]: row0 = this
    shard's first global pixel row; sample0 = the first counter-RNG
    sample index of this invocation's spp loop (streams are addressable
    per (pixel, frame, sample), so high-spp frames split into
    per-sample dispatches and spp shards offset their sample window).
    """
    height, width = cfg.height, cfg.width
    part = trained if trained is not None else frozenset()
    if trained is not None and baked is None:
        raise ValueError("partial baking (trained=...) needs baked tables")

    def _is_trained(key: str) -> bool:
        # with no baked tables everything is traced; with baked tables
        # and no trained set everything is constant (full bake)
        return baked is None or key in part
    env_draws = cfg.env_mode != "none" and cfg.env_sampling == "stochastic"
    unit_vec = (random_unit_vector_zangle
                if cfg.unit_vector_sampler == "zangle"
                else random_unit_vector_normalized3)

    def load_quads(quad_ref):
        """Hoist every per-quad SMEM scalar out of the bounce loop: one
        read each per kernel invocation instead of one per bounce. The
        quad family bakes/traces as a unit ("quad"): the table stores
        vertex-DERIVED cells (normal, edge cross products), so any
        trained vertex taints them all."""
        if not _is_trained("quad"):
            q = baked[0]
            return [tuple(
                Vec3(*(float(v) for v in q[qi, c:c + 3]))
                for c in (0, 3, 6, 12, 15, 21)
            ) + (float(q[qi, 24]),) for qi in range(nq)]
        out = []
        for qi in range(nq):
            out.append((
                _scalar3(quad_ref, qi, 0),    # v0
                _scalar3(quad_ref, qi, 3),    # n
                _scalar3(quad_ref, qi, 6),    # nxv01
                _scalar3(quad_ref, qi, 12),   # nxv20
                _scalar3(quad_ref, qi, 15),   # nxv02
                _scalar3(quad_ref, qi, 21),   # nxv30
                quad_ref[qi, 24],             # material index (f32)
            ))
        return out

    def load_spheres(sph_ref):
        ctr = _is_trained("sphere_centers")
        rad = _is_trained("sphere_radii")
        s = baked[1] if baked is not None else None
        return [(
            _scalar3(sph_ref, si, 0) if ctr
            else Vec3(*(float(v) for v in s[si, 0:3])),
            sph_ref[si, 3] if rad else float(s[si, 3]),
            # material index is structural, never trained
            sph_ref[si, 4] if baked is None else float(s[si, 4]),
        ) for si in range(ns)]

    def load_materials(mat_ref):
        m = baked[2] if baked is not None else None
        return [[mat_ref[mi, k] if _is_trained(MAT_FIELD_KEYS[k])
                 else float(m[mi, k]) for k in range(MAT_COLS)]
                for mi in range(nm)]

    def trace(quads, spheres, pos: Vec3, dir: Vec3):
        """Blend-chain nearest hit over all objects (TestSceneTrace
        analog): returns (dist, normal, from_inside, mat_idx_f32)."""
        best = jnp.full((bh, bw), SUPER_FAR, jnp.float32)
        normal = Vec3(jnp.zeros((bh, bw)), jnp.zeros((bh, bw)),
                      jnp.ones((bh, bw)))
        inside = jnp.zeros((bh, bw), jnp.bool_)
        mat = jnp.zeros((bh, bw), jnp.float32)

        for v0, n, nxv01, nxv20, nxv02, nxv30, mq in quads:
            ray_off = Vec3(v0.x - pos.x, v0.y - pos.y, v0.z - pos.z)
            denom = dot3(dir, n)
            denom = jnp.where(jnp.abs(denom) < 1e-12,
                              jnp.where(denom < 0, -1e-12, 1e-12), denom)
            dist = dot3(ray_off, n) / denom
            hitp = dir * dist - ray_off
            a0 = dot3(hitp, nxv01)
            a1 = dot3(hitp, nxv20)
            b0 = dot3(hitp, nxv30)
            b1 = dot3(hitp, nxv02)
            tri1 = (a0 >= 0.0) & (a1 >= 0.0) & (1.0 - a0 - a1 >= 0.0)
            tri2 = (b0 >= 0.0) & (b1 >= 0.0) & (1.0 - b0 - b1 >= 0.0)
            valid = (tri1 | tri2) & (dist > MIN_RAY_HIT_TIME) & (dist < best)

            flip = dot3(dir, n) > 0.0
            qn = Vec3(jnp.where(flip, -n.x, n.x), jnp.where(flip, -n.y, n.y),
                      jnp.where(flip, -n.z, n.z))
            best = jnp.where(valid, dist, best)
            normal = _w3(valid, qn, normal)
            # (quads never report from-inside, and they run before every
            # sphere, so no ``inside`` update is needed here)
            mat = jnp.where(valid, mq, mat)

        for c, r, ms in spheres:
            m_ = Vec3(pos.x - c.x, pos.y - c.y, pos.z - c.z)
            b = dot3(m_, dir)
            cc = dot3(m_, m_) - r * r
            discr = b * b - cc
            miss = ((cc > 0.0) & (b > 0.0)) | (discr < 0.0)
            # double-where sqrt guard (same as the oracle's _test_spheres):
            # sqrt'(0) = inf would leak NaN into the backward kernel's
            # adjoint through miss lanes; forward values are identical
            discr_safe = jnp.where(discr > 0.0, discr, 1.0)
            sq = jnp.where(discr > 0.0, jnp.sqrt(discr_safe), 0.0)
            from_in = -b < sq
            dist = jnp.where(from_in, sq, -sq) - b
            valid = (~miss) & (dist > MIN_RAY_HIT_TIME) & (dist < best)
            hit_rel = m_ + dir * dist
            sgn = jnp.where(from_in, -1.0, 1.0)
            if _const(r) is not None:
                # on-sphere point: |hit_rel| == radius exactly, so the
                # rsqrt-normalize collapses to one scale (error ~1 ulp vs
                # the oracle's normalize; strict-parity tests tolerate it)
                sn = hit_rel * (sgn * (1.0 / _const(r)))
            else:
                sn = _safe_normalize(hit_rel) * sgn
            best = jnp.where(valid, dist, best)
            normal = _w3(valid, sn, normal)
            inside = (valid & from_in) | (~valid & inside)
            mat = jnp.where(valid, ms, mat)

        return best, normal, inside, mat

    def fetch_material(materials, idx):
        """17-field material fetch (GatherMaterials analog, v4 :389-417),
        per-field:

        Constant field (every material's value is a python float — the
        whole scene baked, or the field not trained under PARTIAL
        baking): DISTINCT-VALUE grouping — (#distinct values - 1)
        selects against precomputed union masks, and a scene-wide-
        constant field becomes a python float (letting downstream
        shading code drop out at trace time).

        Traced field: broadcast-compare-select chain over NM materials
        (shared eq masks across fields)."""
        eq = {}

        def eq_mask(mi):
            if mi not in eq:
                eq[mi] = idx == float(mi)
            return eq[mi]

        union_cache = {}

        def union_mask(mis):
            key = frozenset(mis)
            if key not in union_cache:
                m = eq_mask(mis[0])
                for mi in mis[1:]:
                    m = m | eq_mask(mi)
                union_cache[key] = m
            return union_cache[key]

        fields = []
        for k in range(MAT_COLS):
            vals = [materials[mi][k] for mi in range(nm)]
            if not all(isinstance(v, (int, float)) for v in vals):
                # traced field: plain select chain in material order
                field = jnp.zeros((bh, bw), jnp.float32)
                for mi in range(nm):
                    field = jnp.where(eq_mask(mi), vals[mi], field)
                fields.append(field)
                continue
            groups = {}
            for mi in range(nm):
                groups.setdefault(vals[mi], []).append(mi)
            if len(groups) == 1:
                fields.append(next(iter(groups)))  # python float constant
                continue
            # the most common value is the base (selected by default)
            base = max(groups.items(), key=lambda kv: len(kv[1]))[0]
            field = jnp.full((bh, bw), base, jnp.float32)
            for v, mis in groups.items():
                if v != base:
                    field = jnp.where(union_mask(mis), v, field)
            fields.append(field)
        return fields

    def cam_scalar(cam_ref, i):
        # cols 0..4 = camera (trainable as the "camera" family); cols
        # 5..7 = cfg.ambient (configuration, never trained)
        if baked is not None and not (i < 5 and _is_trained("camera")):
            return float(baked[3][i])
        return cam_ref[i]

    def camera_ray_blk(cam_ref, rng, frag_x, frag_y):
        """Primary ray for the block (mainImage analog): jitter draws +
        NDC target + normalize. One call per frame in wang mode (the
        reference draws jitter ONCE and shares the ray across the spp
        loop, v4 :1109-1129); per sample in counter mode."""
        if cfg.jitter:
            jx, rng = rng.next01()
            jy, rng = rng.next01()
            fx = frag_x + (jx - 0.5)
            fy = frag_y + (jy - 0.5)
        else:
            fx, fy = frag_x, frag_y
        u = (fx / width) * 2.0 - 1.0
        v = (fy / height) * 2.0 - 1.0
        v = v * (height / width)
        # pos planes stay materialized (bh, bw) arrays even when baked:
        # they are loop-carried through VMEM scratch refs
        cam_pos = Vec3(
            jnp.full((bh, bw), cam_scalar(cam_ref, 0)),
            jnp.full((bh, bw), cam_scalar(cam_ref, 1)),
            jnp.full((bh, bw), cam_scalar(cam_ref, 2)),
        )
        target = Vec3(u, v, jnp.full(
            (bh, bw), cam_scalar(cam_ref, 4) * cam_scalar(cam_ref, 3)))
        return cam_pos, _safe_normalize(target), rng

    def make_bounce_body(quads, spheres, materials, cam_ref):
        """Build the per-segment bounce body over EXPLICIT scene values
        (lists of traced scalars/planes or baked python floats). Shared
        verbatim by the forward kernel and the backward kernel's
        replay+adjoint sweeps (kernels/backward.py), so the two can never
        drift. Estimator weights (lottery inverse-probability, roulette
        boost) are DETACHED exactly like the oracle integrator
        (render/integrator.py), which is what makes jax.vjp of this body
        the correct gradient policy."""

        def bounce_body(state):
            (ret, thr, pos, dir, alive, miss_dir, miss_thr, miss_jr,
             miss_jc, missed, rng_state) = state
            rng = rng_unflatten(rng_state)
            dist, normal, from_inside, mat_idx = trace(quads, spheres,
                                                       pos, dir)
            if env_draws:
                jr, rng = rng.next01()
                jc, rng = rng.next01()
            else:
                jr = jc = jnp.zeros((bh, bw))

            miss = dist >= SUPER_FAR
            first_miss = alive & miss
            update = alive & ~miss

            if cfg.env_mode == "none":
                # constant ambient needs no gather: add inline (correct
                # for any spp); cam_ref[5:8] carries the ambient color
                ret = Vec3(
                    jnp.where(first_miss, ret.x + cam_scalar(cam_ref, 5) * thr.x, ret.x),
                    jnp.where(first_miss, ret.y + cam_scalar(cam_ref, 6) * thr.y, ret.y),
                    jnp.where(first_miss, ret.z + cam_scalar(cam_ref, 7) * thr.z, ret.z),
                )
            miss_dir = _w3(first_miss, dir, miss_dir)
            miss_thr = _w3(first_miss, thr, miss_thr)
            miss_jr = jnp.where(first_miss, jr, miss_jr)
            miss_jc = jnp.where(first_miss, jc, miss_jc)
            missed = missed | first_miss

            f = fetch_material(materials, mat_idx)
            (al_r, al_g, al_b, em_r, em_g, em_b, spec_ch, spec_rough,
             sc_r, sc_g, sc_b, ior, refr_ch, refr_rough,
             rc_r, rc_g, rc_b) = f
            albedo = Vec3(al_r, al_g, al_b)
            emissive = Vec3(em_r, em_g, em_b)
            spec_color = Vec3(sc_r, sc_g, sc_b)
            refr_color = Vec3(rc_r, rc_g, rc_b)

            # baked-scene specialization facts (python bools; with a
            # traced scene every one of these is False and the full
            # shading pipeline is emitted)
            no_inside = ns == 0  # quads never report from-inside
            no_beer = no_inside or all(
                _is_const(c, 0.0) for c in (rc_r, rc_g, rc_b))
            never_spec = _is_const(spec_ch, 0.0)
            never_refr = _is_const(refr_ch, 0.0)
            smooth_spec = _is_const(spec_rough, 0.0)
            smooth_refr = _is_const(refr_rough, 0.0)

            d_safe = jnp.where(miss, 0.0, dist)
            from_inside_m = False if no_inside else from_inside

            # Beer absorption
            if no_beer:
                new_thr = thr
            else:
                new_thr = Vec3(
                    jnp.where(from_inside_m, thr.x * jnp.exp(-refr_color.x * d_safe), thr.x),
                    jnp.where(from_inside_m, thr.y * jnp.exp(-refr_color.y * d_safe), thr.y),
                    jnp.where(from_inside_m, thr.z * jnp.exp(-refr_color.z * d_safe), thr.z),
                )

            # Fresnel-adjusted lottery. When NO material has a specular
            # chance the whole Fresnel evaluation (sqrt + div + x^5)
            # drops out — the chances are the raw material fields.
            if never_spec:
                spec_chance = 0.0
                refr_chance = refr_ch
            else:
                has_spec = True if _const(spec_ch) else (spec_ch > 0.0)
                n1 = _wh(from_inside_m, ior, 1.0)
                n2 = _wh(from_inside_m, 1.0, ior)
                fres = fresnel_reflect_amount(n1, n2, normal, dir, spec_ch,
                                              jnp.float32(1.0))
                chance_mult = (1.0 - fres) / jnp.maximum(1.0 - spec_ch, 1e-6)
                spec_chance = _wh(has_spec, fres, spec_ch)
                refr_chance = _wh(has_spec, refr_ch * chance_mult, refr_ch)

            roll, rng = rng.next01()
            do_spec = (False if never_spec
                       else (spec_chance > 0.0) & (roll < spec_chance))
            if never_refr:
                do_refr = False
            else:
                below = roll < spec_chance + refr_chance
                gated = (refr_chance > 0.0) & below
                do_refr = gated if do_spec is False else (~do_spec) & gated

            diff_chance = (
                1.0 if never_spec and never_refr
                else jnp.maximum(1.0 - (spec_chance + refr_chance), 0.0))
            ray_prob = _wh(do_spec, spec_chance,
                           _wh(do_refr, refr_chance, diff_chance))
            if _const(ray_prob) is None:
                # estimator weight, not physics: detach like the oracle
                # (integrator.py ray_prob stop_gradient)
                ray_prob = jax.lax.stop_gradient(
                    jnp.maximum(ray_prob, MIN_RAY_PROBABILITY))
                inv_prob = 1.0 / ray_prob
            else:
                inv_prob = 1.0 / max(_const(ray_prob), MIN_RAY_PROBABILITY)

            nudge = _wh(do_refr, -RAY_POS_NORMAL_NUDGE, RAY_POS_NORMAL_NUDGE)
            new_pos = pos + dir * d_safe + normal * nudge

            unit_d, rng = unit_vec(rng)
            diffuse_dir = _safe_normalize(normal + unit_d)
            if never_spec:
                spec_dir = diffuse_dir  # unused (do_spec is False)
            else:
                spec_dir = reflect(dir, normal)
                if not smooth_spec:
                    spec_dir = spec_dir + (diffuse_dir - spec_dir) * (
                        spec_rough * spec_rough)
            # the refraction unit vector is DRAWN unconditionally (RNG
            # stream contract with the oracle) even when its math drops out
            unit_r, rng = unit_vec(rng)
            if never_refr:
                refr_dir = diffuse_dir  # unused (do_refr is False)
            else:
                eta = _wh(from_inside_m, ior, 1.0 / ior)
                refr_dir = refract(dir, normal, eta)
                if not smooth_refr:
                    refr_target = _safe_normalize(unit_r - normal)
                    refr_dir = refr_dir + (refr_target - refr_dir) * (
                        refr_rough * refr_rough)

            new_dir = _w3(do_spec, spec_dir,
                          _w3(do_refr, refr_dir, diffuse_dir))
            new_dir = _safe_normalize(new_dir)

            if all(_is_const(e, 0.0) for e in (em_r, em_g, em_b)):
                new_ret = ret
            else:
                new_ret = ret + emissive * new_thr
            color_factor = _w3(do_spec, spec_color, albedo)
            if do_refr is False:
                new_thr = new_thr * color_factor
            else:
                new_thr = Vec3(
                    jnp.where(do_refr, new_thr.x, new_thr.x * color_factor.x),
                    jnp.where(do_refr, new_thr.y, new_thr.y * color_factor.y),
                    jnp.where(do_refr, new_thr.z, new_thr.z * color_factor.z),
                )
            if _const(inv_prob) != 1.0:
                new_thr = new_thr * inv_prob

            if cfg.roulette != "off":
                p = jnp.clip(
                    jnp.maximum(new_thr.x, jnp.maximum(new_thr.y, new_thr.z)),
                    0.0, 1.0)
                rr, rng = rng.next01()
                terminated = rr > p
                # detached roulette boost (integrator.py policy)
                boost = 1.0 / jax.lax.stop_gradient(
                    jnp.maximum(p, MIN_RAY_PROBABILITY))
                new_thr = Vec3(
                    jnp.where(terminated, new_thr.x, new_thr.x * boost),
                    jnp.where(terminated, new_thr.y, new_thr.y * boost),
                    jnp.where(terminated, new_thr.z, new_thr.z * boost),
                )
                if cfg.roulette == "terminate":
                    update = update & ~terminated

            ret = _w3(update, new_ret, ret)
            thr = _w3(update, new_thr, thr)
            pos = _w3(update, new_pos, pos)
            dir = _w3(update, new_dir, dir)
            alive = update
            return (ret, thr, pos, dir, alive, miss_dir, miss_thr,
                    miss_jr, miss_jc, missed, rng_flatten(rng))

        return bounce_body

    def sample_once(quads, spheres, materials, cam_ref, scratch, rng, pos,
                    dir, allow_exit, bounce_body=None):
        """One path-trace sample from a prepared primary ray:
        returns (ret, miss_state, rng).

        ``allow_exit``: skip remaining bounce segments once every lane in
        the block is dead — the TPU analog of the reference's
        all_set(shouldBreak) early-out (v4 :731,781), at block instead of
        8-lane granularity. Skipping also skips that segment's RNG draws,
        so it is only legal when no later sample continues the same
        sequential stream (counter RNG always; wang RNG's last sample).
        Carried state lives in VMEM ``scratch`` refs so the skip is a real
        branch (pl.when) rather than a mask."""
        if bounce_body is None:
            bounce_body = make_bounce_body(quads, spheres, materials,
                                           cam_ref)
        ret = Vec3(*(jnp.zeros((bh, bw)) for _ in range(3)))
        thr = Vec3(*(jnp.ones((bh, bw)) for _ in range(3)))
        alive = jnp.ones((bh, bw), jnp.bool_)
        missed = jnp.zeros((bh, bw), jnp.bool_)
        miss_dir = Vec3(jnp.zeros((bh, bw)), jnp.zeros((bh, bw)),
                        jnp.ones((bh, bw)))
        miss_thr = Vec3(*(jnp.zeros((bh, bw)) for _ in range(3)))
        miss_jr = jnp.zeros((bh, bw))
        miss_jc = jnp.zeros((bh, bw))

        state = (ret, thr, pos, dir, alive, miss_dir, miss_thr,
                 miss_jr, miss_jc, missed, rng_flatten(rng))
        n_segments = cfg.bounces + 1

        if not allow_exit or n_segments <= 1:
            # unconditional unroll (dead lanes fully masked, not free)
            for _ in range(n_segments):
                state = bounce_body(state)
        else:
            # Mosaic crashes on while_loop/cond with big vector CARRIES,
            # but conditional SIDE EFFECTS on VMEM refs (pl.when) work:
            # park the carried state in scratch refs, run each remaining
            # segment only while any lane is still alive.
            def write_state(s):
                flat = _flatten_state(s)
                for r, v in zip(scratch, flat):
                    r[:] = v

            def read_state():
                return _unflatten_state([r[:] for r in scratch])

            state = bounce_body(state)  # segment 0 always runs
            write_state(state)
            # Group remaining segments: each pl.when runs ``gran``
            # segments between one scratch read and one write, halving
            # (gran=2) the VMEM round-trips of the carried state at the
            # cost of at most gran-1 extra dead segments per block (a
            # dead segment is an identity on all carried state except
            # the RNG, which nothing later consumes on this path).
            gran = max(1, int(getattr(cfg, "exit_granularity", 1)))
            left = n_segments - 1
            while left > 0:
                step = min(gran, left)
                left -= step
                any_alive = jnp.max(scratch[_ALIVE_SLOT][:]) > 0.0

                @pl.when(any_alive)
                def _(step=step):
                    s = read_state()
                    for _ in range(step):
                        s = bounce_body(s)
                    write_state(s)

            state = read_state()

        (ret, thr, pos, dir, alive, miss_dir, miss_thr, miss_jr,
         miss_jc, missed, rng_state) = state
        return (ret, (miss_dir, miss_thr, miss_jr, miss_jc, missed),
                rng_unflatten(rng_state))

    if export_parts:
        # the backward kernel (kernels/backward.py) builds its own
        # kernel body from these shared pieces — one physics
        # implementation for forward and adjoint
        import types

        return types.SimpleNamespace(
            make_bounce_body=make_bounce_body,
            camera_ray_blk=camera_ray_blk,
            trace=trace,
            fetch_material=fetch_material,
        )

    def kernel(frame_ref, *rest):
        if baked is not None and trained is None:
            # fully baked: no table inputs at all
            quad_ref = sph_ref = mat_ref = cam_ref = None
        else:
            quad_ref, sph_ref, mat_ref, cam_ref = rest[:4]
            rest = rest[4:]
        (r_ref, g_ref, b_ref, md_x, md_y, md_z,
         mt_x, mt_y, mt_z, jr_ref, jc_ref, missed_ref, *scratch) = rest
        bi = pl.program_id(0)
        # row0: this shard's first GLOBAL pixel row (0 single-device;
        # axis_index * rows_per_shard under shard_map) — fragCoords and
        # RNG seeds are global-pixel quantities. In flat128 mode the
        # same scalar slot carries the first GROUP index instead.
        row0 = frame_ref[1]
        samp0 = frame_ref[2].astype(jnp.uint32)
        if flat_gpr is not None:
            # flat128 layout: planes are (P/128, 128); sublane = pixel
            # group g, lane = pixel within group. row/col derive from g
            # via an exhaustively-verified multiply-shift division
            # (Mosaic has no i32 vector divide).
            gpr = flat_gpr
            k, m, s = _magic_div(gpr, (cfg.height + 1) * gpr)
            g = row0 + bi * bh + jax.lax.broadcasted_iota(
                jnp.int32, (bh, bw), 0)
            row = ((g >> k) * m) >> s
            col = ((g - row * gpr) * bw
                   + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1))
        else:
            bj = pl.program_id(1)
            row = row0 + bi * bh + jax.lax.broadcasted_iota(
                jnp.int32, (bh, bw), 0)
            col = bj * bw + jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
        fy_i = (height - 1) - row
        frag_x = col.astype(jnp.float32)
        frag_y = fy_i.astype(jnp.float32)
        frame = frame_ref[0]

        # Mosaic lacks f32->u32 casts; derive the RNG seed coords from the
        # integer iotas instead (identical values)
        fx_u = col.astype(jnp.uint32)
        fy_u = fy_i.astype(jnp.uint32)

        acc = Vec3(*(jnp.zeros((bh, bw)) for _ in range(3)))
        miss_state = None
        quads = load_quads(quad_ref)
        spheres = load_spheres(sph_ref)
        materials = load_materials(mat_ref)
        early = getattr(cfg, "early_exit", True)

        if cfg.rng == "wang":
            # python-int literals (not jnp scalars): Pallas kernels may not
            # capture traced constants
            seed = (fx_u * 1973 + fy_u * 9277
                    + frame.astype(jnp.uint32) * 26699) | 1
            rng = _SmemRng(seed)
            # jitter/ray once per frame, shared by the spp loop (v4 :1109)
            pos, dir, rng = camera_ray_blk(cam_ref, rng, frag_x, frag_y)
            for s in range(cfg.spp):
                # skipping segments skips their draws, so only the LAST
                # sample of the sequential wang stream may exit early
                ret, miss_state, rng = sample_once(
                    quads, spheres, materials, cam_ref, scratch, rng, pos,
                    dir, allow_exit=early and s == cfg.spp - 1)
                acc = acc + ret * (1.0 / cfg.spp)
        else:
            for s in range(cfg.spp):
                key0 = fx_u * 1973 + fy_u * 9277
                # broadcast: key1 is built from the (scalar) frame index but
                # rides in a (bh, bw) scratch ref across bounce segments
                key1 = jnp.broadcast_to(
                    frame.astype(jnp.uint32) * 26699
                    + (jnp.uint32(s) + samp0) * jnp.uint32(40503)
                    + jnp.uint32(1), (bh, bw))
                rng = _CtrRng(key0, key1, jnp.zeros((bh, bw), jnp.uint32))
                pos, dir, rng = camera_ray_blk(cam_ref, rng, frag_x, frag_y)
                # counter streams are per-sample: always safe to exit
                ret, miss_state, rng = sample_once(
                    quads, spheres, materials, cam_ref, scratch, rng, pos,
                    dir, allow_exit=early)
                acc = acc + ret * (1.0 / cfg.spp)

        miss_dir, miss_thr, miss_jr, miss_jc, missed = miss_state
        r_ref[:] = acc.x
        g_ref[:] = acc.y
        b_ref[:] = acc.z
        mt_x[:] = miss_thr.x
        mt_y[:] = miss_thr.y
        mt_z[:] = miss_thr.z
        missed_ref[:] = jnp.where(missed, 1.0, 0.0)
        md_x[:] = miss_dir.x
        md_y[:] = miss_dir.y
        md_z[:] = miss_dir.z
        jr_ref[:] = miss_jr
        jc_ref[:] = miss_jc

    return kernel


def _use_interpret() -> bool:
    """Interpret-mode fallback on CPU: lets the whole Pallas path run (and
    be tested for parity) without TPU hardware."""
    import jax

    return jax.default_backend() == "cpu"


def _pallas_render(scene, camera, texture, cfg: RenderConfig, frame,
                   sample0: int = 0, row0=0, local_height=None,
                   flat: bool = False, tables=None, baked_tables=None,
                   trained=None):
    """Shared pallas_call setup/dispatch; returns the raw output planes.

    ``tables``: optional pre-packed (quad_tbl, sph_tbl, mat_tbl, cam_tbl)
    — the differentiable entry (kernels/backward.py) feeds tables
    directly so gradients flow through pack_scene's transpose; baking is
    skipped (a baked scene is a compile-time constant, not a parameter)
    UNLESS ``baked_tables``+``trained`` request PARTIAL baking: numpy
    base tables plus the frozenset of trained families — only trained
    cells read from the (traced) tables, everything else is a
    compile-time constant (see _make_kernel).

    ``row0``/``local_height``: render only rows [row0, row0+local_height)
    of the global cfg.height image — the shard_map path passes each
    device's row offset (camera math and RNG seeds stay global-pixel).

    ``flat``: flat128 pixel layout — output planes are (H*W/128, 128)
    (sublane = 128-pixel group, lane = pixel), the layout that lets the
    deferred env gather keep its lane batch minor (texture._gather_sublane;
    avoids the 32x-padded narrow gather output). Requires width % 128 == 0;
    blocks are (tile_height, 128) over a 1D grid.
    """
    cfg = cfg.validate()
    if cfg.spp > 1 and cfg.env_mode != "none":
        raise NotImplementedError(
            "pallas backend: multi-sample env frames split per sample "
            "(render_frame_pallas handles this for rng='counter')"
        )
    bh, bw = cfg.tile_height, cfg.tile_width
    out_h = cfg.height if local_height is None else local_height
    if flat:
        if cfg.width % 128:
            raise ValueError("flat128 layout needs width % 128 == 0")
        bw = 128
        n_groups = out_h * cfg.width // 128
        while n_groups % bh:
            bh //= 2
    elif out_h % bh or cfg.width % bw:
        raise ValueError(
            f"render extent {cfg.width}x{out_h} not divisible by "
            f"tile {bw}x{bh}"
        )

    # bake the scene into the kernel when it is concrete (not traced):
    # the material fetch collapses to distinct-value selects and shading
    # paths the scene cannot exercise drop out (see _make_kernel)
    import numpy as np
    from jax.core import Tracer

    a = cfg.ambient
    if tables is not None:
        quad_tbl, sph_tbl, mat_tbl, cam_tbl = tables
        nq, ns, nm = quad_tbl.shape[0], sph_tbl.shape[0], mat_tbl.shape[0]
        bake = False
        baked = baked_tables if trained is not None else None
    else:
        concrete = not any(
            isinstance(leaf, Tracer)
            for leaf in jax.tree.leaves((scene, camera)))
        bake = bool(getattr(cfg, "bake_scene", False)) and concrete

    if tables is not None:
        pass
    elif bake:
        with jax.ensure_compile_time_eval():
            quad_tbl, sph_tbl, mat_tbl = pack_scene(scene)
        nq, ns, nm = quad_tbl.shape[0], sph_tbl.shape[0], mat_tbl.shape[0]
        cam_np = np.array([
            float(camera.position.x), float(camera.position.y),
            float(camera.position.z), float(camera.distance),
            float(camera.forward_z), a[0], a[1], a[2]], np.float32)
        baked = (np.asarray(quad_tbl), np.asarray(sph_tbl),
                 np.asarray(mat_tbl), cam_np)
    else:
        quad_tbl, sph_tbl, mat_tbl = pack_scene(scene)
        nq, ns, nm = quad_tbl.shape[0], sph_tbl.shape[0], mat_tbl.shape[0]
        cam_tbl = pack_camera(camera, cfg)
        baked = None

    gpr = cfg.width // 128 if flat else None
    kernel = _make_kernel(cfg, nq, ns, nm, bh, bw, baked=baked,
                          flat_gpr=gpr, trained=trained)
    if flat:
        grid = (n_groups // bh,)
        smem = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                          memory_space=pltpu.SMEM)
        blk = pl.BlockSpec((bh, bw), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        plane = jax.ShapeDtypeStruct((n_groups, bw), jnp.float32)
    else:
        grid = (out_h // bh, cfg.width // bw)
        smem = lambda shape: pl.BlockSpec(shape,
                                          lambda i, j: (0,) * len(shape),
                                          memory_space=pltpu.SMEM)
        blk = pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
        plane = jax.ShapeDtypeStruct((out_h, cfg.width), jnp.float32)

    n_rng = 1 if cfg.rng == "wang" else 3
    scratch_shapes = (
        [pltpu.VMEM((bh, bw), jnp.float32)] * _N_F32_SLOTS
        + [pltpu.VMEM((bh, bw), jnp.uint32)] * n_rng
    )

    scalars = jnp.stack([jnp.asarray(frame, jnp.int32).reshape(()),
                         jnp.asarray(row0, jnp.int32).reshape(()),
                         jnp.asarray(sample0, jnp.int32).reshape(())])
    if baked is not None and trained is None:
        in_specs = [smem((3,))]
        args = (scalars,)
    else:
        in_specs = [
            smem((3,)),
            smem((nq, QUAD_COLS)),
            smem((ns, SPH_COLS)),
            smem((nm, MAT_COLS)),
            smem((8,)),
        ]
        args = (scalars, quad_tbl, sph_tbl, mat_tbl, cam_tbl)

    out_specs = [blk] * 12
    out_shape = [plane] * 12

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=_use_interpret(),
    )(*args)


def render_frame_pallas(scene, camera, texture, cfg: RenderConfig,
                        frame, spp_offset: int = 0, row0=0,
                        local_height=None, packed: bool = False):
    """Pallas-backed frame render; signature-compatible with
    render_frame. The deferred env gather + final add runs in XLA after
    the kernel.

    spp > 1 with an env map: the deferred miss-state is per sample, so
    the frame splits into one kernel dispatch + env gather PER SAMPLE —
    addressable counter-RNG streams make each sample independent
    (rng="counter" required; the wang stream is sequential across the
    sample loop and cannot split).

    ``spp_offset``/``row0``/``local_height``: sharding hooks — this
    shard's first counter-RNG sample index and its global pixel-row
    window (parallel/shard.py passes axis_index-derived values).
    """
    cfg = cfg.validate()
    # spp_offset may be a traced axis_index under shard_map; only the
    # static case is checkable here (shard.py enforces counter RNG for
    # sharded spp)
    if isinstance(spp_offset, int) and spp_offset and cfg.rng != "counter":
        raise ValueError("spp_offset requires rng='counter'")
    if cfg.spp > 1 and cfg.env_mode != "none":
        if cfg.rng != "counter":
            raise NotImplementedError(
                "pallas backend: spp>1 with an env map needs "
                "rng='counter' (per-sample addressable streams); the "
                "sequential wang stream cannot split across dispatches")
        one = cfg.replace(spp=1)
        acc = None
        for s in range(cfg.spp):
            c = _env_combined(scene, camera, texture, one, frame,
                              sample0=spp_offset + s, row0=row0,
                              local_height=local_height, packed=packed)
            if acc is None:
                acc = c
            elif packed:
                acc = acc + c
            else:
                acc = Vec3(acc.x + c.x, acc.y + c.y, acc.z + c.z)
        inv = 1.0 / cfg.spp
        return acc * inv if packed else Vec3(
            acc.x * inv, acc.y * inv, acc.z * inv)
    return _env_combined(scene, camera, texture, cfg, frame,
                         sample0=spp_offset, row0=row0,
                         local_height=local_height, packed=packed)


def supports_fused_combine(cfg: RenderConfig) -> bool:
    """True when render_accumulate_pallas applies: the pallas+env frame
    step that keeps the deferred env gather CHANNEL-MAJOR (texture._gather
    writes (4, ...) planar planes directly — the cheapest measured
    consumption path, scripts/combine_paths_bench.py) and, for spp > 1,
    runs one kernel + one gather PER SAMPLE combined incrementally (a
    single batched gather over all samples OOMs; see
    render_accumulate_pallas). packed4 accumulation keeps the legacy
    packed-combine path (render_frame_pallas packed=True) — the fused
    step emits planar Vec3 color only."""
    return (
        cfg.backend == "pallas"
        and cfg.env_mode != "none"
        and not cfg.packed_accum
        and (cfg.spp == 1 or cfg.rng == "counter")
    )


def render_accumulate_pallas(scene, camera, texture, cfg: RenderConfig,
                             frame, accum, packed_table=None):
    """One progressive frame: megakernel -> deferred env resolve ->
    progressive accumulate onto the donated planar accum planes.

    spp == 1 delegates to render_frame_pallas (whose deferred env lookup
    is already the planar channel-major gather) + accumulate. spp > 1
    (counter RNG) runs one kernel dispatch + one gather per sample inside
    the single jitted step and resolves all samples with one elementwise
    combine (per-sample gathers on purpose: see the OOM note below).

    ``packed_table`` is accepted for call-site compatibility (the table
    stack is hoisted by XLA loop-invariant code motion either way).
    """
    from cpuperformanceraytracer_tpu.render.frame import accumulate_frame
    from cpuperformanceraytracer_tpu.texture.texture import (
        _gather,
        env_texel_flat_index,
    )

    cfg = cfg.validate()
    flat = cfg.flat_accum
    if cfg.env_mode == "none" or (cfg.spp == 1 and not flat):
        color = render_frame_pallas(scene, camera, texture, cfg, frame)
        return accumulate_frame(accum, color, frame)

    if cfg.spp > 1 and cfg.rng != "counter":
        raise NotImplementedError(
            "batched multi-sample env frames need rng='counter' (the "
            "wang stream is sequential across the sample loop)")

    from cpuperformanceraytracer_tpu.texture.texture import _gather_sublane

    one = cfg.replace(spp=1)
    gather = _gather_sublane if flat else _gather
    # one kernel + one gather PER SAMPLE, combined INCREMENTALLY: XLA
    # materializes a narrow (queries, 4) gather intermediate padded
    # 4->128 lanes (32x HBM), so a single stacked gather over all
    # samples would allocate spp x that — 15.8 GB (an OOM) at 16-sample
    # 1080p — and even per-sample planes summed at the END would keep
    # spp x 12 planes live at once. The running sum frees each sample's
    # planes as soon as its contribution is added.
    color = None
    for s in range(cfg.spp):
        outs = _pallas_render(scene, camera, texture, one, frame,
                              sample0=s, flat=flat)
        (r, g, b, mdx, mdy, mdz, mtx, mty, mtz, jr, jc, missed) = outs
        idx = env_texel_flat_index(texture, Vec3(mdx, mdy, mdz), cfg,
                                   jr, jc)
        env = gather(texture, idx)
        contrib = Vec3(r + env.x * mtx, g + env.y * mty, b + env.z * mtz)
        color = contrib if color is None else Vec3(
            color.x + contrib.x, color.y + contrib.y, color.z + contrib.z)
    if cfg.spp > 1:
        inv = 1.0 / cfg.spp
        color = Vec3(color.x * inv, color.y * inv, color.z * inv)
    return accumulate_frame(accum, color, frame)


def _env_combined(scene, camera, texture, cfg, frame, sample0=0, row0=0,
                  local_height=None, packed=False):
    """One spp<=1-per-dispatch render + deferred env combine.

    ``packed``: return one (H, W, 4) RGBX array instead of Vec3 planes —
    the env gather's packed texels are consumed in their own layout,
    skipping the per-frame channel-unpack copy (config.accum_layout)."""
    outs = _pallas_render(scene, camera, texture, cfg, frame,
                          sample0=sample0, row0=row0,
                          local_height=local_height)
    (r, g, b, mdx, mdy, mdz, mtx, mty, mtz, jr, jc, missed) = outs

    if cfg.env_mode == "none":
        # ambient already added in-kernel (constant, no gather needed)
        if packed:
            return jnp.stack([r, g, b, jnp.zeros_like(r)], axis=-1)
        return Vec3(r, g, b)

    # a never-missed pixel has miss_throughput == 0, so no mask is
    # needed: env * 0 == 0 (env is finite for the default miss state)
    miss_dir = Vec3(mdx, mdy, mdz)
    if packed:
        from cpuperformanceraytracer_tpu.texture.texture import (
            sample_environment_deferred_packed,
        )

        env4 = sample_environment_deferred_packed(texture, miss_dir, cfg,
                                                  jr, jc)
        zero = jnp.zeros_like(r)
        rgb4 = jnp.stack([r, g, b, zero], axis=-1)
        thr4 = jnp.stack([mtx, mty, mtz, zero], axis=-1)
        return rgb4 + env4 * thr4
    env = sample_environment_deferred(texture, miss_dir, cfg, jr, jc)
    return Vec3(r + env.x * mtx, g + env.y * mty, b + env.z * mtz)

"""Texture pytree + equirect/cubemap/env sampling.

Re-derivation of texture.{h,cpp}: the reference's
``_mm256_i32gather_ps`` channel gathers become flat-index jnp gathers
(scalar per ray, vectorized by vmap); the branchless max-axis cubemap
face select (texture.cpp:275-404) and the stochastic jittered-nearest
"bilinear" (TexelSampleRandom, texture.cpp:78-86) are reproduced
exactly, draws included, so RNG streams line up with the oracle.

Cubemap layout matches LoadCubemapTexture (asset_loading.cpp:18-44): six
W x H faces stacked vertically into one W x 6H texture, face order
px, nx, py, ny, pz, nz (v offsets 0..5/6).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cpuperformanceraytracer_tpu.core.vecmath import Vec2, Vec3, dot3, lerp, saturate
from cpuperformanceraytracer_tpu.texture.hdr import read_hdr


class Texture(NamedTuple):
    """f32 RGB texture stored as three flat (H*W,) channel planes.

    The SoA planes mirror the reference's channel-base-pointer layout
    (texture.cpp:16-27); gathers do NOT read them separately. On TPU a
    gather's cost is per QUERY, not per element, so ``_gather`` stacks
    the planes into loop-invariant (H*W, 3) rows (hoisted by XLA) and
    row-gathers once — measured ~5x faster than three rank-1 channel
    takes (see ``_gather``).
    """

    r: jnp.ndarray
    g: jnp.ndarray
    b: jnp.ndarray
    width: int
    height: int


def texture_from_array(rgb) -> Texture:
    rgb = np.asarray(rgb, np.float32)
    h, w, _ = rgb.shape
    flat = rgb.reshape(-1, 3)
    return Texture(
        r=jnp.asarray(flat[:, 0]),
        g=jnp.asarray(flat[:, 1]),
        b=jnp.asarray(flat[:, 2]),
        width=w,
        height=h,
    )


def load_texture(path: str) -> Texture:
    """LoadTexture analog (asset_loading.cpp:9-16): HDR with vertical flip."""
    return texture_from_array(read_hdr(path, flip_vertical=True))


def load_cubemap_texture(paths) -> Texture:
    """Six faces (px, nx, py, ny, pz, nz) stacked vertically
    (asset_loading.cpp:18-44)."""
    faces = [read_hdr(p, flip_vertical=True) for p in paths]
    h, w, _ = faces[0].shape
    for f in faces:
        if f.shape != (h, w, 3):
            raise ValueError("cubemap faces must share one resolution")
    return texture_from_array(np.concatenate(faces, axis=0))


# max queries per gather op: XLA materializes a (queries, 4) gather
# intermediate physically padded 4->128 lanes (32x), i.e. ~512 MB per
# 1M queries — chunking big gathers (4K frames, multi-sample batches)
# bounds that temp and lets XLA free it between chunks. 1M keeps the
# 720p headline frame (921600 queries) in a single unchunked gather.
_GATHER_CHUNK = 1 << 20


def _gather(tex: Texture, flat_idx) -> Vec3:
    """One channel-major gather: (4, *idx.shape) planar texel planes.

    On TPU, XLA lowers a gather to a per-QUERY loop, so cost scales with
    queries, not elements — and the row stride decides the rate: 16-byte
    power-of-two rows are the fast path ((N,3) rows are 26x slower,
    scripts/gather_microbench.py). The remaining question is the OUTPUT
    layout: a (N, 4) row-gather output is channel-minor and every
    consumer wants planar, so XLA inserts a ~0.6 ms/frame retile at 720p
    no matter how it is consumed (relayout copy, dense reshape for a
    lane-shuffle kernel, or slice fusions — all measured within 0.1 ms
    of each other, scripts/combine_paths_bench.py). Leading with the
    offset dim (operand (4, N), offset_dims=(0,)) makes the gather WRITE
    planar (4, ...) planes directly — the transpose rides inside the
    gather op itself and measures cheapest end-to-end, and the per-plane
    slices below are free views."""
    if flat_idx.ndim >= 2 and flat_idx.size > _GATHER_CHUNK:
        rows = flat_idx.shape[0]
        per_row = flat_idx.size // rows
        step = max(1, _GATHER_CHUNK // per_row)
        parts = [_gather(tex, flat_idx[i:i + step])
                 for i in range(0, rows, step)]
        return Vec3(*(jnp.concatenate([getattr(p, c) for p in parts],
                                      axis=0) for c in "xyz"))
    tt = jnp.stack(
        [tex.r, tex.g, tex.b, jnp.zeros_like(tex.r)], axis=0)  # (4, N)
    out = jax.lax.gather(
        tt, flat_idx[..., None],
        dimension_numbers=jax.lax.GatherDimensionNumbers(
            offset_dims=(0,), collapsed_slice_dims=(1,),
            start_index_map=(1,)),
        slice_sizes=(4, 1),
        mode=jax.lax.GatherScatterMode.CLIP,
    )
    return Vec3(out[0], out[1], out[2])


def _gather_sublane(tex: Texture, idx) -> Vec3:
    """Lane-batched gather for flat128 layouts: ``idx`` (..., 128) ->
    Vec3 of (..., 128) planes.

    Key memory fact (measured via an OOM dump, v5e): any gather output
    whose MINOR dim is the 4-texel row is physically padded 4->128 by
    the T(8,128) tiling — a 32x HBM expansion that the gather writes and
    the consumer re-reads (~450 MB and ~0.6 ms/frame at 720p; 15.8 GB —
    an outright OOM — for a 16-sample 1080p batch). Placing the channel
    dim SECOND-minor (output (..., 4, 128), offset_dims=(ndim-1,)) pads
    only 4->8 sublanes (2x), and the per-channel sublane slices fuse
    into elementwise consumers. Requires the caller to run in the
    flat (P/128, 128) pixel layout so the 128-lane batch is minor.
    """
    tt = jnp.stack(
        [tex.r, tex.g, tex.b, jnp.zeros_like(tex.r)], axis=-1)  # (N, 4)
    out = jax.lax.gather(
        tt, idx[..., None],
        dimension_numbers=jax.lax.GatherDimensionNumbers(
            offset_dims=(idx.ndim - 1,), collapsed_slice_dims=(0,),
            start_index_map=(0,)),
        slice_sizes=(1, 4),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # (..., 4, 128)
    return Vec3(out[..., 0, :], out[..., 1, :], out[..., 2, :])


def _gather_packed(tex: Texture, flat_idx) -> jnp.ndarray:
    """Row-gather returning the raw packed (..., 4) RGBX texels.

    Slicing the packed gather output into channel planes costs an XLA
    layout copy (~0.6 ms/frame at 720p on v5e, docs/PERFORMANCE.md), so
    the frame path keeps the env radiance packed all the way through
    accumulation (scripts/combine_microbench.py) and only unpacks at
    image-write time. The pad channel is always 0."""
    rgb = jnp.stack(
        [tex.r, tex.g, tex.b, jnp.zeros_like(tex.r)], axis=-1)
    return jnp.take(rgb, flat_idx, axis=0)


def texel_fetch(tex: Texture, row, col) -> Vec3:
    """Clamped integer texel fetch (TexelFetch, texture.cpp:6-14)."""
    row = jnp.clip(row, 0, tex.height - 1)
    col = jnp.clip(col, 0, tex.width - 1)
    return _gather(tex, row * tex.width + col)


def sample_nearest(tex: Texture, uv: Vec2) -> Vec3:
    """Truncating nearest fetch at uv*(dim-1)
    (EquirectangularTextureSampleGather inner math, texture.cpp:144-163)."""
    row = (uv.y * (tex.height - 1)).astype(jnp.int32)
    col = (uv.x * (tex.width - 1)).astype(jnp.int32)
    return texel_fetch(tex, row, col)


def sample_bilinear(tex: Texture, uv: Vec2) -> Vec3:
    """Four-tap bilinear (TexelSampleBilinear, texture.cpp:39-76).

    Uses floor/ceil of uv*(dim-1) like the reference (so du/dv come from
    the floor corner and the ceil tap can alias the same texel on exact
    integer coordinates).
    """
    row = uv.y * (tex.height - 1)
    col = uv.x * (tex.width - 1)
    r0 = jnp.floor(row)
    r1 = jnp.ceil(row)
    c0 = jnp.floor(col)
    c1 = jnp.ceil(col)
    dv = row - r0
    du = col - c0

    r0i = r0.astype(jnp.int32)
    r1i = r1.astype(jnp.int32)
    c0i = c0.astype(jnp.int32)
    c1i = c1.astype(jnp.int32)

    c00 = texel_fetch(tex, r0i, c0i)
    c10 = texel_fetch(tex, r0i, c1i)
    c01 = texel_fetch(tex, r1i, c0i)
    c11 = texel_fetch(tex, r1i, c1i)

    top = c00 + (c10 - c00) * du
    bot = c01 + (c11 - c01) * du
    return top + (bot - top) * dv


def stochastic_flat_index(tex: Texture, uv: Vec2, jr, jc):
    """Flat texel index of the stochastic single-tap (jittered nearest,
    TexelSampleRandom, texture.cpp:78-86)."""
    row = uv.y * (tex.height - 1)
    col = uv.x * (tex.width - 1)
    rand_row = jnp.floor(row + jr).astype(jnp.int32)
    rand_col = jnp.floor(col + jc).astype(jnp.int32)
    return rand_row * tex.width + rand_col


def sample_stochastic_with_jitter(tex: Texture, uv: Vec2, jr, jc) -> Vec3:
    """Stochastic single-tap with caller-provided jitter pair in [0,1)^2.

    Split out from :func:`sample_stochastic` so call sites can DRAW the
    jitter inside the bounce loop (keeping the RNG stream contract) but
    defer the actual gather to once per path — each path consumes env
    radiance at most once, at its first miss (see
    render/integrator.py deferred-environment note).
    """
    return _gather(tex, stochastic_flat_index(tex, uv, jr, jc))


def sample_stochastic(tex: Texture, uv: Vec2, rng):
    """Single-tap stochastic bilinear: jittered nearest, 2 draws
    (TexelSampleRandom, texture.cpp:78-86). In expectation this equals
    bilinear filtering, and it is the reference's default env-map path —
    which happens to be the ideal TPU shape too (one gather, no
    neighborhood taps)."""
    jr, rng = rng.next01()
    jc, rng = rng.next01()
    return sample_stochastic_with_jitter(tex, uv, jr, jc), rng


_INV_ATAN = (0.1591, 0.3183)  # (1/2pi, 1/pi), texture.cpp:145


def equirect_uv(direction: Vec3) -> Vec2:
    """Direction -> equirect uv: fract((atan2(z,x), asin(y)) * invAtan + .5)
    then saturate (EquirectangularTextureSampleRandom, texture.cpp:186-203)."""
    u = jnp.arctan2(direction.z, direction.x) * _INV_ATAN[0] + 0.5
    v = jnp.arcsin(jnp.clip(direction.y, -1.0, 1.0)) * _INV_ATAN[1] + 0.5
    u = u - jnp.floor(u)
    v = v - jnp.floor(v)
    return Vec2(saturate(u), saturate(v))


def cubemap_uv(direction: Vec3) -> Vec2:
    """Branchless max-axis cubemap face select onto the vertical-cross
    stacked texture (CubemapTextureSampleBilinear, texture.cpp:275-339).

    Face priority on ties replicates the reference's blend order:
    X faces, overridden by Y when |y| >= |x|, overridden by Z when
    |z| >= |x| and |z| >= |y|.
    """
    d = direction
    ax, ay, az = jnp.abs(d.x), jnp.abs(d.y), jnp.abs(d.z)

    # X faces
    xgt0 = d.x >= 0.0
    face_u = jnp.where(xgt0, -d.z, d.z)
    face_v = d.y
    v_off = jnp.where(xgt0, 0.0, 1.0 / 6.0)

    # Y faces override when |y| >= |x|
    ygt0 = d.y >= 0.0
    y_u = d.x
    y_v = jnp.where(ygt0, -d.z, d.z)
    y_off = jnp.where(ygt0, 2.0 / 6.0, 3.0 / 6.0)
    ygtx = ay >= ax
    face_u = jnp.where(ygtx, y_u, face_u)
    face_v = jnp.where(ygtx, y_v, face_v)
    v_off = jnp.where(ygtx, y_off, v_off)

    # Z faces override when |z| >= |x| and |z| >= |y|
    zgt0 = d.z >= 0.0
    z_u = jnp.where(zgt0, d.x, -d.x)
    z_v = d.y
    z_off = jnp.where(zgt0, 4.0 / 6.0, 5.0 / 6.0)
    maxz = (az >= ax) & (az >= ay)
    face_u = jnp.where(maxz, z_u, face_u)
    face_v = jnp.where(maxz, z_v, face_v)
    v_off = jnp.where(maxz, z_off, v_off)

    max_abs = jnp.maximum(ax, jnp.maximum(ay, az))
    u = saturate(face_u / max_abs * 0.5 + 0.5)
    v = saturate(face_v / max_abs * 0.5 + 0.5)
    v = saturate(v * (1.0 / 6.0) + v_off)
    return Vec2(u, v)


def sample_equirect(tex: Texture, direction: Vec3, mode: str, rng=None):
    uv = equirect_uv(direction)
    if mode == "stochastic":
        return sample_stochastic(tex, uv, rng)
    if mode == "bilinear":
        return sample_bilinear(tex, uv), rng
    return sample_nearest(tex, uv), rng


def sample_cubemap(tex: Texture, direction: Vec3, mode: str, rng=None):
    uv = cubemap_uv(direction)
    if mode == "stochastic":
        return sample_stochastic(tex, uv, rng)
    if mode == "bilinear":
        return sample_bilinear(tex, uv), rng
    return sample_nearest(tex, uv), rng


def env_draws_per_bounce(tex, cfg) -> int:
    """RNG draws the env path consumes per bounce iteration (the stream
    contract, see integrator draw-order table)."""
    if cfg.env_mode == "none" or tex is None or cfg.env_sampling != "stochastic":
        return 0
    return 2


def sample_environment_deferred(tex, direction: Vec3, cfg, jr, jc) -> Vec3:
    """Miss-radiance lookup with pre-drawn jitter (jr/jc ignored unless
    stochastic). Used by the deferred once-per-path env lookup."""
    if cfg.env_mode == "none" or tex is None:
        a = cfg.ambient
        return Vec3(jnp.float32(a[0]), jnp.float32(a[1]), jnp.float32(a[2]))
    if cfg.env_mode == "equirect":
        d = Vec3(-direction.x, direction.y, -direction.z) if cfg.env_flip_xz else direction
        uv = equirect_uv(d)
    else:
        uv = cubemap_uv(direction)
    if cfg.env_sampling == "stochastic":
        return sample_stochastic_with_jitter(tex, uv, jr, jc)
    if cfg.env_sampling == "bilinear":
        return sample_bilinear(tex, uv)
    return sample_nearest(tex, uv)


def sample_environment_deferred_packed(tex, direction: Vec3, cfg, jr, jc):
    """Packed (..., 4) RGBX variant of :func:`sample_environment_deferred`
    — identical taps and math, but the gathered texels stay in the
    gather's packed row layout (pad channel 0) so the caller can combine
    and accumulate without the per-frame channel-unpack copy."""
    if cfg.env_mode == "equirect":
        d = (Vec3(-direction.x, direction.y, -direction.z)
             if cfg.env_flip_xz else direction)
        uv = equirect_uv(d)
    else:
        uv = cubemap_uv(direction)
    if cfg.env_sampling == "stochastic":
        return _gather_packed(tex, stochastic_flat_index(tex, uv, jr, jc))
    if cfg.env_sampling == "bilinear":
        row = uv.y * (tex.height - 1)
        col = uv.x * (tex.width - 1)
        r0, r1 = jnp.floor(row), jnp.ceil(row)
        c0, c1 = jnp.floor(col), jnp.ceil(col)
        dv = (row - r0)[..., None]
        du = (col - c0)[..., None]

        def tap(r, c):
            r = jnp.clip(r.astype(jnp.int32), 0, tex.height - 1)
            c = jnp.clip(c.astype(jnp.int32), 0, tex.width - 1)
            return _gather_packed(tex, r * tex.width + c)

        c00, c10 = tap(r0, c0), tap(r0, c1)
        c01, c11 = tap(r1, c0), tap(r1, c1)
        top = c00 + (c10 - c00) * du
        bot = c01 + (c11 - c01) * du
        return top + (bot - top) * dv
    row = jnp.clip((uv.y * (tex.height - 1)).astype(jnp.int32),
                   0, tex.height - 1)
    col = jnp.clip((uv.x * (tex.width - 1)).astype(jnp.int32),
                   0, tex.width - 1)
    return _gather_packed(tex, row * tex.width + col)


def bilinear_resample(rgb: np.ndarray, out_width: int,
                      out_height: int) -> np.ndarray:
    """Pixel-center bilinear resample of an (H, W, 3) image
    (BilinearResampleRGB32 analog, texture.cpp:406-479).

    The reference version is an unused helper whose indexing is buggy
    (row stride ``InWidth-1`` and a transposed output index); this is the
    intended pixel-center semantics — sample at (col+0.5)/out_w scaled
    into source texel space, lerp the 2x2 neighborhood, clamp edge taps.
    """
    src = np.asarray(rgb, np.float32)
    h, w = src.shape[:2]
    u = (np.arange(out_width, dtype=np.float32) + 0.5) / out_width * w - 0.5
    v = (np.arange(out_height, dtype=np.float32) + 0.5) / out_height * h - 0.5
    u0 = np.clip(np.floor(u).astype(np.int64), 0, w - 1)
    v0 = np.clip(np.floor(v).astype(np.int64), 0, h - 1)
    u1 = np.minimum(u0 + 1, w - 1)
    v1 = np.minimum(v0 + 1, h - 1)
    du = np.clip(u - u0, 0.0, 1.0)[None, :, None]
    dv = np.clip(v - v0, 0.0, 1.0)[:, None, None]
    c00 = src[v0[:, None], u0[None, :]]
    c10 = src[v0[:, None], u1[None, :]]
    c01 = src[v1[:, None], u0[None, :]]
    c11 = src[v1[:, None], u1[None, :]]
    top = c00 + (c10 - c00) * du
    bot = c01 + (c11 - c01) * du
    return top + (bot - top) * dv


def env_texel_flat_index(tex, direction: Vec3, cfg, jr, jc):
    """Flat texel index of the deferred env lookup (stochastic or
    nearest sampling only — bilinear needs 4 taps + planar lerp weights).
    Matches sample_environment_deferred's tap exactly."""
    if cfg.env_mode == "equirect":
        d = (Vec3(-direction.x, direction.y, -direction.z)
             if cfg.env_flip_xz else direction)
        uv = equirect_uv(d)
    else:
        uv = cubemap_uv(direction)
    if cfg.env_sampling == "stochastic":
        return stochastic_flat_index(tex, uv, jr, jc)
    # nearest: truncation + clamp, as texel_fetch/sample_nearest
    row = jnp.clip((uv.y * (tex.height - 1)).astype(jnp.int32),
                   0, tex.height - 1)
    col = jnp.clip((uv.x * (tex.width - 1)).astype(jnp.int32),
                   0, tex.width - 1)
    return row * tex.width + col


def packed_texel_table(tex: Texture):
    """(H*W, 4) gather table of [r, g, b, 0] rows (16-byte rows are the
    fast gather shape; see _gather)."""
    return jnp.stack(
        [tex.r, tex.g, tex.b, jnp.zeros_like(tex.r)], axis=-1)


def sample_environment(tex, direction: Vec3, cfg, rng) -> Tuple[Vec3, object]:
    """Miss-radiance lookup with the v4 conventions.

    env_mode none -> constant ambient (v4 :905 / scalar :307);
    equirect -> optional (-x, y, -z) flip first (v4 :758-759);
    cubemap -> unflipped direction (v4 :747-755).
    Consumes 2 rng draws iff stochastic sampling with a texture —
    call sites rely on this draw-count contract for stream alignment.
    """
    if cfg.env_mode == "none" or tex is None:
        a = cfg.ambient
        return Vec3(jnp.float32(a[0]), jnp.float32(a[1]), jnp.float32(a[2])), rng
    if cfg.env_mode == "equirect":
        d = Vec3(-direction.x, direction.y, -direction.z) if cfg.env_flip_xz else direction
        return sample_equirect(tex, d, cfg.env_sampling, rng)
    return sample_cubemap(tex, direction, cfg.env_sampling, rng)

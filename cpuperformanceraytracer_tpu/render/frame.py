"""Frame-level orchestration: fragCoord grids, vmap over pixels,
progressive accumulation, postprocess.

Replaces the reference's L4 orchestrator (DemofoxRenderOptV4 + RenderTile,
demofox_path_tracing_optimization_v4.cpp:1696-1721, 1179-1258): the
150-work-item tile fan-out becomes one vmap over all pixels that XLA
tiles onto the VPU itself; the tile-contiguous buffer layout trick is
dropped entirely (XLA picks layouts). Accumulation keeps the reference's
progressive running mean c += (new - c) / (n+1) (:1199-1241).

Image convention: arrays are (H, W), row 0 = top. fragCoord.y is
flipped (fragCoord.y = H-1-row) exactly like the reference's top-down
buffer walk (DemofoxRenderScalar, demofox_path_tracing_scalar.cpp:803).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from cpuperformanceraytracer_tpu.config import RenderConfig
from cpuperformanceraytracer_tpu.core.color import postprocess_color, to_u8
from cpuperformanceraytracer_tpu.core.vecmath import Vec3
from cpuperformanceraytracer_tpu.render.integrator import render_pixel


def _frag_coords(cfg: RenderConfig):
    """Flat (P,) f32 fragCoord arrays, row-major from the top-left pixel."""
    cols = jnp.arange(cfg.width, dtype=jnp.float32)
    rows = jnp.arange(cfg.height, dtype=jnp.float32)
    frag_y = (cfg.height - 1) - rows  # flip: fragCoord y is bottom-up
    fy, fx = jnp.meshgrid(frag_y, cols, indexing="ij")
    return fx.reshape(-1), fy.reshape(-1)


def render_frame(scene, camera, texture, cfg: RenderConfig, frame) -> Vec3:
    """One frame of cfg.spp samples for every pixel -> Vec3 of (H, W)."""
    fx, fy = _frag_coords(cfg)
    pixel_fn = lambda x, y: render_pixel(scene, camera, texture, cfg, x, y, frame)
    color = jax.vmap(pixel_fn)(fx, fy)
    return Vec3(
        color.x.reshape(cfg.height, cfg.width),
        color.y.reshape(cfg.height, cfg.width),
        color.z.reshape(cfg.height, cfg.width),
    )


def accumulate_frame(accum, frame_color, frame):
    """Progressive running mean over frames: accum_n = accum + (x-accum)/(n+1)
    with frame 0-based (RenderTile blend, v4 :1199-1241 — the reference's
    1-based iFrame halves its very first frame into a zero buffer; here
    frame 0 stores the first frame exactly).

    Works on either accumulation layout (config.accum_layout): Vec3 of
    (H, W) planes, or one packed (H, W, 4) RGBX array — the per-channel
    math is identical, so the two layouts stay bit-equal."""
    blend = 1.0 / (jnp.float32(frame) + 1.0)
    if not isinstance(accum, Vec3):
        return accum + (frame_color - accum) * blend
    return Vec3(
        accum.x + (frame_color.x - accum.x) * blend,
        accum.y + (frame_color.y - accum.y) * blend,
        accum.z + (frame_color.z - accum.z) * blend,
    )


def accum_to_vec3(accum, cfg: Optional[RenderConfig] = None) -> Vec3:
    """Any accumulation layout -> Vec3 of (H, W) planes (packed/flat
    layouts pay their one unpack/retile copy here, at image-write time).
    ``cfg`` is needed to unflatten flat128 planes; without it, planes
    are returned in whatever 2D shape they carry."""
    if isinstance(accum, Vec3):
        if (cfg is not None
                and accum.x.shape != (cfg.height, cfg.width)):
            shape = (cfg.height, cfg.width)
            return Vec3(accum.x.reshape(shape), accum.y.reshape(shape),
                        accum.z.reshape(shape))
        return accum
    return Vec3(accum[..., 0], accum[..., 1], accum[..., 2])


def postprocess_image(accum, exposure: float = 1.0,
                      cfg: Optional[RenderConfig] = None) -> jnp.ndarray:
    """f32 accumulation (any layout) -> display u8 (H, W, 3):
    exposure, ACES, sRGB, round (OutputToScreen/OutputToFile,
    v4 :1260-1331, without the BGRA/RGBA packing games — callers pick
    channel order at IO time)."""
    return to_u8(postprocess_color(accum_to_vec3(accum, cfg), exposure))


def _make_render(cfg: RenderConfig, backend: Optional[str],
                 static_scene, static_camera):
    """(scene, camera, texture, frame) -> color, resolving backend and
    scene baking. When cfg.bake_scene and a concrete scene/camera pair is
    supplied, the returned fn IGNORES its scene/camera arguments and uses
    the baked ones (compile-time constants inside the Pallas kernel)."""
    if (backend or cfg.backend) == "pallas":
        from cpuperformanceraytracer_tpu.kernels.megakernel import (
            render_frame_pallas,
        )

        packed = cfg.packed_accum
        if cfg.bake_scene and static_scene is not None:
            return lambda s, c, t, f: render_frame_pallas(
                static_scene, static_camera, t, cfg, f, packed=packed)
        return lambda s, c, t, f: render_frame_pallas(s, c, t, cfg, f,
                                                      packed=packed)
    return lambda s, c, t, f: render_frame(s, c, t, cfg, f)


def _fused_step(cfg: RenderConfig, static_scene, static_camera):
    """The pallas+env frame step (megakernel -> planar channel-major env
    gather -> accumulate; batched across samples for spp > 1). Returns
    None when the config can't use it."""
    from cpuperformanceraytracer_tpu.kernels.megakernel import (
        render_accumulate_pallas,
        supports_fused_combine,
    )

    if not supports_fused_combine(cfg):
        return None

    def step(scene, camera, texture, frame, accum):
        if cfg.bake_scene and static_scene is not None:
            scene, camera = static_scene, static_camera
        return render_accumulate_pallas(scene, camera, texture, cfg,
                                        frame, accum)

    return step


def make_frame_fn(cfg: RenderConfig, backend: Optional[str] = None,
                  scene=None, camera=None):
    """Build the jitted progressive-frame step:
    (scene, camera, texture, frame, accum) -> accum'.

    The accumulation buffer is donated — the TPU updates it in place,
    the analog of the reference rendering straight into its persistent
    f32 render target. Pass a concrete ``scene``/``camera`` to let
    cfg.bake_scene specialize the Pallas kernel on them (the jitted fn
    then ignores its scene/camera arguments).
    """
    if backend:
        cfg = cfg.replace(backend=backend)
    cfg = cfg.validate()
    fused = _fused_step(cfg, scene, camera)
    if fused is not None:
        return jax.jit(fused, donate_argnums=(4,))
    render = _make_render(cfg, None, scene, camera)

    def step(scene, camera, texture, frame, accum):
        color = render(scene, camera, texture, frame)
        return accumulate_frame(accum, color, frame)

    return jax.jit(step, donate_argnums=(4,))


def make_multi_frame_fn(cfg: RenderConfig, frames_per_dispatch: int,
                        scene=None, camera=None):
    """Build a jitted K-frame progressive step:
    (scene, camera, texture, frame0, accum) -> accum after K frames.

    Per-dispatch overhead on the tunneled TPU backend is comparable to a
    whole 720p frame, so the offline driver rolls K frames into ONE
    dispatch with a lax.fori_loop (the kernel is traced once; the frame
    index is loop-carried). The reference's analog is its 600-frame
    offline loop with no per-frame host round-trips
    (Application.cpp:426-438). ``scene``/``camera``: as make_frame_fn."""
    cfg = cfg.validate()
    fused = _fused_step(cfg, scene, camera)
    if fused is not None:

        def step_k(scene, camera, texture, frame0, accum):
            def body(i, acc):
                return fused(scene, camera, texture, frame0 + i, acc)

            return jax.lax.fori_loop(0, frames_per_dispatch, body, accum)

        return jax.jit(step_k, donate_argnums=(4,))

    render = _make_render(cfg, None, scene, camera)

    def step_k(scene, camera, texture, frame0, accum):
        def body(i, acc):
            frame = frame0 + i
            color = render(scene, camera, texture, frame)
            return accumulate_frame(acc, color, frame)

        return jax.lax.fori_loop(0, frames_per_dispatch, body, accum)

    return jax.jit(step_k, donate_argnums=(4,))


def zero_accum(cfg: RenderConfig):
    """Fresh accumulation buffer in the config's layout (accum_layout)."""
    if cfg.packed_accum:
        return jnp.zeros((cfg.height, cfg.width, 4), jnp.float32)
    # three distinct buffers: the planes are donated to the frame step,
    # and donating one shared buffer three times is an error
    if cfg.flat_accum:
        shape = (cfg.height * cfg.width // 128, 128)
    else:
        shape = (cfg.height, cfg.width)
    return Vec3(
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
    )

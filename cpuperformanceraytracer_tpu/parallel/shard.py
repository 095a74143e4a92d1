"""shard_map'd frame rendering: static pixel-row + sample sharding.

The replacement for the reference's dynamic work queue
(demofox_path_tracing_optimization_v4.cpp:1567-1694): pixel rows shard
over the mesh "px" axis (every shard renders its block — the cost is
uniform by construction, so no load balancing is needed), and the spp
axis shards over "spp" with counter-RNG sample offsets, reduced with a
``psum`` over ICI — the collective that replaces the interlocked
completion counter + semaphore join (work_queue.cpp:17-66).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from cpuperformanceraytracer_tpu.config import RenderConfig
from cpuperformanceraytracer_tpu.core.vecmath import Vec3
from cpuperformanceraytracer_tpu.render.frame import accumulate_frame
from cpuperformanceraytracer_tpu.render.integrator import render_pixel


def _replicated_like(tree):
    return jax.tree.map(lambda _: P(), tree)


def sharded_render_frame(scene, camera, texture, cfg: RenderConfig, frame,
                         mesh: Mesh) -> Vec3:
    """One frame, sharded: rows over "px", samples over "spp".

    Requires cfg.height % mesh.shape["px"] == 0 (static sharding — the
    analog of CheckValidSettings' tile divisibility rule) and
    cfg.rng == "counter" whenever spp is sharded (wang streams are
    sequential per pixel and cannot split mid-stream).
    """
    n_px = mesh.shape.get("px", 1)
    n_spp = mesh.shape.get("spp", 1)
    if cfg.height % n_px:
        raise ValueError(f"height {cfg.height} not divisible by px shards {n_px}")
    if cfg.spp % n_spp:
        raise ValueError(f"spp {cfg.spp} not divisible by spp shards {n_spp}")
    if n_spp > 1 and cfg.rng != "counter":
        raise ValueError('spp sharding requires rng="counter"')
    spp_local = cfg.spp // n_spp

    # (H, W) fragCoord grids, rows sharded
    cols = jnp.arange(cfg.width, dtype=jnp.float32)
    rows = jnp.arange(cfg.height, dtype=jnp.float32)
    frag_y = (cfg.height - 1) - rows
    fy, fx = jnp.meshgrid(frag_y, cols, indexing="ij")

    scene_spec = _replicated_like(scene)
    camera_spec = _replicated_like(camera)
    texture_spec = _replicated_like(texture) if texture is not None else None

    h_local = cfg.height // n_px

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("px", None), P("px", None), scene_spec, camera_spec,
                  texture_spec, P()),
        out_specs=P(None, "px", None),  # (3, H, W), rows sharded
        # constants created inside the body (loop-carry zeros) are
        # device-invariant while loop outputs vary per shard; the vma
        # check rejects that mix, so it is disabled here (the psum above
        # is the only cross-shard communication and is explicit)
        check_vma=False,
    )
    def shard_fn(fx_blk, fy_blk, scene, camera, texture, frame):
        spp_idx = lax.axis_index("spp") if n_spp > 1 else 0
        h_blk, w = fx_blk.shape

        if cfg.backend == "pallas":
            # the fast path under SPMD: each shard runs the megakernel on
            # its global pixel-row window; spp shards offset the
            # counter-RNG sample window (one partial sum each, psum'd)
            from cpuperformanceraytracer_tpu.kernels.megakernel import (
                render_frame_pallas,
            )

            row0 = (lax.axis_index("px") * h_local) if n_px > 1 else 0
            color = render_frame_pallas(
                scene, camera, texture, cfg.replace(spp=spp_local), frame,
                spp_offset=spp_idx * spp_local, row0=row0,
                local_height=h_blk,
            )
            planes = jnp.stack([color.x, color.y, color.z])
        else:
            def px(x, y):
                return render_pixel(
                    scene, camera, texture, cfg, x, y, frame,
                    spp_offset=spp_idx * spp_local, spp_count=spp_local,
                )

            color = jax.vmap(px)(fx_blk.reshape(-1), fy_blk.reshape(-1))
            planes = jnp.stack(
                [c.reshape(h_blk, w) for c in (color.x, color.y, color.z)]
            )
        if n_spp > 1:
            planes = lax.psum(planes, "spp") / n_spp
        return planes

    planes = shard_fn(fx, fy, scene, camera, texture,
                      jnp.asarray(frame, jnp.uint32))
    return Vec3(planes[0], planes[1], planes[2])


def make_sharded_frame_fn(cfg: RenderConfig, mesh: Mesh):
    """Jitted sharded progressive step:
    (scene, camera, texture, frame, accum) -> accum'."""
    cfg = cfg.validate()

    @partial(jax.jit, donate_argnums=(4,), static_argnames=())
    def step(scene, camera, texture, frame, accum):
        color = sharded_render_frame(scene, camera, texture, cfg, frame, mesh)
        return accumulate_frame(accum, color, frame)

    return step

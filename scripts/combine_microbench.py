"""Microbenchmark: env combine + accumulate layout strategies (real TPU).

The profiled frame pays ~0.63 ms in an XLA layout copy unpacking the
(N, 4) env-gather output into channel planes before the combine
(docs/PERFORMANCE.md). This measures whether keeping the COMBINE and the
progressive ACCUMULATION in the gather's packed (N, 4) layout (unpacking
once at image-write time instead of every frame) removes that copy.

Each strategy renders "one frame" of combine+accumulate from identical
fake kernel outputs, chained 32-deep through the accumulation buffer.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cpuperformanceraytracer_tpu.utils.timing import device_sync

H, W = 720, 1280
TH, TW = 256, 512
STEPS = 32


def bench(name, step, accum0, args):
    f = jax.jit(step, donate_argnums=(0,))
    acc = f(accum0, 0, *args)
    device_sync(acc)
    acc = f(acc, 1, *args)
    device_sync(acc)
    t0 = time.perf_counter()
    for i in range(2, STEPS + 2):
        acc = f(acc, i, *args)
    device_sync(acc)
    ms = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{name:52s} {ms:9.3f} ms/frame", flush=True)
    return acc


def main():
    rng = np.random.default_rng(0)
    base = np.minimum(
        (np.arange(H * W) // W * TW // H) * TW
        + (np.arange(H * W) % W * TW // W),
        TH * TW - 1,
    )
    scatter = rng.integers(0, TH * TW, size=H * W)
    mix = np.where(rng.random(H * W) < 0.3, scatter, base).astype(np.int32)
    idx2d = jnp.asarray(mix.reshape(H, W))

    table4 = jnp.asarray(rng.random((TH * TW, 4), dtype=np.float32))
    # fake kernel outputs: rgb + miss throughput planes, (H, W) f32
    planes = [jnp.asarray(rng.random((H, W), dtype=np.float32))
              for _ in range(6)]

    # -- current: gather -> channel slices -> 3-plane combine/accum ------
    def planar(acc, i, table4, idx2d, r, g, b, tx, ty, tz):
        texel = jnp.take(table4, idx2d.reshape(-1), axis=0)
        ex = texel[:, 0].reshape(H, W)
        ey = texel[:, 1].reshape(H, W)
        ez = texel[:, 2].reshape(H, W)
        blend = 1.0 / (jnp.float32(i) + 1.0)
        ar, ag, ab = acc
        ar = ar + ((r + ex * tx) - ar) * blend
        ag = ag + ((g + ey * ty) - ag) * blend
        ab = ab + ((b + ez * tz) - ab) * blend
        return (ar, ag, ab)

    acc0 = tuple(jnp.zeros((H, W), jnp.float32) for _ in range(3))
    out_planar = bench("planar (current): slice -> 3-plane accum",
                       planar, acc0, (table4, idx2d) + tuple(planes))

    # -- packed: stack kernel planes -> (N,4) combine/accum --------------
    def packed(acc4, i, table4, idx2d, r, g, b, tx, ty, tz):
        texel = jnp.take(table4, idx2d.reshape(-1), axis=0)
        rgb4 = jnp.stack([r.reshape(-1), g.reshape(-1), b.reshape(-1),
                          jnp.zeros(H * W, jnp.float32)], axis=-1)
        thr4 = jnp.stack([tx.reshape(-1), ty.reshape(-1), tz.reshape(-1),
                          jnp.zeros(H * W, jnp.float32)], axis=-1)
        blend = 1.0 / (jnp.float32(i) + 1.0)
        new = rgb4 + texel * thr4
        return acc4 + (new - acc4) * blend

    acc40 = jnp.zeros((H * W, 4), jnp.float32)
    out_packed = bench("packed: (N,4) combine + (N,4) accum",
                       packed, acc40, (table4, idx2d) + tuple(planes))

    # -- packed-2d: same but (H, W*4)-shaped accum ------------------------
    def packed2d(acc4, i, table4, idx2d, r, g, b, tx, ty, tz):
        texel = jnp.take(table4, idx2d.reshape(-1), axis=0).reshape(H, W, 4)
        rgb4 = jnp.stack([r, g, b, jnp.zeros((H, W), jnp.float32)], axis=-1)
        thr4 = jnp.stack([tx, ty, tz, jnp.zeros((H, W), jnp.float32)],
                         axis=-1)
        blend = 1.0 / (jnp.float32(i) + 1.0)
        new = rgb4 + texel * thr4
        return acc4 + (new - acc4) * blend

    acc4hw = jnp.zeros((H, W, 4), jnp.float32)
    out_p2 = bench("packed-2d: (H,W,4) combine + accum",
                   packed2d, acc4hw, (table4, idx2d) + tuple(planes))

    # -- flat planar: (N,) planes end-to-end (no 2d reshape) -------------
    def flatplanar(acc, i, table4, idx2d, r, g, b, tx, ty, tz):
        texel = jnp.take(table4, idx2d.reshape(-1), axis=0)
        blend = 1.0 / (jnp.float32(i) + 1.0)
        ar, ag, ab = acc
        rr, gg, bb = r.reshape(-1), g.reshape(-1), b.reshape(-1)
        xx, yy, zz = tx.reshape(-1), ty.reshape(-1), tz.reshape(-1)
        ar = ar + ((rr + texel[:, 0] * xx) - ar) * blend
        ag = ag + ((gg + texel[:, 1] * yy) - ag) * blend
        ab = ab + ((bb + texel[:, 2] * zz) - ab) * blend
        return (ar, ag, ab)

    accf0 = tuple(jnp.zeros((H * W,), jnp.float32) for _ in range(3))
    out_flat = bench("flat planar: (N,) slices, no 2d reshape",
                     flatplanar, accf0, (table4, idx2d) + tuple(planes))

    # numerical agreement
    ref = np.stack([np.asarray(p) for p in out_planar], axis=-1)
    got = np.asarray(out_packed).reshape(H, W, 4)[..., :3]
    got2 = np.asarray(out_p2)[..., :3]
    gotf = np.stack([np.asarray(p).reshape(H, W) for p in out_flat], -1)
    print("packed allclose:", np.allclose(ref, got, atol=1e-6),
          "| packed2d:", np.allclose(ref, got2, atol=1e-6),
          "| flat:", np.allclose(ref, gotf, atol=1e-6))


if __name__ == "__main__":
    main()

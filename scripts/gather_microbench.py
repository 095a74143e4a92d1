"""Microbenchmark of env-texel gather strategies on the real TPU.

921600 queries (one per 1280x720 pixel) into a 256x512x3 f32 table.
Each strategy is chained 32-deep with a data dependency and joined with
one device_sync (timing.py protocol).
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
N = 32


def bench(name, fn, *args):
    f = jax.jit(fn)
    x = f(jnp.float32(0.0), *args)
    device_sync(x)
    t0 = time.perf_counter()
    for i in range(1, N + 1):
        x = f(x[0, 0] * 1e-20, *args)
    device_sync(x)
    ms = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:44s} {ms:9.3f} ms  ({ms * 1e6 / (H * W):6.2f} ns/query)",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    # realistic mix: mostly-coherent sky rows + scattered bounce misses
    base = np.minimum(
        (np.arange(H * W) // W * TW // H) * TW
        + (np.arange(H * W) % W * TW // W),
        TH * TW - 1,
    )
    scatter = rng.integers(0, TH * TW, size=H * W)
    mix = np.where(rng.random(H * W) < 0.3, scatter, base).astype(np.int32)
    idx2d = jnp.asarray(mix.reshape(H, W))
    idx1d = jnp.asarray(mix)
    rows = idx1d // TW
    cols = idx1d % TW

    tex = jnp.asarray(rng.standard_normal((TH * TW, 3)), jnp.float32)
    tex_t = tex.T.copy()                      # (3, N)
    tex_img = tex.reshape(TH, TW, 3)
    tex_r, tex_g, tex_b = tex[:, 0], tex[:, 1], tex[:, 2]
    tex_pad = jnp.pad(tex, ((0, 0), (0, 1)))  # (N, 4)

    bench("rows of (N,3)  [current]",
          lambda d, t, i: jnp.take(t, i, axis=0) + d, tex, idx1d)
    bench("rows of (N,3), 2D idx",
          lambda d, t, i: jnp.take(t, i, axis=0) + d, tex, idx2d)
    bench("rows of (N,4) padded",
          lambda d, t, i: jnp.take(t, i, axis=0)[..., :3] + d, tex_pad, idx1d)
    bench("3x plane takes (N,)",
          lambda d, r, g, b, i: (jnp.take(r, i) + jnp.take(g, i)
                                 + jnp.take(b, i))[:, None] + d,
          tex_r, tex_g, tex_b, idx1d)
    bench("lane take of (3,N) axis=-1",
          lambda d, t, i: jnp.take(t, i, axis=-1) + d, tex_t, idx1d)
    bench("(TH,TW,3) [r,c] advanced",
          lambda d, t, r, c: t[r, c] + d, tex_img, rows, cols)

    def sorted_take(d, t, i):
        order = jnp.argsort(i)
        v = jnp.take(t, i[order], axis=0)
        inv = jnp.argsort(order)
        return jnp.take(v, inv, axis=0) + d

    bench("argsort + take + unsort", sorted_take, tex, idx1d)

    # row-matmul two-stage: one-hot over 256 rows via MXU, then lane
    # select over 512 cols. (Q,256)@(256,1536) in bf16 per 512-query tile.
    def row_matmul(d, t, r, c):
        q = r.shape[0]
        oh = (r[:, None] == jnp.arange(TH)[None, :]).astype(jnp.bfloat16)
        rowdata = jnp.dot(oh, t.reshape(TH, TW * 3).astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        colsel = (c[:, None] == jnp.arange(TW)[None, :])
        out = jnp.einsum("qw,qwc->qc", colsel.astype(jnp.float32),
                         rowdata.reshape(q, TW, 3))
        return out + d

    bench("row one-hot MXU + col select (bf16)", row_matmul, tex_img, rows,
          cols)


def extra():
    rng = np.random.default_rng(0)
    base = np.minimum(
        (np.arange(H * W) // W * TW // H) * TW
        + (np.arange(H * W) % W * TW // W), TH * TW - 1)
    scatter = rng.integers(0, TH * TW, size=H * W)
    mix = np.where(rng.random(H * W) < 0.3, scatter, base).astype(np.int32)
    idx1d = jnp.asarray(mix)
    tex_pad = jnp.pad(
        jnp.asarray(rng.standard_normal((TH * TW, 3)), jnp.float32),
        ((0, 0), (0, 1)))

    # does XLA narrow an (N,4) gather when the pad column is sliced away?
    bench("(N,4) take, slice 3 (narrowable)",
          lambda d, t, i: jnp.take(t, i, axis=0)[:, :3] + d, tex_pad, idx1d)
    bench("(N,4) take, keep 4",
          lambda d, t, i: jnp.take(t, i, axis=0) + d, tex_pad, idx1d)

    def take4_sum(d, t, i):
        v = jnp.take(t, i, axis=0)
        return v[:, :3] + d + v[:, 3:4]  # 4th col is 0: value-neutral

    bench("(N,4) take, +0-col (unnarrowable)", take4_sum, tex_pad, idx1d)

    # fully coherent (sorted) indices: does locality matter at all?
    idx_sorted = jnp.asarray(np.sort(mix))
    bench("(N,4) keep 4, sorted idx",
          lambda d, t, i: jnp.take(t, i, axis=0) + d, tex_pad, idx_sorted)
    bench("(N,3) rows, sorted idx",
          lambda d, t, i: jnp.take(t[:, :3], i, axis=0) + d, tex_pad,
          idx_sorted)


if __name__ == "__main__":
    main()
    extra()

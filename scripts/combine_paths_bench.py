"""A/B the env-gather CONSUMPTION paths at the headline frame shape.

The gather itself is fixed-rate; what varies is how its output reaches
the planar accumulation: XLA relayout copy, dense reshape + lane-shuffle
combine kernel, or a channel-major gather whose (4, H, W) output slices
into planes for free. Timed fused in a fori_loop chain (one device_sync).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cpuperformanceraytracer_tpu.core.vecmath import Vec3
from cpuperformanceraytracer_tpu.utils.timing import device_sync

H, W = 720, 1280
TN = 131072  # 512x256 env texels
K = 32


def bench(name, step):
    """step(table, idx, rgb..., thr..., acc) -> acc'"""

    @jax.jit
    def many(table, idx, rgb, thr, acc):
        def body(i, a):
            return step(table, idx, rgb, thr, a, 1.0 / (1.0 + i))
        return jax.lax.fori_loop(0, K, body, acc)

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, TN, (H, W)), jnp.int32)
    table = jnp.asarray(rng.standard_normal((TN, 4)), jnp.float32)
    rgb = Vec3(*(jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
                 for _ in range(3)))
    thr = Vec3(*(jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
                 for _ in range(3)))
    acc = Vec3(*(jnp.zeros((H, W), jnp.float32) for _ in range(3)))
    out = many(table, idx, rgb, thr, acc)
    device_sync(out)
    reps = 8
    x = out
    t0 = time.perf_counter()
    for _ in range(reps):
        x = many(table, idx, rgb, thr, x)
    device_sync(x)
    ms = (time.perf_counter() - t0) / (reps * K) * 1e3
    print(f"{name:44s} {ms:8.3f} ms/frame", flush=True)
    return x


def v1_pallas_reshape(table, idx, rgb, thr, acc, blend):
    from cpuperformanceraytracer_tpu.kernels.combine import combine_accumulate

    e4 = jnp.take(table, idx.reshape(-1), axis=0)
    return combine_accumulate(e4, rgb, thr, acc, blend)


def v2_xla_planar(table, idx, rgb, thr, acc, blend):
    e4 = jnp.take(table, idx.reshape(-1), axis=0).reshape(H, W, 4)
    color = Vec3(rgb.x + e4[..., 0] * thr.x,
                 rgb.y + e4[..., 1] * thr.y,
                 rgb.z + e4[..., 2] * thr.z)
    return Vec3(acc.x + (color.x - acc.x) * blend,
                acc.y + (color.y - acc.y) * blend,
                acc.z + (color.z - acc.z) * blend)


def _channel_major_gather(table, idx):
    """(4, H, W) planar env planes in ONE gather: offset dim leads."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(0,),
        collapsed_slice_dims=(),
        start_index_map=(0,),
        operand_batching_dims=(),
        start_indices_batching_dims=(),
    )
    # operand (TN, 4) -> transpose to (4, TN) so the slice [4, 1] reads
    # one texel row as a column
    tt = table.T  # (4, TN)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(0,),
        collapsed_slice_dims=(1,),
        start_index_map=(1,),
    )
    return jax.lax.gather(
        tt, idx.reshape(H, W, 1),
        dimension_numbers=jax.lax.GatherDimensionNumbers(
            offset_dims=(0,), collapsed_slice_dims=(1,),
            start_index_map=(1,)),
        slice_sizes=(4, 1),
    )  # (4, H, W)


def v3_channel_major_xla(table, idx, rgb, thr, acc, blend):
    e = _channel_major_gather(table, idx)
    color = Vec3(rgb.x + e[0] * thr.x,
                 rgb.y + e[1] * thr.y,
                 rgb.z + e[2] * thr.z)
    return Vec3(acc.x + (color.x - acc.x) * blend,
                acc.y + (color.y - acc.y) * blend,
                acc.z + (color.z - acc.z) * blend)


def main():
    r1 = bench("v1 row gather + reshape + pallas", v1_pallas_reshape)
    r2 = bench("v2 row gather + XLA planar relayout", v2_xla_planar)
    try:
        r3 = bench("v3 channel-major gather + XLA", v3_channel_major_xla)
        d = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(r1, r3))
        print(f"v1 vs v3 max|diff| {d:.2e}")
    except Exception as e:
        print("v3 FAIL:", str(e).splitlines()[0][:120])
    d = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(r1, r2))
    print(f"v1 vs v2 max|diff| {d:.2e}")


if __name__ == "__main__":
    main()

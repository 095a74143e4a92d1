"""Sort-based segment sum: the TPU-native replacement for scatter-add.

The env-texel gradient is "for every pixel p: d_tex[idx[p]] += cot[p]" —
an (H*W)-update scatter into the (texels,) planes. XLA lowers TPU
scatters to a serial per-update loop (the measured cause of the round-3
backward pass's multi-second env gradient). One sort + prefix-sum +
boundary-difference computes the same reduction in O(P log P) fully
vectorized work:

  1. sort (idx, v) by idx                      (jax.lax.sort, multi-operand)
  2. prefix-sum the sorted values              (jnp.cumsum — parallel scan)
  3. per segment t: sum = csum[end_t] - csum[end_{t-1}]
     with end_t = searchsorted(sorted_idx, t, side="right")

All arrays stay 1-D per channel on purpose: an (P, 3) channel-minor
layout would be physically lane-padded 3->128 by the TPU tiling (the
32x HBM expansion documented in docs/PERFORMANCE.md "negative results").

Replaces the reference-capability gap: the reference has no gradients at
all (SURVEY.md section 7 item 7 is a new driver-set requirement).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def segment_sum_sorted(idx: jnp.ndarray,
                       values: Sequence[jnp.ndarray],
                       num_segments: int) -> Tuple[jnp.ndarray, ...]:
    """Sum each 1-D array in ``values`` into ``num_segments`` bins.

    idx: (P,) int32 in [0, num_segments); values: tuple of (P,) f32.
    Returns a tuple of (num_segments,) f32 arrays, equal (up to f32
    prefix-sum rounding) to ``jnp.zeros(n).at[idx].add(v)`` per channel.
    """
    idx = idx.astype(jnp.int32)
    operands = (idx,) + tuple(values)
    sorted_ops = jax.lax.sort(operands, dimension=0, num_keys=1)
    sidx = sorted_ops[0]
    svals = sorted_ops[1:]

    # end_t = number of entries with index <= t  (exclusive prefix bound).
    # method="sort" folds the lookup into one fused sort — measured ~4x
    # faster than the default 20-step binary-search scan at 1M keys
    # (scripts/profile_backward.py).
    targets = jnp.arange(num_segments, dtype=jnp.int32)
    ends = jnp.searchsorted(sidx, targets, side="right", method="sort")

    # one channel-major boundary gather for ALL channels: operand
    # (C, P+1) with offset_dims=(0,) writes planar (C, T) directly —
    # the same trick as texture._gather; three separate 1-D takes
    # measured 0.94 ms EACH at T=131072 (xprof, BASELINE.md) vs ~0.25
    # for the batched form
    padded = jnp.stack(
        [jnp.concatenate([jnp.zeros((1,), sv.dtype), _cumsum_blocked(sv)])
         for sv in svals], axis=0)  # (C, P+1)
    c_at = jax.lax.gather(
        padded, ends[:, None],
        dimension_numbers=jax.lax.GatherDimensionNumbers(
            offset_dims=(0,), collapsed_slice_dims=(1,),
            start_index_map=(1,)),
        slice_sizes=(len(svals), 1),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # (C, T)
    prev = jnp.concatenate(
        [jnp.zeros((len(svals), 1), padded.dtype), c_at[:, :-1]], axis=1)
    out = c_at - prev
    return tuple(out[c] for c in range(len(svals)))


def _cumsum_blocked(x: jnp.ndarray, lanes: int = 128) -> jnp.ndarray:
    """Inclusive 1-D cumsum via a (rows, 128) block decomposition: lane
    cumsums vectorize across rows, and only the (P/128,) row totals take
    the sequential-scan path — ~4x faster than a 1M-long 1-D cumsum on
    TPU. Exact association differs from jnp.cumsum by f32 rounding only.
    """
    n = x.shape[0]
    if n % lanes:
        return jnp.cumsum(x)
    x2 = x.reshape(n // lanes, lanes)
    within = jnp.cumsum(x2, axis=1)
    row_tot = within[:, -1]
    offs = jnp.cumsum(row_tot) - row_tot  # exclusive row prefix
    return (within + offs[:, None]).reshape(n)

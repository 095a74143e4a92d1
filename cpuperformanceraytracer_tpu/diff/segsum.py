"""Sort-based segment sum: the TPU-native replacement for scatter-add.

The env-texel gradient is "for every pixel p: d_tex[idx[p]] += cot[p]" —
an (H*W)-update scatter into the (texels,) planes. XLA lowers TPU
scatters to a serial per-update loop (the measured cause of the round-3
backward pass's multi-second env gradient). Sorting computes the same
reduction in fully vectorized work:

  1. ONE multi-operand sort of the (idx, values...) entries WITH T
     sentinel rows appended, under an ODD/EVEN key encoding (real ->
     2*idx, sentinel t -> 2*t+1): the strict order real(t) <
     sentinel(t) < real(t+1) lives in the key itself, so no stability
     tiebreak operand rides through the big sort.
  2. prefix-sum the sorted values (blocked cumsum — parallel scan);
     sentinels add 0.0, so at sentinel t the inclusive prefix is
     exactly "sum of all entries with idx <= t".
  3. recover the sentinel POSITIONS in t order with one cheap
     2-operand sort (sentinel keys are unique and increasing), then
     one batched channel-major gather of the prefixes there. Segment
     sums are adjacent differences of the extracted prefixes.

Round 4 used jnp.searchsorted(method="sort") for step 3; its
implementation hides an inverse-permutation SCATTER (u32[P+T]) that
xprof showed costing 4.85 ms/step at 720p — the round-4 verdict's
unidentified "fusion.4" — plus a 1.5 ms companion argsort and a second
0.6 ms scatter (scripts/profile_backward_ops.py). Inverting the
permutation BY SORT (step 3) replaces all three with one more
multi-operand sort: scatter-free end to end.

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
    p = idx.shape[0]
    t = int(num_segments)
    n = p + t

    # 1. one sort of reals + sentinels with ODD/EVEN key encoding:
    # real entry -> 2*idx, sentinel t -> 2*t + 1. The strict ordering
    # real(t) < sentinel(t) < real(t+1) is built into the key itself,
    # so no stability tiebreak operand rides through the big sort.
    keys = jnp.concatenate([idx * 2,
                            jnp.arange(t, dtype=jnp.int32) * 2 + 1])
    padded = [jnp.concatenate([jnp.asarray(v), jnp.zeros((t,), v.dtype)])
              for v in values]
    sorted_ops = jax.lax.sort((keys,) + tuple(padded), dimension=0,
                              num_keys=1)
    skeys = sorted_ops[0]
    svals = sorted_ops[1:]

    # 2. inclusive prefix sums (sentinel zeros leave values unchanged)
    csums = jnp.stack([_cumsum_blocked(sv) for sv in svals])  # (C, N)

    # 3. sentinel positions in t order: sentinel keys (odd) are unique
    # and already increasing, so a 2-operand sort keyed "own key if
    # sentinel else +inf" compacts their positions to the front
    key2 = jnp.where((skeys & 1) == 1, skeys, jnp.int32(2 * t))
    pos_t = jax.lax.sort((key2, jax.lax.iota(jnp.int32, n)), dimension=0,
                         num_keys=1)[1][:t]

    # one channel-major batched gather for ALL channels ((C, N) operand,
    # offset_dims=(0,) -> planar (C, T) written directly — the same
    # trick as texture._gather; per-channel 1-D takes measured 0.94 ms
    # EACH at T=131072 vs ~0.25 for the batched form)
    c_at = jax.lax.gather(
        csums, pos_t[:, None],
        dimension_numbers=jax.lax.GatherDimensionNumbers(
            offset_dims=(0,), collapsed_slice_dims=(1,),
            start_index_map=(1,)),
        slice_sizes=(len(values), 1),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # (C, T)
    prev = jnp.concatenate(
        [jnp.zeros((len(values), 1), c_at.dtype), c_at[:, :-1]], axis=1)
    out = c_at - prev
    return tuple(out[c] for c in range(len(values)))


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

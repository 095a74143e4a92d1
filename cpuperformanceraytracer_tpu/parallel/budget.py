"""Communication budget model for the sharded training step.

The BASELINE.md "Scaling" table models multi-chip efficiency from the
bytes each collective moves per fwd+bwd step. This module is the model
— and tests/test_sharding.py::test_training_step_collective_bytes
VERIFIES it against the all-reduce ops in the actual compiled HLO of
the sharded step (the collectives XLA inserts for shard_map's psum and
its transpose), so the table's inputs are a checked property of the
program, not an assumption.

Collectives of one value_and_grad step over a (px, spp) mesh
(parallel/shard.sharded_render_frame_diff):

  1. image psum over "spp" (partial-sample frames) — and its transpose
     (the cotangent of the psum'd mean), so the (3, H/n_px, W) planes
     cross the wire twice per step. Absent when spp is unsharded.
  2. loss reduction over "px" (a few scalars).
  3. gradient all-reduce through the shard_map transpose: every
     trained parameter leaf, once — dominated by the env-texel grads
     (3 * texels).
"""

from __future__ import annotations

from typing import Iterable


def training_step_comm_elements(height: int, width: int, n_px: int,
                                n_spp: int,
                                param_sizes: Iterable[int]) -> int:
    """Modeled f32 elements all-reduced per fwd+bwd step."""
    image = 2 * 3 * (height // n_px) * width if n_spp > 1 else 0
    grads = sum(param_sizes)
    loss = 3
    return image + grads + loss


def training_step_comm_bytes(height: int, width: int, n_px: int,
                             n_spp: int,
                             param_sizes: Iterable[int]) -> int:
    return 4 * training_step_comm_elements(height, width, n_px, n_spp,
                                           param_sizes)

"""Debug visualizations: shard/tile ownership overlays.

Analog of the reference's VISUALIZE_TILES aid
(demofox_path_tracing_optimization_v4.cpp:1149-1177,1217-1224), which
colored pixels by worker-thread id to verify the scheduler. Here the
"scheduler" is static sharding, so the visualization colors pixels by
(device shard, Pallas block) instead — rendering it verifies the mesh
layout and block decomposition the same way.
"""

from __future__ import annotations

import numpy as np

from cpuperformanceraytracer_tpu.config import RenderConfig

_PALETTE = np.array([
    [230, 25, 75], [60, 180, 75], [255, 225, 25], [0, 130, 200],
    [245, 130, 48], [145, 30, 180], [70, 240, 240], [240, 50, 230],
    [210, 245, 60], [250, 190, 212], [0, 128, 128], [220, 190, 255],
], np.uint8)


def shard_ownership_image(cfg: RenderConfig, n_px_shards: int) -> np.ndarray:
    """(H, W, 3) u8: each px-shard's row block in a distinct color."""
    rows_per = cfg.height // n_px_shards
    img = np.zeros((cfg.height, cfg.width, 3), np.uint8)
    for s in range(n_px_shards):
        img[s * rows_per:(s + 1) * rows_per] = _PALETTE[s % len(_PALETTE)]
    return img


def block_ownership_image(cfg: RenderConfig) -> np.ndarray:
    """(H, W, 3) u8: each Pallas (tile_height, tile_width) block colored
    by its grid coordinates (checker-offset so neighbors differ)."""
    img = np.zeros((cfg.height, cfg.width, 3), np.uint8)
    bh, bw = cfg.tile_height, cfg.tile_width
    for bi in range(cfg.height // bh):
        for bj in range(max(cfg.width // bw, 1)):
            c = _PALETTE[(bi * 7 + bj * 3) % len(_PALETTE)]
            img[bi * bh:(bi + 1) * bh, bj * bw:(bj + 1) * bw] = c
    return img


def overlay(render_u8: np.ndarray, ownership: np.ndarray,
            alpha: float = 0.35) -> np.ndarray:
    """Blend an ownership map over a rendered image."""
    out = (render_u8.astype(np.float32) * (1 - alpha)
           + ownership.astype(np.float32) * alpha)
    return np.clip(out, 0, 255).astype(np.uint8)

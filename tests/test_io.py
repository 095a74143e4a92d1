"""IO tests: BMP/PNG writers, checkpoint roundtrip + resume."""

import numpy as np
import jax.numpy as jnp

from cpuperformanceraytracer_tpu.config import RenderConfig
from cpuperformanceraytracer_tpu.core.vecmath import Vec3
from cpuperformanceraytracer_tpu.io.checkpoint import (
    load_checkpoint,
    resume_or_fresh,
    save_checkpoint,
)
from cpuperformanceraytracer_tpu.io.image import read_bmp, write_bmp, write_png


def test_bmp_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    img = rs.randint(0, 256, (13, 17, 3), np.uint8)  # odd width: padding path
    p = str(tmp_path / "x.bmp")
    write_bmp(p, img)
    back = read_bmp(p)
    assert np.array_equal(back, img)


def test_png_valid_signature(tmp_path):
    img = np.zeros((4, 4, 3), np.uint8)
    p = str(tmp_path / "x.png")
    write_png(p, img)
    with open(p, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data and b"IEND" in data


def test_checkpoint_roundtrip(tmp_path):
    cfg = RenderConfig(width=8, height=6)
    acc = Vec3(
        jnp.arange(48, dtype=jnp.float32).reshape(6, 8),
        jnp.ones((6, 8), jnp.float32),
        jnp.zeros((6, 8), jnp.float32),
    )
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(p, acc, 17, cfg)
    back, frame, saved_cfg = load_checkpoint(p)
    assert frame == 17
    assert saved_cfg.width == 8 and saved_cfg.height == 6
    assert np.allclose(np.asarray(back.x), np.asarray(acc.x))


def test_resume_or_fresh(tmp_path):
    cfg = RenderConfig(width=8, height=6)
    acc, frame = resume_or_fresh(None, cfg)
    assert frame == 0 and np.asarray(acc.x).shape == (6, 8)
    # incompatible resolution falls back to fresh
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(p, acc, 5, cfg)
    acc2, frame2 = resume_or_fresh(p, cfg.replace(width=16))
    assert frame2 == 0
    acc3, frame3 = resume_or_fresh(p, cfg)
    assert frame3 == 5

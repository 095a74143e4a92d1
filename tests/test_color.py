"""Color pipeline tests vs independent numpy formulas."""

import numpy as np
import jax.numpy as jnp

from cpuperformanceraytracer_tpu.core.color import (
    aces_film,
    linear_to_srgb,
    postprocess_color,
    srgb_to_linear,
    to_u8,
)
from cpuperformanceraytracer_tpu.core.vecmath import Vec3


def _v(a):
    a = np.asarray(a, np.float32)
    return Vec3(jnp.asarray(a), jnp.asarray(a), jnp.asarray(a))


def test_aces_reference_values():
    x = np.array([0.0, 0.18, 1.0, 4.0, 100.0], np.float32)
    got = np.asarray(aces_film(_v(x)).x)
    want = np.clip((x * (2.51 * x + 0.03)) / (x * (2.43 * x + 0.59) + 0.14), 0, 1)
    assert np.allclose(got, want, atol=1e-6)
    assert got[0] == 0.0 and got[-1] <= 1.0


def test_srgb_roundtrip():
    x = np.linspace(0, 1, 64).astype(np.float32)
    enc = linear_to_srgb(_v(x))
    dec = srgb_to_linear(enc)
    assert np.allclose(np.asarray(dec.x), x, atol=1e-5)


def test_srgb_breakpoint_continuous():
    eps = 1e-6
    lo = float(linear_to_srgb(_v(0.0031308 - eps)).x)
    hi = float(linear_to_srgb(_v(0.0031308 + eps)).x)
    assert abs(hi - lo) < 1e-4


def test_to_u8_rounding():
    v = _v(np.array([0.0, 0.5, 1.0, 2.0], np.float32))
    u = np.asarray(to_u8(v))
    assert u.dtype == np.uint8
    assert u[0, 0] == 0 and u[2, 0] == 255 and u[3, 0] == 255
    assert u[1, 0] in (127, 128)  # 127.5 rounds to nearest even


def test_postprocess_monotonic():
    xs = np.linspace(0, 3, 32).astype(np.float32)
    ys = np.asarray(postprocess_color(_v(xs)).x)
    assert np.all(np.diff(ys) >= -1e-6)

"""Unit tests: core vector math vs numpy/analytic ground truth."""

import numpy as np
import jax.numpy as jnp

from cpuperformanceraytracer_tpu.core.vecmath import (
    Vec3,
    cross,
    dot3,
    fresnel_reflect_amount,
    length,
    normalize,
    reflect,
    refract,
    vec3,
)


def _v(x, y, z):
    return Vec3(jnp.float32(x), jnp.float32(y), jnp.float32(z))


def _np(v):
    return np.array([float(v.x), float(v.y), float(v.z)])


def test_dot_cross_length():
    a, b = _v(1, 2, 3), _v(4, -5, 6)
    assert np.isclose(float(dot3(a, b)), 1 * 4 - 2 * 5 + 3 * 6)
    assert np.allclose(_np(cross(a, b)), np.cross([1, 2, 3], [4, -5, 6]))
    assert np.isclose(float(length(a)), np.sqrt(14), rtol=1e-6)


def test_normalize_unit():
    v = normalize(_v(3, 4, 12))
    assert np.isclose(np.linalg.norm(_np(v)), 1.0, rtol=1e-6)


def test_reflect_mirror():
    # 45-degree incidence on the y=0 plane
    d = normalize(_v(1, -1, 0))
    n = _v(0, 1, 0)
    r = reflect(d, n)
    assert np.allclose(_np(r), _np(normalize(_v(1, 1, 0))), atol=1e-6)


def test_refract_straight_through():
    # normal incidence, matched IOR: direction unchanged
    d = _v(0, 0, 1)
    n = _v(0, 0, -1)
    out = refract(d, n, jnp.float32(1.0))
    assert np.allclose(_np(out), [0, 0, 1], atol=1e-6)


def test_refract_snell():
    # air -> glass at 45 degrees obeys Snell's law
    eta = 1.0 / 1.5
    d = normalize(_v(1, -1, 0))
    n = _v(0, 1, 0)
    out = refract(d, n, jnp.float32(eta))
    sin_in = np.sqrt(0.5)
    sin_out = abs(float(out.x)) / np.linalg.norm(_np(out))
    assert np.isclose(sin_out, eta * sin_in, rtol=1e-5)


def test_refract_tir_returns_zero():
    # glass -> air beyond the critical angle: zero vector (mathlib.h rfrct)
    eta = 1.5
    d = normalize(_v(1, -0.2, 0))  # grazing
    n = _v(0, 1, 0)
    out = refract(d, n, jnp.float32(eta))
    assert np.allclose(_np(out), 0.0)


def test_fresnel_limits():
    n = _v(0, 1, 0)
    # normal incidence air->glass: r0 = ((1-1.5)/(2.5))^2 = 0.04
    d = _v(0, -1, 0)
    f = fresnel_reflect_amount(
        jnp.float32(1.0), jnp.float32(1.5), n, d, jnp.float32(0.0), jnp.float32(1.0)
    )
    assert np.isclose(float(f), 0.04, atol=1e-3)
    # grazing incidence: -> f90 = 1
    d = normalize(_v(1, -1e-3, 0))
    f = fresnel_reflect_amount(
        jnp.float32(1.0), jnp.float32(1.5), n, d, jnp.float32(0.0), jnp.float32(1.0)
    )
    assert float(f) > 0.98
    # TIR (dense to rare, shallow angle): exactly 1
    d = normalize(_v(1, -0.2, 0))
    f = fresnel_reflect_amount(
        jnp.float32(1.5), jnp.float32(1.0), n, d, jnp.float32(0.02), jnp.float32(1.0)
    )
    assert np.isclose(float(f), 1.0)


def test_vec3_ops_broadcast():
    a = vec3(np.ones(5), np.zeros(5), np.full(5, 2.0))
    b = a * 2.0 + a
    assert b.x.shape == (5,)
    assert np.allclose(np.asarray(b.z), 6.0)

"""RNG tests: exact wang-hash parity vs an independent numpy
implementation, stream independence, counter RNG addressability and
distribution sanity."""

import numpy as np
import jax
import jax.numpy as jnp

from cpuperformanceraytracer_tpu.core.rng import (
    CounterRng,
    WangRng,
    counter_rand01,
    pixel_seed,
    rand01,
    wang_hash,
)


def np_wang_hash(seed: np.uint32) -> np.uint32:
    """Independent numpy reference of mathutils.h:8-16."""
    with np.errstate(over="ignore"):
        seed = np.uint32(seed)
        seed = np.uint32(seed ^ np.uint32(61)) ^ np.uint32(seed >> np.uint32(16))
        seed = np.uint32(seed * np.uint32(9))
        seed = np.uint32(seed ^ (seed >> np.uint32(4)))
        seed = np.uint32(seed * np.uint32(0x27D4EB2D))
        seed = np.uint32(seed ^ (seed >> np.uint32(15)))
    return seed


def test_wang_hash_matches_reference_impl():
    for s in [1, 42, 12345, 0xDEADBEEF, 2**32 - 1]:
        got = int(wang_hash(jnp.uint32(s)))
        want = int(np_wang_hash(np.uint32(s)))
        assert got == want, (s, got, want)


def test_rand01_value_rule():
    # value = (hash & 0x7FFFFFFF) / 2^31, exact float semantics
    s = 777
    h = int(np_wang_hash(np.uint32(s)))
    want = np.float32(h & 0x7FFFFFFF) * np.float32(1.0 / 2147483648.0)
    v, _ = rand01(jnp.uint32(s))
    assert np.float32(v) == want
    assert 0.0 <= float(v) < 1.0


def test_pixel_seed_formula():
    # (x*1973 + y*9277 + frame*26699) | 1, wrapping
    x, y, f = 1279, 719, 599
    with np.errstate(over="ignore"):
        want = np.uint32(
            np.uint32(x) * np.uint32(1973)
            + np.uint32(y) * np.uint32(9277)
            + np.uint32(f) * np.uint32(26699)
        ) | np.uint32(1)
    assert int(pixel_seed(x, y, f)) == int(want)


def test_wangrng_stream_deterministic():
    r1 = WangRng.from_pixel(3, 5, 7)
    r2 = WangRng.from_pixel(3, 5, 7)
    for _ in range(10):
        v1, r1 = r1.next01()
        v2, r2 = r2.next01()
        assert float(v1) == float(v2)


def test_wangrng_vectorizes():
    xs = jnp.arange(100, dtype=jnp.uint32)

    def draw3(x):
        rng = WangRng.from_pixel(x, jnp.uint32(0), jnp.uint32(0))
        a, rng = rng.next01()
        b, rng = rng.next01()
        c, rng = rng.next01()
        return jnp.stack([a, b, c])

    vals = jax.vmap(draw3)(xs)
    assert vals.shape == (100, 3)
    # distinct pixels give distinct draws
    assert len(np.unique(np.asarray(vals[:, 0]))) > 90


def test_counter_rng_addressable():
    # same (key, ctr) -> same value, independent of draw history
    a = counter_rand01(jnp.uint32(1), jnp.uint32(2), jnp.uint32(5), jnp.uint32(0))
    rng = CounterRng(jnp.uint32(1), jnp.uint32(2), jnp.uint32(0))
    vals = []
    for _ in range(6):
        v, rng = rng.next01()
        vals.append(float(v))
    assert np.isclose(vals[5], float(a))


def test_distribution_uniformish():
    # mean/var of 20k wang draws close to U[0,1)
    def draw(x):
        v, _ = rand01(x)
        return v

    seeds = (jnp.arange(20000, dtype=jnp.uint32) * jnp.uint32(2654435761)) | jnp.uint32(1)
    vals = np.asarray(jax.vmap(draw)(seeds))
    assert abs(vals.mean() - 0.5) < 0.01
    assert abs(vals.var() - 1 / 12) < 0.005


def test_counter_distribution_uniformish():
    ctrs = jnp.arange(20000, dtype=jnp.uint32)
    vals = np.asarray(
        jax.vmap(
            lambda c: counter_rand01(jnp.uint32(9), jnp.uint32(7), c, jnp.uint32(0))
        )(ctrs)
    )
    assert abs(vals.mean() - 0.5) < 0.01
    assert abs(vals.var() - 1 / 12) < 0.005

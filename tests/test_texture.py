"""Texture tests: RGBE codec roundtrip + reading real reference assets,
sampler math vs numpy, stochastic sampler expectation, cubemap face
select."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cpuperformanceraytracer_tpu.core.rng import WangRng
from cpuperformanceraytracer_tpu.core.vecmath import Vec2, Vec3
from cpuperformanceraytracer_tpu.texture.hdr import read_hdr, write_hdr
from cpuperformanceraytracer_tpu.texture.procedural import gradient_sky
from cpuperformanceraytracer_tpu.texture.texture import (
    cubemap_uv,
    equirect_uv,
    sample_bilinear,
    sample_nearest,
    sample_stochastic,
    texel_fetch,
    texture_from_array,
)

REF_HDR = "/root/reference/Textures/HDR_040_Field_Env.hdr"


def test_hdr_roundtrip(tmp_path):
    img = gradient_sky(32, 16, seed=1)
    p = str(tmp_path / "sky.hdr")
    write_hdr(p, img)
    back = read_hdr(p, flip_vertical=False)
    assert back.shape == img.shape
    # RGBE shares one 8-bit exponent per pixel: error bound is one
    # mantissa step of the pixel's BRIGHTEST channel
    step = img.max(axis=-1, keepdims=True) / 128.0
    assert np.all(np.abs(back - img) <= step + 1e-6)


@pytest.mark.skipif(not os.path.exists(REF_HDR), reason="reference asset absent")
def test_read_reference_env_map():
    img = read_hdr(REF_HDR)
    h, w, c = img.shape
    assert c == 3 and w == 2 * h  # equirect 2:1
    assert np.isfinite(img).all() and img.min() >= 0.0
    assert img.max() > 1.0  # HDR content


def test_texel_fetch_and_nearest():
    img = np.arange(4 * 6 * 3, dtype=np.float32).reshape(4, 6, 3)
    tex = texture_from_array(img)
    v = texel_fetch(tex, jnp.int32(2), jnp.int32(3))
    assert np.allclose([float(v.x), float(v.y), float(v.z)], img[2, 3])
    # clamping
    v = texel_fetch(tex, jnp.int32(99), jnp.int32(-5))
    assert np.allclose([float(v.x), float(v.y), float(v.z)], img[3, 0])
    # nearest at uv: row = v*(H-1), truncation
    v = sample_nearest(tex, Vec2(jnp.float32(0.5), jnp.float32(0.5)))
    assert np.allclose(float(v.x), img[1, 2, 0])  # floor(0.5*3), floor(0.5*5)


def test_bilinear_matches_numpy():
    rs = np.random.RandomState(0)
    img = rs.rand(5, 7, 3).astype(np.float32)
    tex = texture_from_array(img)

    def np_bilinear(u, v):
        row, col = v * 4, u * 6
        r0, c0 = int(np.floor(row)), int(np.floor(col))
        r1, c1 = int(np.ceil(row)), int(np.ceil(col))
        dv, du = row - r0, col - c0
        top = img[r0, c0] * (1 - du) + img[r0, c1] * du
        bot = img[r1, c0] * (1 - du) + img[r1, c1] * du
        return top * (1 - dv) + bot * dv

    for u, v in [(0.0, 0.0), (1.0, 1.0), (0.3, 0.7), (0.999, 0.001), (0.5, 0.5)]:
        got = sample_bilinear(tex, Vec2(jnp.float32(u), jnp.float32(v)))
        want = np_bilinear(u, v)
        assert np.allclose([float(got.x), float(got.y), float(got.z)], want,
                           atol=1e-5), (u, v)


def test_stochastic_expectation_is_bilinear():
    """E[TexelSampleRandom] == bilinear filter (texture.cpp:78-86)."""
    rs = np.random.RandomState(1)
    img = rs.rand(4, 4, 3).astype(np.float32)
    tex = texture_from_array(img)
    uv = Vec2(jnp.float32(0.37), jnp.float32(0.61))

    def draw(i):
        rng = WangRng.from_pixel(i, jnp.uint32(0), jnp.uint32(0))
        c, _ = sample_stochastic(tex, uv, rng)
        return c.x

    vals = np.asarray(jax.vmap(draw)(jnp.arange(20000, dtype=jnp.uint32)))
    want = float(sample_bilinear(tex, uv).x)
    assert abs(vals.mean() - want) < 0.01


def test_equirect_uv_known_directions():
    # +y pole -> v = 1; -y pole -> v = 0; u periodic
    uv = equirect_uv(Vec3(jnp.float32(0), jnp.float32(1), jnp.float32(0)))
    assert abs(float(uv.y) - (0.5 + 0.3183 * np.pi / 2)) < 1e-3
    uv = equirect_uv(Vec3(jnp.float32(1), jnp.float32(0), jnp.float32(0)))
    assert abs(float(uv.x) - 0.5) < 1e-6 and abs(float(uv.y) - 0.5) < 1e-6


def test_cubemap_face_offsets():
    # face order px,nx,py,ny,pz,nz stacked vertically (asset_loading.cpp:18-44)
    cases = [
        ((1, 0, 0), 0), ((-1, 0, 0), 1), ((0, 1, 0), 2),
        ((0, -1, 0), 3), ((0, 0, 1), 4), ((0, 0, -1), 5),
    ]
    for d, face in cases:
        uv = cubemap_uv(Vec3(jnp.float32(d[0]), jnp.float32(d[1]), jnp.float32(d[2])))
        v = float(uv.y)
        assert face / 6 <= v <= (face + 1) / 6 + 1e-6, (d, face, v)
        # face centers map to the center of the face strip
        assert abs(float(uv.x) - 0.5) < 1e-6

"""Colorspace round-trip invariants, mirroring TTilingEncoder.Test
(reference tilingencoder.pas:3847-3902): RGB<->LAB and RGB<->YUV must
round-trip exactly over random byte colors."""
import numpy as np
import jax.numpy as jnp

from tiler_tpu.ops import color


def _rand_rgb(n, seed=0x42381337):
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    return rng.randint(0, 256, size=(n, 3)).astype(np.float64)


def test_yuv_roundtrip_exact():
    rgb = _rand_rgb(10000)
    yuv = color.rgb_to_yuv(jnp.asarray(rgb))
    back = color.yuv_to_rgb(yuv)
    assert np.array_equal(np.asarray(back), rgb)


def test_lab_roundtrip_exact():
    rgb = _rand_rgb(10000, seed=1234)
    lab = color.rgb_to_lab(jnp.asarray(rgb))
    back = color.lab_to_rgb(lab)
    assert np.array_equal(np.asarray(back), rgb)


def test_luma():
    assert int(color.luma(jnp.array([255.0, 255.0, 255.0]))) == 255000
    assert int(color.luma(jnp.array([1.0, 2.0, 3.0]))) == 299 + 2 * 587 + 3 * 114


def test_hsv_known_values():
    hsv = color.rgb_to_hsv_bytes(np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [0, 0, 0], [128, 128, 128]]))
    # red: h=0; green: h=84; blue: h=168; gray: h=s=0
    assert hsv[0].tolist() == [0, 255, 255]
    assert hsv[1].tolist() == [84, 255, 255]
    assert hsv[2].tolist() == [168, 255, 255]
    assert hsv[3].tolist() == [0, 0, 0]
    assert hsv[4].tolist() == [0, 0, 128]


def test_hsv_negative_hue_wraps_like_pascal():
    # r max with g<b drives hue negative; Pascal `mod 252` keeps sign then
    # `and $ff` two's-complements it.
    hsv = color.rgb_to_hsv_bytes(np.array([[200, 10, 100]]))
    h = hsv[0, 0]
    # MulDiv(42, 10-100, 190) = -20 -> and $ff = 236
    assert h == 236


def test_posterize_identity_at_255():
    v = np.arange(256, dtype=np.int64)
    assert np.array_equal(color.posterize(v, 255), v)

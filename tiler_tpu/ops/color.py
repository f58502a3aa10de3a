"""Colorspace conversions, batched over arbitrary leading axes.

Exact constant parity with the reference implementation:
  - Rec.601 luma multipliers 299/587/114 (utils.pas:24-27)
  - YUV: u=(b-y)*0.492, v=(r-y)*0.877; inverse 1.13983/0.39465/0.58060/2.03211
    (utils.pas:480-510)
  - CIE LAB via Wright-Guild XYZ and illuminant D50 (utils.pas:374-466)
  - integer HSV (252-hue) used for palette color ordering (utils.pas:278-325)

All functions take float32/float64 arrays with a trailing channel axis of 3
and RGB in the 0..255 byte scale (the reference operates on byte values, not
normalized floats, for YUV; LAB normalizes internally).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

RED_MUL = 299
GREEN_MUL = 587
BLUE_MUL = 114
LUMA_DIV = RED_MUL + GREEN_MUL + BLUE_MUL  # 1000


def rgb_to_yuv(rgb):
    """RGB (0..255) -> YUV, reference utils.pas:487-500.

    y in 0..255; u,v signed.
    """
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = (
        r * (RED_MUL / LUMA_DIV)
        + g * (GREEN_MUL / LUMA_DIV)
        + b * (BLUE_MUL / LUMA_DIV)
    )
    u = (b - y) * 0.492
    v = (r - y) * 0.877
    return jnp.stack([y, u, v], axis=-1)


def yuv_to_rgb(yuv, clamp: bool = True):
    """YUV -> RGB floats (0..255 scale); reference utils.pas:502-525.

    With clamp=True, rounds and clamps to byte range like YUVToRGB.
    """
    y, u, v = yuv[..., 0], yuv[..., 1], yuv[..., 2]
    r = y + v * 1.13983
    g = y - u * 0.39465 - v * 0.58060
    b = y + u * 2.03211
    rgb = jnp.stack([r, g, b], axis=-1)
    if clamp:
        rgb = jnp.clip(jnp.round(rgb), 0, 255)
    return rgb


def _srgb_to_linear(c):
    # c in 0..1
    return jnp.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)


def _linear_to_srgb(c):
    return jnp.where(c > 0.0031308, 1.055 * jnp.maximum(c, 0.0) ** (1 / 2.4) - 0.055, 12.92 * c)


# Wright-Guild CIE XYZ matrix scaled by 1/0.17697 (utils.pas:386-389),
# then illuminant D50 white-point division (utils.pas:392-395).
_XYZ_M = np.array(
    [
        [0.49000, 0.31000, 0.20000],
        [0.17697, 0.81240, 0.01063],
        [0.00000, 0.01000, 0.99000],
    ]
) / 0.17697
_D50 = np.array([96.6797 / 100, 100.000 / 100, 82.5188 / 100])
_XYZ_M_D50 = _XYZ_M / _D50[:, None]

# inverse matrix used by LABToRGB (utils.pas:449-452); note the reference uses
# hand-rounded constants rather than the exact inverse, replicate them.
_XYZ_INV = np.array(
    [
        [0.41847, -0.15866, -0.082835],
        [-0.091169, 0.25243, 0.015708],
        [0.00092090, -0.0025498, 0.17860],
    ]
)


def rgb_to_lab(rgb):
    """RGB bytes (0..255 scale, float array) -> CIE L*a*b*, utils.pas:374-411."""
    c = rgb / 255.0
    lin = _srgb_to_linear(c)
    xyz = lin @ jnp.asarray(_XYZ_M_D50.T, dtype=lin.dtype)
    f = jnp.where(xyz > 0.008856, jnp.maximum(xyz, 1e-30) ** (1 / 3), 7.787 * xyz + 16 / 116)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    L = 116 * fy - 16
    a = 500 * (fx - fy)
    b = 200 * (fy - fz)
    return jnp.stack([L, a, b], axis=-1)


def lab_to_rgb(lab, clamp: bool = True):
    """L*a*b* -> RGB bytes; reference utils.pas:419-466."""
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (L + 16) / 116
    fx = a / 500 + fy
    fz = fy - b / 200
    f = jnp.stack([fx, fy, fz], axis=-1)
    xyz = jnp.where(f**3 > 0.008856, f**3, (f - 16 / 116) / 7.787)
    xyz = xyz * jnp.asarray(_D50, dtype=xyz.dtype)
    lin = xyz @ jnp.asarray(_XYZ_INV.T, dtype=xyz.dtype)
    srgb = _linear_to_srgb(lin)
    rgb = srgb * 255.0
    if clamp:
        rgb = jnp.clip(jnp.round(rgb), 0, 255)
    return rgb


def luma(rgb):
    """Integer-scale luma r*299+g*587+b*114 (utils.pas:262-265). Not divided."""
    return (
        rgb[..., 0] * RED_MUL + rgb[..., 1] * GREEN_MUL + rgb[..., 2] * BLUE_MUL
    )


def _muldiv(a, b, c):
    """Windows MulDiv: round-half-away-from-zero of a*b/c (c>0)."""
    num = a * b
    return np.sign(num) * ((np.abs(num) + c // 2) // c)


def rgb_to_hsv_bytes(rgb: np.ndarray) -> np.ndarray:
    """Integer HSV (h mod 252) used for palette color sort; utils.pas:278-325.

    rgb: integer array [..., 3] of bytes. Returns int array [..., 3] (h,s,v).
    Host-side (numpy): only used on tiny palette arrays.
    """
    rgb = rgb.astype(np.int64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = np.maximum(np.maximum(r, g), b)
    mn = np.minimum(np.minimum(r, g), b)
    delta = mx - mn
    nz = delta != 0
    safe_delta = np.where(nz, delta, 1)
    s = np.where(nz, _muldiv(delta, 255, np.where(mx == 0, 1, mx)), 0)
    # priority order r, then g, then b (first match on == max)
    h_r = _muldiv(42, g - b, safe_delta)
    h_g = _muldiv(42, b - r, safe_delta) + 84
    h_b = _muldiv(42, r - g, safe_delta) + 168
    h = np.where(r == mx, h_r, np.where(g == mx, h_g, h_b))
    # Pascal mod truncates toward zero (keeps sign), then `and $ff`
    h = np.where(nz, np.fmod(h, 252).astype(np.int64) & 0xFF, 0)
    return np.stack([h, s, np.where(nz, mx, mx)], axis=-1).astype(np.int64)


def posterize(v: np.ndarray, cvt: int) -> np.ndarray:
    """Posterize byte values (utils.pas:536-545). cvt=255 is the identity."""
    return np.round(np.round(v * cvt / 255.0) * 255.0 / cvt).astype(v.dtype)

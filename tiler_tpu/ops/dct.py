"""8x8 psycho-visual DCT features as batched matmuls.

Replaces the reference's LUT-driven unrolled/asm inner products
(tilingencoder.pas:3103-3230, utils.pas:874-1035) with the MXU-friendly
separable form  Z = D @ P @ D^T  per channel, where
    D[u, x] = q[u] * cos((x + 0.5) * u * pi / 8)          (standard DCT)
    Dspe[u, x] = q[u] * cos((x + 0.5) * u * pi / 16)      ("Spe" half-freq DCT)
    q = [sqrt(0.5), 1, 1, 1, 1, 1, 1, 1]
which folds in cDCTUVRatio[v][u] = q[v]*q[u] (utils.pas:100-110).
LUT construction parity: tilingencoder.pas:1701-1727.

Feature vector layout matches the reference exactly: per channel, the 64
coefficients in (v,u) raster order are scattered through the zigzag
"snake" map (utils.pas:59-68):  out[c*64 + SNAKE[i]] = z[c, i].

Weighted modes multiply by the daala PSNR-HVS inverse quantization matrix
cDCTWeights (utils.pas:72-97) before quantization.

Modes mirror TPsyVisMode (tilingencoder.pas:21):
  dct, weighted_dct, wavelets, spe_dct, weighted_spe_dct
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .color import rgb_to_lab, rgb_to_yuv

TILE_W = 8
TILE_DCT_SIZE = 192

# zigzag scatter map, cDCTSnake (utils.pas:59-68)
SNAKE = np.array(
    [
        0, 1, 5, 6, 14, 15, 27, 28,
        2, 4, 7, 13, 16, 26, 29, 42,
        3, 8, 12, 17, 25, 30, 41, 43,
        9, 11, 18, 24, 31, 40, 44, 53,
        10, 19, 23, 32, 39, 45, 52, 54,
        20, 22, 33, 38, 46, 51, 55, 60,
        21, 34, 37, 47, 50, 56, 59, 61,
        35, 36, 48, 49, 57, 58, 62, 63,
    ],
    dtype=np.int32,
)
# SNAKE_INV[j] = i such that SNAKE[i] == j ; out = z[SNAKE_INV]
SNAKE_INV = np.argsort(SNAKE).astype(np.int32)

# PSNR-HVS weights for (Y,U,V), cDCTWeights (utils.pas:72-97), from daala
# dump_psnrhvs.c. Symmetric 8x8 per channel.
_W_Y = [1.6193873005, 2.2901594831, 2.08509755623, 1.48366094411, 1.00227514334, 0.678296995242, 0.466224900598, 0.3265091542,
        1.94321815382, 2.04793073064, 1.68731108984, 1.2305666963, 0.868920337363, 0.61280991668, 0.436405793551,
        1.34329019223, 1.09205635862, 0.875748795257, 0.670882927016, 0.501731932449, 0.372504254596,
        0.772819797575, 0.605636379554, 0.48309405692, 0.380429446972, 0.295774038565,
        0.448996256676, 0.352889268808, 0.283006984131, 0.226951348204,
        0.27032073436, 0.215017739696, 0.17408067321,
        0.168869545842, 0.136153931001,
        0.109083846276]
_W_U = [1.91113096927, 2.46074210438, 1.18284184739, 1.14982565193, 1.05017074788, 0.898018824055, 0.74725392039, 0.615105596242,
        1.58529308355, 1.21363250036, 1.38190029285, 1.33100189972, 1.17428548929, 0.996404342439, 0.830890433625,
        0.978712413627, 1.02624506078, 1.03145147362, 0.960060382087, 0.849823426169, 0.731221236837,
        0.861317501629, 0.801821139099, 0.751437590932, 0.685398513368, 0.608694761374,
        0.676555426187, 0.605503172737, 0.55002013668, 0.495804539034,
        0.514674450957, 0.454353482512, 0.407050308965,
        0.389234902883, 0.342353999733,
        0.295530605237]
_W_V = [2.03871978502, 2.62502345193, 1.26180942886, 1.11019789803, 1.01397751469, 0.867069376285, 0.721500455585, 0.593906509971,
        1.69112867013, 1.17180569821, 1.3342742857, 1.28513006198, 1.13381474809, 0.962064122248, 0.802254508198,
        0.944981930573, 0.990876405848, 0.995903384143, 0.926972725286, 0.820534991409, 0.706020324706,
        0.831632933426, 0.77418706195, 0.725539939514, 0.661776842059, 0.587716619023,
        0.653238524286, 0.584635025748, 0.531064164893, 0.478717061273,
        0.496936637883, 0.438694579826, 0.393021669543,
        0.375820256136, 0.330555063063,
        0.285345396658]


def _expand_sym(tri):
    """Expand upper-triangle-with-diagonal row-major list into symmetric 8x8."""
    m = np.zeros((8, 8))
    it = iter(tri)
    for i in range(8):
        for j in range(i, 8):
            m[i, j] = next(it)
            m[j, i] = m[i, j]
    return m


DCT_WEIGHTS = np.stack([_expand_sym(_W_Y), _expand_sym(_W_U), _expand_sym(_W_V)])  # [3,8,8]


def _dct_matrix(spe: bool) -> np.ndarray:
    """D[u, x] = q[u]*cos((x+0.5)*u*pi/(8 or 16)); tilingencoder.pas:1706-1707."""
    q = np.ones(8)
    q[0] = np.sqrt(0.5)
    x = np.arange(8)[None, :]
    u = np.arange(8)[:, None]
    div = TILE_W * 2 if spe else TILE_W
    return q[:, None] * np.cos((x + 0.5) * u * np.pi / div)


DCT_MAT = _dct_matrix(spe=False)  # [8(u), 8(x)]
DCT_MAT_SPE = _dct_matrix(spe=True)

MODES = ("dct", "weighted_dct", "wavelets", "spe_dct", "weighted_spe_dct")


def to_cpn(tiles_rgb, use_lab: bool = False):
    """RGB tiles [..., 8, 8, 3] (byte scale floats) -> YUV or LAB channels.

    Mirrors ConvertToCpnPixels (tilingencoder.pas:3049-3101); returns
    [..., 8, 8, 3] with the component axis last.
    """
    return rgb_to_lab(tiles_rgb) if use_lab else rgb_to_yuv(tiles_rgb)


@functools.partial(jax.jit, static_argnames=("mode", "use_lab"))
def tile_features(tiles_rgb, mode: str = "weighted_dct", use_lab: bool = False):
    """Psycho-visual features of RGB tiles.

    tiles_rgb: [..., 8, 8, 3] float (0..255). Returns [..., 192] float32 in
    the reference's snake/zigzag layout (ComputeTilePsyVisFeatures,
    tilingencoder.pas:3133-3182).
    """
    cpn = to_cpn(tiles_rgb, use_lab)  # [..., y, x, c]
    return cpn_features(cpn, mode)


def cpn_features(cpn, mode: str = "weighted_dct"):
    """DCT features from component planes [..., 8(y), 8(x), 3(c)] -> [..., 192]."""
    if mode == "wavelets":
        z = _wavelet2(cpn)  # [..., v, u, c]
    else:
        spe = mode in ("spe_dct", "weighted_spe_dct")
        D = jnp.asarray(DCT_MAT_SPE if spe else DCT_MAT, dtype=cpn.dtype)
        # z[v,u,c] = sum_{y,x} D[v,y] P[y,x,c] D[u,x]
        z = jnp.einsum("vy,...yxc,ux->...vuc", D, cpn, D, precision="highest")
        if mode in ("weighted_dct", "weighted_spe_dct"):
            w = jnp.asarray(DCT_WEIGHTS, dtype=cpn.dtype)  # [c,v,u]
            z = z * jnp.transpose(w, (1, 2, 0))
    # zigzag: out[c*64 + SNAKE[i]] = zflat[c*64 + i]  <=>  out = zflat[SNAKE_INV]
    zflat = jnp.moveaxis(z, -1, -3).reshape(*z.shape[:-3], TILE_DCT_SIZE)
    inv = jnp.asarray(SNAKE_INV)
    idx = jnp.concatenate([inv, inv + 64, inv + 128])
    return zflat[..., idx]


def quantize_features(feat):
    """Round to int16 like the SmallInt path (tilingencoder.pas:3126).

    Pascal Round() is round-half-to-even, same as jnp.round.
    """
    return jnp.round(feat).astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("mode", "use_lab", "clamp"))
def inv_tile_features(feat, mode: str = "weighted_dct", use_lab: bool = False, clamp: bool = True):
    """Inverse of tile_features (non-Spe modes only); tilingencoder.pas:3184-3255.

    feat: [..., 192] -> RGB tiles [..., 8, 8, 3] (rounded bytes if clamp).
    """
    assert mode in ("dct", "weighted_dct", "wavelets")
    snake = jnp.asarray(SNAKE)
    idx = jnp.concatenate([snake, snake + 64, snake + 128])
    zflat = feat[..., idx]  # undo zigzag -> (c,v,u) raster
    z = zflat.reshape(*feat.shape[:-1], 3, 8, 8)
    z = jnp.moveaxis(z, -3, -1)  # [..., v, u, c]
    if mode == "weighted_dct":
        w = jnp.asarray(DCT_WEIGHTS, dtype=z.dtype)
        z = z / jnp.transpose(w, (1, 2, 0))
    if mode == "wavelets":
        cpn = _inv_wavelet2(z)
    else:
        # P = E^T (Z * q q^T) E / 16 with E[u,x]=cos((x+0.5)u pi/8) = D/q ;
        # equivalently P = (D^T/qq) (Z*qq) ... folded: P = 4/16 * Dpinv form.
        # Using orthogonality sum_u q[u]^2 E[u,x]E[u,x'] = 4*delta:
        # P = (1/16) E^T (Z hadamard qq^T) E
        E = jnp.asarray(DCT_MAT / np.array([np.sqrt(0.5), 1, 1, 1, 1, 1, 1, 1])[:, None], dtype=z.dtype)
        q = jnp.asarray(np.array([np.sqrt(0.5), 1, 1, 1, 1, 1, 1, 1]), dtype=z.dtype)
        zq = z * q[:, None, None] * q[None, :, None]
        cpn = jnp.einsum("vy,...vuc,ux->...yxc", E, zq, E, precision="highest") / 16.0
    if use_lab:
        from .color import lab_to_rgb

        return lab_to_rgb(cpn, clamp=clamp)
    from .color import yuv_to_rgb

    return yuv_to_rgb(cpn, clamp=clamp)


# Python float (weakly typed): keeps f32 operands f32 — an np.float64
# scalar would promote them and make the wavelet scatter an unsafe cast
_ISQRT2 = float(np.sqrt(2) / 2)


def _haar_pair(v):
    """One normalized Haar step along the last-but-one (row-pair) axis."""
    a = v[..., 0::2, :, :]
    b = v[..., 1::2, :, :]
    s = (a + b) * _ISQRT2
    d = (a - b) * _ISQRT2
    return jnp.concatenate([s, d], axis=-3)


def _wavelet2(cpn):
    """2-level normalized Haar transform (WaveletGS, tilingencoder.pas:2727-2762).

    The reference transforms rows then cols per level over the top-left
    quadrant. Implemented densely for 8x8.
    """
    x = cpn
    for level, size in ((0, 8), (1, 4)):
        sub = x[..., :size, :size, :]
        # rows: pairs along x
        a = sub[..., :, 0::2, :]
        b = sub[..., :, 1::2, :]
        rows = jnp.concatenate([(a + b), (a - b)], axis=-2) * _ISQRT2
        # cols: pairs along y
        a = rows[..., 0::2, :, :]
        b = rows[..., 1::2, :, :]
        cols = jnp.concatenate([(a + b), (a - b)], axis=-3) * _ISQRT2
        x = x.at[..., :size, :size, :].set(cols)
    return x


def _inv_wavelet2(z):
    """Inverse of _wavelet2 (DeWaveletGS, tilingencoder.pas:2764-2925)."""
    x = z
    for level, size in ((1, 4), (0, 8)):
        sub = x[..., :size, :size, :]
        h = size // 2
        # cols inverse
        s = sub[..., :h, :, :]
        d = sub[..., h:, :, :]
        a = (s + d) * _ISQRT2
        b = (s - d) * _ISQRT2
        cols = jnp.stack([a, b], axis=-3).reshape(*a.shape[:-3], size, size, a.shape[-1])
        # rows inverse
        s = cols[..., :, :h, :]
        d = cols[..., :, h:, :]
        a = (s + d) * _ISQRT2
        b = (s - d) * _ISQRT2
        rows = jnp.stack([a, b], axis=-2).reshape(*a.shape[:-3], size, size, a.shape[-1])
        x = x.at[..., :size, :size, :].set(rows)
    return x

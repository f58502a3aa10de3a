"""Motion prediction: windowed weighted-DCT L2 search, batched on device.

Replaces the reference's per-tile double loop over (2R)^2 candidate offsets
with SSE distance kernels (TFrame.PredictMotion, tilingencoder.pas:1154-1290):

  1. The weighted-DCT of EVERY 8x8 window of the reference frame is one
     grouped convolution (192 filters = DCT basis x PSNR-HVS weights) —
     MXU work, no per-window loop.
  2. Candidate distances use |t - w|^2 = |t|^2 - 2 t.w + |w|^2 ; offsets
     split o = 8q + s into block shifts and phases, and the cross terms
     come REVERSED: each field block runs one matmul against its 2Qx2Q
     neighboring tiles, so the (large) window field is read exactly once
     per frame and all slicing is static — no gathers on the hot path.
  3. A Manhattan-distance penalty toward the zero offset breaks ties in
     favor of compressible motion vectors (reference :1232-1235).

Search window parity: for radius R the reference scans offsets
[dy-R, dy+R-1] x [dx-R, dx+R-1] clipped to the frame (:1209-1214 after the
Dec(ARadius) at :1265); out-of-frame windows are masked with +inf here.

Deviation from the reference: window features stay float32 instead of the
reference's int16 rounding (tilingencoder.pas:3126) — distances differ by
well under the quantization noise, selection may differ on near-ties.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.color import rgb_to_yuv
from ..ops.dct import DCT_MAT, DCT_WEIGHTS

TILE_W = 8
K = 192


@functools.lru_cache(maxsize=None)
def _window_filters():
    """[8, 8, 1, 192] HWIO grouped-conv filters: for input channel c (group),
    output channel c*64 + v*8+u is the weighted DCT basis function."""
    D = DCT_MAT  # [u, x]
    f = np.einsum("vy,ux->vuyx", D, D)  # [v, u, y, x]
    w = DCT_WEIGHTS  # [c, v, u]
    filt = np.einsum("cvu,vuyx->yxcvu", w, f)  # [y, x, c, v, u]
    return filt.reshape(8, 8, 3, 64).astype(np.float32)


def window_dct_field(frame_rgb):
    """Weighted-DCT features of every 8x8 window. frame_rgb [H, W, 3] float.

    Returns [H-7, W-7, 192] float32 (channel blocks of 64 in (v,u) raster
    order — NOT zigzagged; L2 distances are permutation-invariant).
    """
    yuv = rgb_to_yuv(frame_rgb.astype(jnp.float32))
    # grouped conv (feature_group_count=3): input channel c produces output
    # channels [c*64, (c+1)*64) — the (v,u) raster DCT block of that channel.
    filt = jnp.asarray(_window_filters()).reshape(8, 8, 1, 192)
    out = jax.lax.conv_general_dilated(
        yuv[None],  # [1, H, W, 3]
        filt,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=3,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0]  # [H-7, W-7, 192]


def tile_features_raster(tiles_rgb):
    """Weighted-DCT YUV features in (c, v, u) raster layout (no zigzag);
    tiles_rgb [..., 8, 8, 3] -> [..., 192]."""
    yuv = rgb_to_yuv(tiles_rgb.astype(jnp.float32))
    D = jnp.asarray(DCT_MAT, jnp.float32)
    z = jnp.einsum("vy,...yxc,ux->...cvu", D, yuv, D, precision="highest")
    w = jnp.asarray(DCT_WEIGHTS, jnp.float32)
    z = z * w
    return z.reshape(*z.shape[:-3], K)


@functools.partial(jax.jit, static_argnames=("radius",))
def motion_search_batch(cur_rgb, prev_rgb, radius: int):
    """Batched motion search over leading frame axis [B, H, W, 3]."""
    return jax.vmap(lambda a, b: _motion_core(a, b, radius))(cur_rgb, prev_rgb)


@functools.partial(jax.jit, static_argnames=("radius",))
def motion_search(cur_rgb, prev_rgb, radius: int):
    return _motion_core(cur_rgb, prev_rgb, radius)


def _motion_core(cur_rgb, prev_rgb, radius: int):
    """Full-frame motion search of cur against prev.

    cur_rgb/prev_rgb: [H, W, 3] float or uint8 (H, W multiples of 8).
    Returns (pred_y, pred_x) int32 [Th, Tw] and err float32 [Th, Tw]
    (squared weighted-DCT L2 + Manhattan tie penalty, reference :1228-1244).
    """
    H, W = cur_rgb.shape[0], cur_rgb.shape[1]
    th, tw = H // TILE_W, W // TILE_W
    R = int(radius)
    Q = -(-R // TILE_W)  # blocks per side
    P = Q * TILE_W

    # tile features of current frame (natural orientation = raw frame)
    cur = cur_rgb.astype(jnp.float32).reshape(th, TILE_W, tw, TILE_W, 3).swapaxes(1, 2)
    T = tile_features_raster(cur)  # [th, tw, 192]
    T2 = jnp.sum(T * T, axis=-1)  # [th, tw]

    # window field of previous frame + norms
    F = window_dct_field(prev_rgb)  # [H-7, W-7, 192]
    N2 = jnp.sum(F * F, axis=-1)  # [H-7, W-7]

    # pad to phase grid: field index = tile_pixel_pos + offset + P
    ph = (-(H - 7 + 2 * P)) % TILE_W
    pw = (-(W - 7 + 2 * P)) % TILE_W
    Fp = jnp.pad(F, ((P, P + ph), (P, P + pw), (0, 0)))
    N2p = jnp.pad(N2, ((P, P + ph), (P, P + pw)), constant_values=jnp.inf)
    mh = Fp.shape[0] // TILE_W
    mw = Fp.shape[1] // TILE_W
    # Fblk[m, n, sy, sx, k] = Fp[8m+sy, 8n+sx, k]; bf16 — the cross terms
    # only rank candidates (exact winner error recomputed from fp32 Fp
    # below), and bf16 halves the dominant HBM traffic.
    Fblk = (
        Fp.astype(jnp.bfloat16)
        .reshape(mh, TILE_W, mw, TILE_W, K)
        .transpose(0, 2, 1, 3, 4)
        .reshape(mh, mw, 64, K)
    )
    N2blk = N2p.reshape(mh, TILE_W, mw, TILE_W).transpose(0, 2, 1, 3)

    # Cross terms, REVERSED: for each field block (m, n), one matmul against
    # its 2Q x 2Q neighbor tiles reads the (big) field exactly once —
    # D[m, n, s, q] = Fblk[m, n, s, :] . T[m - qy, n - qx, :]
    # (the shift-major formulation re-reads the field 4Q^2 times).
    Tb = T.astype(jnp.bfloat16)
    tpad = jnp.pad(Tb, ((2 * Q - 1, mh - th), (2 * Q - 1, mw - tw), (0, 0)))
    neigh = jnp.stack(
        [
            tpad[2 * Q - 1 - qy : 2 * Q - 1 - qy + mh, 2 * Q - 1 - qx : 2 * Q - 1 - qx + mw]
            for qy in range(2 * Q)
            for qx in range(2 * Q)
        ],
        axis=2,
    )  # [mh, mw, 4Q^2, K]
    D = jnp.einsum(
        "mnsk,mnqk->mnsq", Fblk, neigh, preferred_element_type=jnp.float32
    )  # [mh, mw, 64(s), 4Q^2(q)]

    # gather back to tile-major: err[i, j, qy, qx, sy, sx]
    rows = []
    for qy in range(2 * Q):
        cols = []
        for qx in range(2 * Q):
            C = D[qy : qy + th, qx : qx + tw, :, qy * 2 * Q + qx].reshape(
                th, tw, TILE_W, TILE_W
            )
            Nw = N2blk[qy : qy + th, qx : qx + tw]
            cols.append(T2[:, :, None, None] - 2.0 * C + Nw)
        rows.append(jnp.stack(cols, axis=2))  # [th, tw, 2Q, 8, 8]
    err = jnp.stack(rows, axis=2)  # [th, tw, 2Q(qy), 2Q(qx), 8(sy), 8(sx)]

    # offsets and penalties
    q = np.arange(2 * Q) * TILE_W - P
    s = np.arange(TILE_W)
    oy = (q[:, None] + s[None, :]).reshape(-1)  # [2Q*8] raster (qy, sy)
    valid = (oy >= -R) & (oy <= R - 1)
    # reorder err axes to [th, tw, (qy,sy), (qx,sx)] raster offsets
    err = err.transpose(0, 1, 2, 4, 3, 5).reshape(th, tw, 2 * Q * TILE_W, 2 * Q * TILE_W)
    oyv = jnp.asarray(oy, jnp.float32)
    pen = jnp.abs(oyv)[:, None] + jnp.abs(oyv)[None, :]
    mask = jnp.asarray(valid)[:, None] & jnp.asarray(valid)[None, :]
    err = jnp.where(mask, err + pen, jnp.inf)

    flat = err.reshape(th, tw, -1)
    best = jnp.argmin(flat, axis=-1)
    n_off = 2 * Q * TILE_W
    best_oy = jnp.asarray(oy)[best // n_off].astype(jnp.int32)
    best_ox = jnp.asarray(oy)[best % n_off].astype(jnp.int32)

    # The norm expansion loses ~4 digits to cancellation when the match is
    # good (norms ~1e7, distances ~1e3): recompute the winner's error
    # exactly with a direct gather of its window feature vector.
    ti = jnp.arange(th, dtype=jnp.int32)[:, None] * TILE_W + best_oy + P
    tj = jnp.arange(tw, dtype=jnp.int32)[None, :] * TILE_W + best_ox + P
    Wv = Fp[ti.reshape(-1), tj.reshape(-1)]  # [th*tw, 192]
    diff = T.reshape(-1, K) - Wv
    exact = jnp.sum(diff * diff, axis=-1).reshape(th, tw)
    exact = exact + jnp.abs(best_oy).astype(jnp.float32) + jnp.abs(best_ox).astype(jnp.float32)
    return best_oy, best_ox, exact

"""esReconstruct: the rate-distortion core.

Reference (TFrame.Reconstruct, tilingencoder.pas:1430-1679): per frame,
per cell, redo motion search against the previous *reconstructed* frame,
query an int16 kd-tree of corpus-tiles-rendered-through-their-palettes
(k=1, or the k=64 "extended palette usage" cartesian re-rank), pick the
lower error (ties favor prediction), draw the winner, accumulate PSNR.

TPU-native split:
  Phase A (parallel across ALL frames): the KNN half does not depend on
    reconstruction, so every frame's candidates are batched matmuls
    against the corpus dataset (chunked over the corpus; exact brute
    force replaces the approximate kd-tree).
  Phase B (sequential scan over frames): only the motion re-search needs
    the previous reconstruction. Winner selection, framebuffer rendering
    and PSNR accumulation ride along.

EPU parity (:1563-1609): candidates = top-k corpus tiles; the candidate
palette set = their initial palettes; the cartesian product is evaluated
with candidates sorted ascending (tile-major, palette-minor) so argmin
tie-breaking matches the reference's strict-< sorted iteration.

Decision parity (:1614-1654): prediction is "perfect" when
mpErr <= 192 (skip KNN); otherwise KNN wins only when
knnErr < mpErr - 192 (CompareValue with cTileDCTSize tolerance).

Deviation: errors are float32 of exactly-computed distances (the
reference uses int16-quantized features); and predicted cells do not
retain their KNN tile_idx (the reference lets Reindex count never-emitted
tiles into the TileSet, tilingencoder.pas:2012-2030 — dropping them only
shrinks the stream).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EncoderSettings
from ..models.state import EncodeState
from ..ops.color import rgb_to_yuv
from ..ops.dct import DCT_MAT, DCT_WEIGHTS
from ..ops.metrics import euclidean_to_psnr
from .motion import motion_search, tile_features_raster

TILE_W = 8
K = 192
TOL = 192.0  # cTileDCTSize comparison tolerance (tilingencoder.pas:1535,1614)


def _render_corpus(state: EncodeState) -> np.ndarray:
    """Corpus tiles through their own palettes -> RGB uint8 [T, 8, 8, 3]
    (PrepareReconstruct DoPsyV, tilingencoder.pas:4577-4597)."""
    pal = state.palettes_rgb  # [P, S, 3]
    return pal[state.corpus_pal_initial[:, None, None], state.corpus_pal_pixels]


def _indicator_dcts(pal_pixels: np.ndarray, S: int, chunk: int = 8192) -> np.ndarray:
    """G[t, vu, s] = DCT2D(indicator(pal_pixels == s)) — the linear map from
    palette YUV colors to the tile's DCT features. [T, 64, S] float32."""
    T = len(pal_pixels)
    D = jnp.asarray(DCT_MAT, jnp.float32)

    @jax.jit
    def go(pp):
        oh = jax.nn.one_hot(pp, S, dtype=jnp.float32)  # [B, 8, 8, S]
        return jnp.einsum("vy,byxs,ux->bvus", D, oh, D, precision="highest").reshape(-1, 64, S)

    out = np.empty((T, 64, S), np.float32)
    for i in range(0, T, chunk):
        out[i : i + chunk] = np.asarray(go(jnp.asarray(pal_pixels[i : i + chunk])))
    return out


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def _topk_candidates(feats, ds, k: int, chunk: int):
    """feats [N, 192] vs dataset ds [T, 192]: top-k smallest L2 (expansion
    for ranking; exact errors are recomputed by the EPU/selection pass).
    Returns (idx [N, k] int32, err [N, k] f32 ascending)."""
    N = feats.shape[0]
    T = ds.shape[0]
    f2 = jnp.sum(feats * feats, axis=1, keepdims=True)
    nchunks = -(-T // chunk)
    Tpad = nchunks * chunk
    dsp = jnp.pad(ds, ((0, Tpad - T), (0, 0)))
    d2pad = jnp.sum(dsp * dsp, axis=1)

    def body(carry, i):
        best_err, best_idx = carry
        c = jax.lax.dynamic_slice(dsp, (i * chunk, 0), (chunk, K))
        c2 = jax.lax.dynamic_slice(d2pad, (i * chunk,), (chunk,))
        d = f2 - 2.0 * (feats @ c.T) + c2[None, :]
        d = jnp.where((i * chunk + jnp.arange(chunk))[None, :] < T, d, jnp.inf)
        allerr = jnp.concatenate([best_err, d], axis=1)
        cidx = (i * chunk + jnp.arange(chunk)).astype(jnp.int32)
        allidx = jnp.concatenate([best_idx, cidx[None, :].repeat(N, 0)], axis=1)
        negerr, sel = jax.lax.top_k(-allerr, k)
        return (-negerr, jnp.take_along_axis(allidx, sel, axis=1)), None

    init = (jnp.full((N, k), jnp.inf), jnp.zeros((N, k), jnp.int32))
    (err, idx), _ = jax.lax.scan(body, init, jnp.arange(nchunks))
    return idx, err


@functools.partial(jax.jit, static_argnames=("S",))
def _epu_rank(feats, cand_idx, cand_pal, G, pal_yuv, S: int):
    """Exact cartesian re-rank (EPU). feats [B,192]; cand_idx [B,kk] sorted
    ascending tile idx; cand_pal [B,kk] sorted ascending palette idx;
    G [T,64,S]; pal_yuv [P,S,3]. Returns (tile, pal, err) per cell."""
    B, kk = cand_idx.shape
    w = jnp.asarray(DCT_WEIGHTS, jnp.float32)  # [c, v, u]
    wf = w.transpose(1, 2, 0).reshape(64, 3)  # [vu, c]
    Gi = G[cand_idx]  # [B, kk, 64, S]
    Py = pal_yuv[cand_pal]  # [B, kk, S, 3]
    # rendered features[b, i, j, vu, c] = sum_s Gi[b,i,vu,s] Py[b,j,s,c] * w
    rf = jnp.einsum("bivs,bjsc->bijvc", Gi, Py)
    rf = rf * wf[None, None, None]
    # feats layout from tile_features_raster is channel-major [c*64 + vu]
    ft = feats.reshape(B, 3, 64).transpose(0, 2, 1)[:, None, None]  # [B,1,1,vu,c]
    d = rf - ft
    err = jnp.sum(d * d, axis=(-2, -1))  # [B, kk, kk]
    flat = err.reshape(B, kk * kk)
    best = jnp.argmin(flat, axis=1)
    bi, bj = best // kk, best % kk
    return (
        jnp.take_along_axis(cand_idx, bi[:, None], 1)[:, 0],
        jnp.take_along_axis(cand_pal, bj[:, None], 1)[:, 0],
        jnp.take_along_axis(flat, best[:, None], 1)[:, 0],
    )


def _knn_phase(state: EncodeState, settings: EncoderSettings,
               cell_chunk: int = 512) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Phase A: per-cell best (tile, palette, err) over all frames."""
    F, N = state.n_frames, state.tilemap_size
    rendered = _render_corpus(state).astype(np.float32)
    ds = np.asarray(tile_features_raster(jnp.asarray(rendered)))  # [T, 192]
    dsj = jnp.asarray(ds)
    T = len(ds)
    epu = settings.frame_tiling_extended_palette_usage
    kk = min(settings.epu_knn_k, T) if epu else 1

    pal_initial = jnp.asarray(state.corpus_pal_initial.astype(np.int32))
    best_tile = np.empty((F, N), np.int32)
    best_pal = np.empty((F, N), np.int32)
    best_err = np.empty((F, N), np.float32)

    G = None
    pal_yuv = None
    if epu:
        G = jnp.asarray(_indicator_dcts(state.corpus_pal_pixels, settings.palette_size))
        pal_yuv = jnp.asarray(
            np.asarray(rgb_to_yuv(jnp.asarray(state.palettes_rgb, jnp.float32)))
        )

    for f in range(F):
        tiles = jnp.asarray(state.tiles_canon[f], jnp.float32)  # canonical
        feats = tile_features_raster(tiles.reshape(N, 8, 8, 3))
        idx, err = _topk_candidates(feats, dsj, kk, min(settings.corpus_chunk, max(256, T)))
        if not epu:
            # exact recompute of the single winner's error
            d = feats - dsj[idx[:, 0]]
            exact = jnp.sum(d * d, axis=1)
            best_tile[f] = np.asarray(idx[:, 0])
            best_pal[f] = np.asarray(pal_initial[idx[:, 0]])
            best_err[f] = np.asarray(exact)
        else:
            cand_idx = jnp.sort(idx, axis=1)
            cand_pal = jnp.sort(pal_initial[idx], axis=1)
            for c0 in range(0, N, cell_chunk):
                c1 = min(N, c0 + cell_chunk)
                t, p, e = _epu_rank(
                    feats[c0:c1], cand_idx[c0:c1], cand_pal[c0:c1],
                    G, pal_yuv, settings.palette_size,
                )
                best_tile[f, c0:c1] = np.asarray(t)
                best_pal[f, c0:c1] = np.asarray(p)
                best_err[f, c0:c1] = np.asarray(e)
    return best_tile, best_pal, best_err


@functools.partial(jax.jit, static_argnames=("th", "tw"))
def _render_frame(back, knn_rgb, pred_y, pred_x, use_pred, th: int, tw: int):
    """Compose the front buffer: predicted cells copy from `back` at their
    offsets, others take the pre-rendered knn tile."""
    H, W = th * TILE_W, tw * TILE_W
    # gather predicted windows
    ys = (jnp.arange(th) * TILE_W)[:, None] + pred_y.reshape(th, tw)
    xs = (jnp.arange(tw) * TILE_W)[None, :] + pred_x.reshape(th, tw)
    oy = ys[:, :, None, None] + jnp.arange(TILE_W)[None, None, :, None]
    ox = xs[:, :, None, None] + jnp.arange(TILE_W)[None, None, None, :]
    pred_tiles = back[oy, ox]  # [th, tw, 8, 8, 3]
    chosen = jnp.where(
        use_pred.reshape(th, tw, 1, 1, 1), pred_tiles, knn_rgb.reshape(th, tw, TILE_W, TILE_W, 3)
    )
    return chosen.transpose(0, 2, 1, 3, 4).reshape(H, W, 3)


def reconstruct(state: EncodeState, settings: EncoderSettings) -> EncodeState:
    F, N = state.n_frames, state.tilemap_size
    th, tw = state.tilemap_h, state.tilemap_w
    tm = state.tilemap
    R = settings.motion_predict_radius

    knn_tile, knn_pal, knn_err = _knn_phase(state, settings)

    # pre-render every cell's knn choice (palette + mirrors applied)
    pal = state.palettes_rgb  # [P, S, 3]
    pp = state.corpus_pal_pixels

    kf_start = np.zeros(F, bool)
    for kf in state.keyframes:
        kf_start[kf.start_frame] = True

    kf_psnr_accum = np.zeros(len(state.keyframes), np.float64)
    back = jnp.zeros((state.height, state.width, 3), jnp.float32)

    for f in range(F):
        do_mp = (not kf_start[f]) and R >= 1
        if do_mp:
            oy, ox, mperr = motion_search(
                jnp.asarray(state.frames_rgb[f], jnp.float32), back, R
            )
            oy = np.asarray(oy).reshape(N)
            ox = np.asarray(ox).reshape(N)
            mperr = np.asarray(mperr).reshape(N)
        else:
            oy = np.zeros(N, np.int32)
            ox = np.zeros(N, np.int32)
            mperr = np.full(N, np.inf, np.float32)

        kerr = knn_err[f]
        perfect = mperr <= TOL
        knn_wins = (~perfect) & (kerr < mperr - TOL)
        use_pred = ~knn_wins

        tm.predicted[f] = use_pred
        tm.pred_y[f] = oy
        tm.pred_x[f] = ox
        tm.tile_idx[f] = np.where(knn_wins, knn_tile[f].astype(np.int64), -1)
        tm.pal_idx[f] = np.where(knn_wins, knn_pal[f], -1)
        cell_err = np.where(use_pred, mperr, kerr)
        tm.psnr[f] = np.asarray(euclidean_to_psnr(jnp.asarray(cell_err)))
        kf_psnr_accum[state.frame_kf[f]] += float(tm.psnr[f].sum())

        # render front buffer
        knn_rgb = pal[knn_pal[f][:, None, None], pp[knn_tile[f]]].astype(np.float32)
        hmv = tm.hmirror[f][:, None, None, None]
        vmv = tm.vmirror[f][:, None, None, None]
        knn_rgb = np.where(hmv, knn_rgb[:, :, ::-1], knn_rgb)
        knn_rgb = np.where(vmv, knn_rgb[:, ::-1, :], knn_rgb)
        front = _render_frame(
            back, jnp.asarray(knn_rgb), jnp.asarray(oy), jnp.asarray(ox),
            jnp.asarray(use_pred), th, tw,
        )
        back = front

    state.kf_psnr = np.array(
        [kf_psnr_accum[k.index] / (N * k.frame_count) for k in state.keyframes]
    )
    state.total_psnr = float(kf_psnr_accum.sum() / (N * F))
    return state

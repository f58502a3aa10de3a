"""esReconstruct: the rate-distortion core.

Reference (TFrame.Reconstruct, tilingencoder.pas:1430-1679): per frame,
per cell, redo motion search against the previous *reconstructed* frame,
query an int16 kd-tree of corpus-tiles-rendered-through-their-palettes
(k=1, or the k=64 "extended palette usage" cartesian re-rank), pick the
lower error (ties favor prediction), draw the winner, accumulate PSNR.

TPU-native split:
  Phase A (parallel across ALL frames): the KNN half does not depend on
    reconstruction, so frames are batched in groups and candidates come
    from chunked distance matmuls against the corpus (exact brute force
    replaces the approximate kd-tree); the EPU re-rank is a lax.scan over
    cell chunks — one device dispatch per frame group.
  Phase B (sequential): only the motion re-search needs the previous
    reconstruction. The whole frame loop is ONE lax.scan on device with
    the framebuffer as carry — selection, rendering and PSNR ride along
    (the axon dispatch latency makes per-frame host loops untenable).

EPU parity (:1563-1609): candidates = top-k corpus tiles; the candidate
palette set = their initial palettes; the reference's strict-< iteration
over candidates sorted tile-major/palette-minor is reproduced by taking,
among minimal-error pairs, the smallest packed (tile*P + palette) id —
no device sorts needed (see _epu_rank_all).

Decision parity (:1614-1654): prediction is "perfect" when
mpErr <= 192 (skip KNN); otherwise KNN wins only when
knnErr < mpErr - 192 (CompareValue with cTileDCTSize tolerance).

Deviations (both flag-controlled, A/B numbers in docs/PERF.md):
  - float32 exact distances instead of int16-quantized features;
    settings.int16_features rounds features at every exact-error site
    (SmallInt semantics, tilingencoder.pas:3126).
  - predicted cells drop their KNN tile_idx by default (the reference
    lets Reindex count never-emitted tiles into the TileSet,
    :2012-2030); settings.count_predicted_tiles restores that.
"""
from __future__ import annotations

import functools
import os
import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EncoderSettings
from ..models.state import EncodeState
from ..ops.color import rgb_to_yuv
from ..ops.dct import DCT_MAT, DCT_WEIGHTS
from ..ops.metrics import euclidean_to_psnr
from .motion import _motion_core, tile_features_raster

TILE_W = 8
K = 192
TOL = 192.0  # cTileDCTSize comparison tolerance (tilingencoder.pas:1535,1614)


@jax.jit
def _gather_cells(tiles_flat, idx):
    return tiles_flat[idx]


@jax.jit
def _render_corpus_dev(palettes_rgb, pal_initial, pal_pixels):
    """Corpus tiles through their own palettes -> RGB uint8 [T, 8, 8, 3]
    (PrepareReconstruct DoPsyV, tilingencoder.pas:4577-4597). On device."""
    return palettes_rgb[pal_initial[:, None, None], pal_pixels]


@functools.partial(jax.jit, static_argnames=("S",))
def _indicator_dcts_chunk(pp, S: int):
    # ONE [B*S, 64] x [64, 64] basis matmul against the one-hot pixel
    # map, rows = (tile, palette-slot) pairs: the batched-tiny-matmul
    # einsum "ve,bes->bvs" shaped this same contraction as B separate
    # [64,64]x[64,S] products and measured 2.5x slower at bench size
    # (57 -> 23 ms at T=33k, pull floor included) — the big matmul is
    # BIT-EXACT equal (same bf16 products, same 64-long reduction). The
    # DCT separability buys nothing here (a fp32-HIGHEST two-sided
    # einsum ran at ~3% of the MXU); G only ranks (bf16 consumer),
    # winners are re-ranked exactly by _exact_choice_err
    D = np.asarray(DCT_MAT, np.float64)
    basis = np.einsum("vy,ux->vuyx", D, D).reshape(64, 64)  # [(v,u), (y,x)]
    B = pp.shape[0]
    oh = jax.nn.one_hot(pp.reshape(B, 64), S, dtype=jnp.bfloat16)  # [B,64,S]
    m = oh.transpose(0, 2, 1).reshape(B * S, 64)
    g = jnp.matmul(m, jnp.asarray(basis.T, jnp.bfloat16),
                   preferred_element_type=jnp.float32)  # [B*S, 64]
    return g.reshape(B, S, 64).transpose(0, 2, 1)


def _indicator_dcts(pal_pixels, S: int, chunk: int = 16384):
    """G[t, vu, s] = DCT2D(indicator(pal_pixels == s)) — the linear map from
    palette YUV colors to the tile's DCT features. [T, 64, S] float32,
    device-resident."""
    T = len(pal_pixels)
    outs = []
    for i in range(0, T, chunk):
        outs.append(_indicator_dcts_chunk(jnp.asarray(pal_pixels[i : i + chunk]), S))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs)


def _topk_candidates(feats, ds, k: int, chunk: int = 0, budget: float = 4e9):
    """feats [N, 192] vs dataset ds [T, 192]: top-k smallest L2 (expansion
    for ranking; exact errors are recomputed by the EPU/selection pass).
    Returns (idx [N, k] int32, err [N, k] f32 ascending).

    One full-corpus distance matrix per cell block + a single
    approx_max_k: 5.4x faster on v5e than scanning corpus chunks and
    merging per-chunk top-ks with lax.top_k (measured 42ms vs 225ms per
    720p frame at T=60k). Cells are chunked only when [cells, Tpad] f32
    would exceed `budget` bytes. `chunk` is accepted for compatibility
    (the old corpus-chunk knob) and ignored."""
    N = feats.shape[0]
    T = ds.shape[0]
    Tpad = 256
    while Tpad < T:
        Tpad *= 2
    cell_chunk = max(256, min(N, int(budget / (Tpad * 4))))
    if cell_chunk >= N:
        return _topk_oneshot(feats, ds, k, Tpad)
    nch = -(-N // cell_chunk)
    featsp = jnp.pad(feats, ((0, nch * cell_chunk - N), (0, 0)))  # one shape
    outs = [
        _topk_oneshot(featsp[i * cell_chunk : (i + 1) * cell_chunk], ds, k, Tpad)
        for i in range(nch)
    ]
    return (
        jnp.concatenate([o[0] for o in outs])[:N],
        jnp.concatenate([o[1] for o in outs])[:N],
    )


@functools.partial(jax.jit, static_argnames=("k", "Tpad"))
def _topk_oneshot(feats, ds, k: int, Tpad: int):
    T = ds.shape[0]
    dsp = jnp.pad(ds, ((0, Tpad - T), (0, 0)))
    d2pad = jnp.sum(dsp * dsp, axis=1)
    f2 = jnp.sum(feats * feats, axis=1, keepdims=True)
    # ranking-only matmul in bf16 (the kd-tree being replaced was itself
    # approximate; exact errors are recomputed for the winners). The
    # [cells, Tpad] matrix lands in HBM in bf16 — at 720p defaults it is
    # the single biggest tensor of the encode (halving it halved the
    # measured top-k time); the f32 accumulation happens inside the fused
    # matmul consumer before the cast.
    d = (
        f2
        - 2.0
        * jnp.matmul(
            feats.astype(jnp.bfloat16),
            dsp.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
        + d2pad[None, :]
    )
    d = jnp.where(jnp.arange(Tpad)[None, :] < T, d, jnp.inf).astype(jnp.bfloat16)
    if k == 1:
        a = jnp.argmin(d, axis=1)
        e = jnp.take_along_axis(d, a[:, None], axis=1).astype(jnp.float32)
        return a[:, None].astype(jnp.int32), e
    # TPU-optimized approximate top-k (recall>=0.95); exact sort of the k
    # finalists so err/idx come back ascending (idx[:, :pal_k] feeds the
    # EPU candidate-palette set, which wants the best-ranked tiles first)
    nege, sel = jax.lax.approx_max_k(-d, k, recall_target=0.95)
    negs, order = jax.lax.top_k(nege, k)
    return (
        jnp.take_along_axis(sel, order, axis=1).astype(jnp.int32),
        -negs.astype(jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("S",))
def _tile_quad(G, S: int):
    """Per-tile quadratic form, packed upper triangle:
    Q[t, (c, s<=s')] = sum_v wf[v,c]^2 G[t,v,s] G[t,v,s'] (off-diagonal
    entries pre-doubled, so quad = Q . R with R[j,(c,s<=s')] =
    Py[j,s,c] Py[j,s',c]).

    With it, |rendered feature|^2 of the pair (tile t, palette j) is a dot
    product — the whole [T, P] quadratic term of the cartesian error
    factors into matmuls, so the EPU re-rank never materializes per-pair
    rendered features (the old [cells, kk, kp, 64, 3] tensor cost ~45 GB
    of HBM traffic per 720p frame); the symmetry packing cuts the gather
    and contraction width S*S -> S(S+1)/2. [T, 3*S*(S+1)/2] float32."""
    w = jnp.asarray(DCT_WEIGHTS, jnp.float32)
    wf2 = (w * w).transpose(1, 2, 0).reshape(64, 3)  # [v, c]
    tri_i, tri_j = np.triu_indices(S)
    dbl = jnp.asarray((tri_i != tri_j) + 1.0, jnp.float32)  # [ntri]
    Gf = G.astype(jnp.float32)
    outs = [
        jnp.einsum("tvs,tvu->tsu", Gf * wf2[:, c][None, :, None], Gf,
                   preferred_element_type=jnp.float32)[:, tri_i, tri_j] * dbl
        for c in range(3)
    ]
    return jnp.stack(outs, axis=1).reshape(G.shape[0], -1)


def _lowfreq_vu(dims: int) -> np.ndarray:
    """(v,u) raster indices of the low-frequency r x r block, dims=3*r^2."""
    r = int(round((dims / 3) ** 0.5))
    if 3 * r * r != dims:
        raise ValueError(f"epu_stage1_dims must be 3*r^2, got {dims}")
    v, u = np.mgrid[0:r, 0:r]
    return (v * 8 + u).reshape(-1)


def _build_two_stage_tables(Gf, S: int, dims: int):
    """Stage-1 rank tables for the two-stage EPU (settings.epu_two_stage):

    - G8lf [T, L, S] int8: the low-frequency coefficient subset of G with
      per-coefficient scales (g_inv [L] dequants exactly via the ftw
      fold: v is contracted in C = sum_v Gi8[v]·ftw[v], so the scale
      moves onto ftw for free and int8 -> bf16 is exact at +-127).
    - Q16 [T, ntri3] int16 + q_inv [ntri3]: the SUBSET quadratic table
      with per-COLUMN scales — err = Q16·(q_inv*Rj) is an exact fold into
      the tiny per-palette outer products, so int16 costs only its own
      rounding (measured: no agreement change vs f32 Q at CIF/256).

    Both tables only RANK: stage 2 re-ranks the top-M pairs with exact
    pixel-render errors, so their rounding only perturbs which pairs
    survive to the exact comparison."""
    lf = _lowfreq_vu(dims)
    Glf = Gf[:, jnp.asarray(lf), :]  # [T, L, S] f32
    vmax = jnp.maximum(jnp.max(jnp.abs(Glf), axis=(0, 2)), 1e-6)
    gsc = 127.0 / vmax
    G8lf = jnp.round(Glf * gsc[None, :, None]).astype(jnp.int8)
    g_inv = (1.0 / gsc).astype(jnp.float32)
    w = np.asarray(DCT_WEIGHTS, np.float64).transpose(1, 2, 0).reshape(64, 3)
    wlf2 = jnp.asarray((w * w)[lf], jnp.float32)  # [L, 3]
    tri_i, tri_j = np.triu_indices(S)
    dbl = jnp.asarray((tri_i != tri_j) + 1.0, jnp.float32)
    G8f = G8lf.astype(jnp.float32) * g_inv[None, :, None]
    outs = [
        jnp.einsum("tvs,tvu->tsu", G8f * wlf2[:, c][None, :, None], G8f,
                   preferred_element_type=jnp.float32)[:, tri_i, tri_j] * dbl
        for c in range(3)
    ]
    Qlf = jnp.stack(outs, axis=1).reshape(Gf.shape[0], -1)  # [T, ntri3]
    cmax = jnp.maximum(jnp.max(jnp.abs(Qlf), axis=0), 1e-9)
    qsc = 32767.0 / cmax
    Q16 = jnp.round(Qlf * qsc[None, :]).astype(jnp.int16)
    q_inv = (1.0 / qsc).astype(jnp.float32)
    return G8lf, g_inv, Q16, q_inv


@functools.partial(jax.jit,
                   static_argnames=("S", "dims", "M", "cell_chunk", "int16"))
def _epu_rank_two_stage(feats, cand_idx, cand_pal, G8lf, g_inv, Q16, q_inv,
                        pal_yuv, pp, palettes, S: int, dims: int, M: int,
                        cell_chunk: int, int16: bool = False):
    """Two-stage cartesian re-rank (settings.epu_two_stage).

    Stage 1 = the _epu_rank_all norm expansion restricted to the int8
    low-frequency G and int16 Q tables (see _build_two_stage_tables);
    stage 2 = exact pixel-render errors of the per-cell top-M pairs,
    reference tie-break (packed-id min) applied to the EXACT errors.
    Returns (tile [B], pal [B], exact_err [B]) — the err is already
    exact, no separate winner recompute needed."""
    B, kk = cand_idx.shape
    kp = cand_pal.shape[1]
    M = min(M, kk * kp)
    lf = _lowfreq_vu(dims)
    w = jnp.asarray(DCT_WEIGHTS, jnp.float32)
    tri_i, tri_j = np.triu_indices(S)
    Pc = pal_yuv.transpose(0, 2, 1)  # [P, 3, S]
    Rall = (Pc[..., tri_i] * Pc[..., tri_j]).reshape(pal_yuv.shape[0], -1)
    Rall = Rall * q_inv[None, :]  # exact int16-Q dequant fold
    nch = -(-B // cell_chunk)
    Bp = nch * cell_chunk
    featsp = jnp.pad(feats, ((0, Bp - B), (0, 0)))
    cip = jnp.pad(cand_idx, ((0, Bp - B), (0, 0)))
    cpp = jnp.pad(cand_pal, ((0, Bp - B), (0, 0)))
    P = pal_yuv.shape[0]

    def body(_, i):
        f = jax.lax.dynamic_slice(featsp, (i * cell_chunk, 0),
                                  (cell_chunk, K))
        ci = jax.lax.dynamic_slice(cip, (i * cell_chunk, 0),
                                   (cell_chunk, kk))
        cp = jax.lax.dynamic_slice(cpp, (i * cell_chunk, 0),
                                   (cell_chunk, kp))
        Gi = G8lf[ci]  # [b, kk, L, S] int8 — the 8x-smaller gather
        ftw = (f.reshape(-1, 3, 64).transpose(0, 2, 1)
               * jnp.asarray(w.transpose(1, 2, 0).reshape(64, 3)))[
            :, jnp.asarray(lf), :]  # [b, L, 3]
        ftw = ftw * g_inv[None, :, None]
        C = jnp.einsum("bkvs,bvc->bksc", Gi.astype(jnp.bfloat16),
                       ftw.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        Py = pal_yuv[cp]  # [b, kp, S, 3]
        Rj = Rall[cp]  # [b, kp, ntri3]
        Qi = Q16[ci].astype(jnp.float32)  # int16 gather, f32 on VPU
        err = jnp.einsum("bkx,bjx->bkj", Qi, Rj,
                         precision=jax.lax.Precision.HIGH,
                         preferred_element_type=jnp.float32)
        err = err - 2.0 * jnp.einsum(
            "bksc,bjsc->bkj", C, Py,
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32)
        err = err.reshape(cell_chunk, kk * kp)
        _, top = jax.lax.top_k(-err, M)  # [b, M] pair slots, err asc
        mt = jnp.take_along_axis(ci, top // kp, axis=1)  # [b, M]
        mp = jnp.take_along_axis(cp, top % kp, axis=1)
        ex = _exact_choice_err(
            jnp.repeat(f, M, axis=0), mt.reshape(-1), mp.reshape(-1),
            pp, palettes, int16=int16,
        ).reshape(cell_chunk, M)
        # reference tie-break among the EXACT-minimal survivors
        combo = mt * P + mp
        m = jnp.min(ex, axis=1)
        sel = jnp.where(ex <= m[:, None], combo, jnp.int32(2**31 - 1))
        best = jnp.min(sel, axis=1)
        return None, (best // P, best % P, m)

    _, (t, p, e) = jax.lax.scan(body, None, jnp.arange(nch))
    return t.reshape(Bp)[:B], p.reshape(Bp)[:B], e.reshape(Bp)[:B]


@functools.partial(jax.jit, static_argnames=("S", "cell_chunk"))
def _epu_rank_all(feats, cand_idx, cand_pal, G, pal_yuv, S: int, cell_chunk: int,
                  Q=None):
    """Cartesian re-rank over all cells via a scan over cell chunks.

    feats [B, 192]; cand_idx/cand_pal [B, kk] sorted ascending; G [T,64,S];
    pal_yuv [P, S, 3]. Returns (tile [B], pal [B], err [B]).

    Norm-expansion formulation: argmin over (i, j) of
    |rf|^2 - 2<rf, ft> (the per-cell |ft|^2 is pair-invariant and dropped;
    the true error of the winner is recomputed by _exact_choice_err) with
    rf = (G_i @ Py_j) * wf. The quadratic term is the triangle-packed
    per-tile table Q (see _tile_quad) dotted with the per-PALETTE outer
    products Rall (precomputed once, gathered per cell) — two accumulating
    einsums, NO concat (an A=[Qi,C] concat forced ~20ms/frame of XLA
    layout copies; the err matmul itself is ~3ms), nothing per-pair larger
    than [chunk, kk, kp] materialized.

    Fused-table mode (settings.epu_fused_fp; G.ndim == 2): the bf16 G and
    f32 Q rows arrive concatenated as one int8 byte-row table, so the
    Gi+Qi gather pair becomes ONE gather; the bitcast split below recovers
    the exact payloads, keeping ranking values bit-identical to the
    default path (chip verdict: loses fps — see config.py)."""
    B, kk = cand_idx.shape
    kp = cand_pal.shape[1]
    w = jnp.asarray(DCT_WEIGHTS, jnp.float32)
    wf = w.transpose(1, 2, 0).reshape(64, 3)  # [vu, c]
    fused = G.ndim == 2
    if Q is None and not fused:
        Q = _tile_quad(G, S)
    tri_i, tri_j = np.triu_indices(S)
    # per-palette outer products at triangle indices: [P, 3*ntri] (1.7MB
    # at P=1024 — building Rj per (cell, candidate) instead cost two
    # ~5ms/frame layout copies)
    Pc = pal_yuv.transpose(0, 2, 1)  # [P, 3, S]
    Rall = (Pc[..., tri_i] * Pc[..., tri_j]).reshape(pal_yuv.shape[0], -1)
    nch = -(-B // cell_chunk)
    Bp = nch * cell_chunk
    featsp = jnp.pad(feats, ((0, Bp - B), (0, 0)))
    cip = jnp.pad(cand_idx, ((0, Bp - B), (0, 0)))
    cpp = jnp.pad(cand_pal, ((0, Bp - B), (0, 0)))

    def body(_, i):
        f = jax.lax.dynamic_slice(featsp, (i * cell_chunk, 0), (cell_chunk, K))
        ci = jax.lax.dynamic_slice(cip, (i * cell_chunk, 0), (cell_chunk, kk))
        cp = jax.lax.dynamic_slice(cpp, (i * cell_chunk, 0), (cell_chunk, kp))
        if fused:
            # full-precision fused layout (settings.epu_fused_fp): bf16 G
            # bytes ++ f32 Q bytes; bitcasts invert the build exactly
            GQi = G[ci]  # ONE [b, kk, 64*S*2 + 4*ntri] int8 gather
            gb = 64 * S * 2
            Gi = jax.lax.bitcast_convert_type(
                GQi[..., :gb].reshape(cell_chunk, kk, 64, S, 2),
                jnp.bfloat16)
            Qi = jax.lax.bitcast_convert_type(
                GQi[..., gb:].reshape(cell_chunk, kk, -1, 4), jnp.float32)
        else:
            Gi = G[ci]  # [b, kk, 64, S] bf16 (ranking only —
            # winners get an exact fp32 re-evaluation in _knn_phase)
            Qi = Q[ci]  # [b, kk, 3*ntri] f32 (triangle-packed)
        ftw = f.reshape(-1, 3, 64).transpose(0, 2, 1) * wf[None]  # [b, 64, 3]
        C = jnp.einsum("bkvs,bvc->bksc", Gi, ftw.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)  # [b, kk, S, 3]
        Py = pal_yuv[cp]  # [b, kp, S, 3] f32
        Rj = Rall[cp]  # [b, kp, 3*ntri] f32
        # HIGH (bf16_3x) keeps ~f32 mantissa in the norm expansion, whose
        # cancellation (quad ~ 1e7, gaps ~ 1e3) would otherwise lose
        # ranking order; the matmul FLOPs are negligible next to gathers
        err = jnp.einsum("bkx,bjx->bkj", Qi, Rj,
                         precision=jax.lax.Precision.HIGH,
                         preferred_element_type=jnp.float32)
        err = err - 2.0 * jnp.einsum(
            "bksc,bjsc->bkj", C, Py,
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32)
        err = err.reshape(cell_chunk, kk * kp)
        # reference tie-break (strict < over candidates sorted tile-major,
        # palette-minor, :1563-1609) == among minimal-err pairs take the
        # smallest (tile, palette) lexicographically. A packed-id min does
        # that WITHOUT sorting the candidate lists (the [N, kk] device
        # sorts cost ~14 ms/frame): tile*P + pal fits int32 up to T=2M.
        P = pal_yuv.shape[0]
        combo = (ci[:, :, None] * P + cp[:, None, :]).reshape(
            cell_chunk, kk * kp)
        m = jnp.min(err, axis=1)
        sel = jnp.where(err <= m[:, None], combo, jnp.int32(2**31 - 1))
        best = jnp.min(sel, axis=1)
        return None, (best // P, best % P, m)

    _, (t, p, e) = jax.lax.scan(body, None, jnp.arange(nch))
    return t.reshape(Bp)[:B], p.reshape(Bp)[:B], e.reshape(Bp)[:B]


@functools.partial(
    jax.jit,
    static_argnames=("kk", "pal_k", "S", "cell_chunk", "epu", "int16",
                     "pallas_topk", "ivf_probes", "stage1_dims", "stage1_m"),
)
def _knn_all_frames(tiles, dsj, G, Q, pal_initial, pal_yuv, pp, palettes,
                    kk: int, pal_k: int, S: int, cell_chunk: int,
                    epu: bool, int16: bool, pallas_topk: str = "",
                    ivf=None, ivf_probes: int = 8, g_inv=None,
                    q_inv=None, stage1_dims: int = 0, stage1_m: int = 16):
    """Phase A for ALL frames in one device program (lax.map runs frames
    sequentially, so the [cells, Tpad] ranking matrix is a per-iteration
    transient) — one dispatch + one packed d2h instead of per-frame round
    trips through the tunnel (~30-40 ms each).

    tiles [F, N, 8, 8, 3] uint8. Returns [2, F, N] i32: word 0 packs
    (tile << ceil(log2 P)) | pal, word 1 is the exact error's f32 bits
    (one minimal d2h)."""
    T = dsj.shape[0]
    Tpad = 256
    while Tpad < T:
        Tpad *= 2
    if pallas_topk == "v1":
        from ..kernels.knn_topk import knn_bucket_topk, TB

        # pad to the kernel's natural SB*TB=4096 granularity (<=4% waste;
        # the pow2 padding of the XLA path wastes up to 2x — compile
        # classes are bounded by the persistent cache). The bf16 transpose
        # happens ONCE here, outside the frame loop.
        Tp = -(-T // 4096) * 4096
        dsp = jnp.pad(dsj, ((0, Tp - T), (0, 0)))
        dsT = dsp.astype(jnp.bfloat16).T
        d2p = jnp.sum(dsp * dsp, axis=1) + jnp.where(
            jnp.arange(Tp) < T, 0.0, 1e30
        )
    elif pallas_topk:
        from ..kernels.knn_topk import knn_bucket_topk2, knn_prep2

        dsTa = knn_prep2(dsj, -(-T // 4096) * 4096)

    def per_frame(tiles_f):
        feats = tile_features_raster(tiles_f.astype(jnp.float32))  # [N, 192]
        if int16:
            feats = jnp.round(feats)
        if ivf is not None:
            from .ivf import ivf_topk

            idx, err = ivf_topk(feats, ivf, kk, probes=ivf_probes)
        elif pallas_topk == "v1":
            idx, err = knn_bucket_topk(feats, dsT, d2p, kk)
        elif pallas_topk:
            idx, err = knn_bucket_topk2(feats, dsTa, kk)
        else:
            idx, err = _topk_oneshot(feats, dsj, kk, Tpad)
        if not epu:
            d = feats - dsj[idx[:, 0]]
            exact = jnp.sum(d * d, axis=1)
            t, p = idx[:, 0], pal_initial[idx[:, 0]]
        elif stage1_dims:  # two-stage EPU: G/Q hold the stage-1 tables
            cand_idx = idx
            cand_pal = pal_initial[idx[:, :pal_k]]
            t, p, exact = _epu_rank_two_stage(
                feats, cand_idx, cand_pal, G, g_inv, Q, q_inv,
                pal_yuv, pp, palettes, S, dims=stage1_dims, M=stage1_m,
                cell_chunk=cell_chunk, int16=int16,
            )
        else:
            # err-ascending order is fine: the reference's sorted-candidate
            # tie-break is reproduced inside _epu_rank_all by a packed-id
            # min
            cand_idx = idx
            cand_pal = pal_initial[idx[:, :pal_k]]
            t, p, _ = _epu_rank_all(
                feats, cand_idx, cand_pal, G, pal_yuv, S,
                cell_chunk=cell_chunk, Q=Q,
            )
            exact = _exact_choice_err(feats, t, p, pp, palettes, int16=int16)
        # pack (tile, pal) into one word + err bits: [2, N] i32 halves the
        # d2h (tile*P < 2^31 guaranteed by the int32 packed-id tie-break)
        pbits = max(1, (palettes.shape[0] - 1).bit_length())
        w0 = (t.astype(jnp.int32) << pbits) | p.astype(jnp.int32)
        return w0, jax.lax.bitcast_convert_type(exact, jnp.int32)

    w0, w1 = jax.lax.map(per_frame, tiles)
    return jnp.stack([w0, w1], axis=0)


def _knn_phase(state: EncodeState, settings: EncoderSettings, mesh=None):
    """Phase A: per-cell best (tile, palette, err) over all frames.

    Returns (kt_dev, kp_dev, ke_dev, fetch): DEVICE [F, N] fields phase B
    consumes directly, plus a fetch() closure materializing the host
    (tile, pal) copy whose transfer was started asynchronously — call it
    AFTER dispatching phase B so the pull hides under the scans.

    With a mesh, the corpus dataset is sharded over the "corpus" axis and
    top-k candidates ride ICI (parallel/knn.py); single-chip falls back to
    chunked local matmuls."""
    F, N = state.n_frames, state.tilemap_size
    rendered = _render_corpus_dev(
        jnp.asarray(state.palettes_rgb),
        jnp.asarray(state.corpus_pal_initial.astype(np.int32)),
        jnp.asarray(state.corpus_pal_pixels),
    )
    dsj = tile_features_raster(rendered.astype(jnp.float32))  # [T, 192] device
    if settings.int16_features:
        # SmallInt feature semantics (tilingencoder.pas:3126); distances
        # then quantize like the reference's int16 kd-tree (sums accumulate
        # in fp32, so very large errors lose the low bits int64 would keep)
        dsj = jnp.round(dsj)
    T = int(dsj.shape[0])
    # the EPU tie-break and the phase-A d2h both pack (tile, palette) into
    # ONE int32 (tile*P + pal and tile << pbits | pal): overflow would flip
    # signs and silently corrupt tile indexes, so fail loudly instead
    pbits_chk = max(1, (settings.palette_count - 1).bit_length())
    if T >= (1 << (31 - pbits_chk)) or T * settings.palette_count >= 2**31:
        raise ValueError(
            f"corpus of {T} tiles with {settings.palette_count} palettes "
            f"overflows the int32 (tile, palette) packing (tile count must "
            f"stay under {1 << (31 - pbits_chk)}); lower "
            f"GlobalTilingTileCount/quality"
        )

    ds_sharded = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        nshard = mesh.shape["corpus"]
        Tpad = -(-T // nshard) * nshard
        dspad = jnp.pad(dsj, ((0, Tpad - T), (0, 0)), constant_values=1e12)
        ds_sharded = jax.device_put(dspad, NamedSharding(mesh, P("corpus", None)))
    epu = settings.frame_tiling_extended_palette_usage
    kk = min(settings.epu_knn_k, T) if epu else 1
    S = settings.palette_size
    pal_k = min(getattr(settings, "epu_pal_k", kk) or kk, kk)
    # candidate palettes come from the top tiles; capping them at epu_pal_k
    # (palettes of the best-ranked tiles) quarters the cartesian re-rank
    # with negligible quality impact.
    # cell_chunk bounds the gathered per-chunk operands (Gi + Qi + Rj);
    # the compact/two-stage tables halve-or-better the per-cell bytes,
    # so the chunk grows to match (fewer scan iterations, same footprint)
    ntri3 = 3 * (S * (S + 1) // 2)
    compactish = settings.epu_two_stage
    gb = 1 if compactish else 2
    qb = 2 if compactish else 4
    per_cell = kk * (64 * S * gb + ntri3 * qb) + pal_k * ntri3 * 4
    cell_chunk = max(64, min(4096, int(3e8 / per_cell)))

    pal_initial = jnp.asarray(state.corpus_pal_initial.astype(np.int32))
    pal_yuv = rgb_to_yuv(jnp.asarray(state.palettes_rgb, jnp.float32))
    pp_dev = jnp.asarray(state.corpus_pal_pixels)
    palettes_dev = jnp.asarray(state.palettes_rgb)
    # fused Pallas distance+bucket-top2 kernel (kernels/knn_topk.py): needs
    # a TPU backend and a corpus much wider than kk buckets so the bucket
    # top-2s can cover the top-kk (below that, the XLA approx_max_k path)
    from ..kernels.knn_topk import TB as _TB

    # fused kernel beats approx_max_k at k>1 (19 vs 21 ms/frame at bench
    # shapes, finer 14/15-bit ranking mantissa vs bf16, deterministic
    # low-index tie-break); k=1 keeps the cheaper XLA argmin. Needs a
    # corpus much wider than kk buckets so bucket top-2s cover the top-kk.
    # "pallas" = the v2 fully-folded kernel (every distance term inside
    # the matmul, ~6 VPU ops/elem — roofline r5); "pallas_v1" keeps the
    # r4 kernel selectable for A/Bs.
    pallas_topk = ""
    if (jax.default_backend() not in ("cpu",)
            and kk > 1
            and T >= 2 * kk * _TB
            and settings.knn_backend in ("pallas", "pallas_v1")):
        pallas_topk = "v1" if settings.knn_backend == "pallas_v1" else "v2"
    # IVF two-level corpus search (pipeline/ivf.py): approximate like
    # the reference's ANN kd-trees (extern.pas:182-185); needs a corpus
    # large enough that block-probing beats one matmul
    ivf_state = None
    ivf_probes = settings.ivf_probes
    if settings.knn_backend == "ivf" and T >= settings.ivf_min_corpus:
        from .ivf import build_ivf

        ivf_state = build_ivf(dsj)
        pallas_topk = ""
    g_inv = None
    q_inv = None
    stage1_dims = 0
    if epu:
        # NOTE: a global [T, P] norm TABLE indexed per (tile, palette) pair
        # was measured 15x SLOWER on v5e (scalar gathers, ~60M elem/s); the
        # formulation here keeps the quadratic term factored as row-gathers
        # + matmuls instead (see _tile_quad).
        Gf = _indicator_dcts(state.corpus_pal_pixels, settings.palette_size)
        if settings.epu_two_stage:
            # two-stage rank: int8 low-frequency G + int16 Q stage 1,
            # exact top-M re-rank stage 2 (99.3% winner agreement at
            # CIF/256, scripts/ab_epu_lowrank.py); Gi bytes /8, Qi /2
            G, g_inv, Q, q_inv = _build_two_stage_tables(
                Gf, settings.palette_size, settings.epu_stage1_dims)
            stage1_dims = settings.epu_stage1_dims
        elif settings.epu_fused_fp:
            # full-precision fused byte table: the DEFAULT bf16 G and f32
            # Q rows concatenated as int8 bytes, so the per-chunk Gi+Qi
            # gather pair becomes ONE gather at the same total bytes.
            # Ranking values are bit-identical to the default path by
            # construction (the device bitcasts here and in
            # _epu_rank_all are inverses). CHIP VERDICT r5: -20% fps
            # (row rate is not width-independent); see config.py.
            Gb = Gf.astype(jnp.bfloat16)
            Qf = _tile_quad(Gb, settings.palette_size)
            G = jnp.concatenate([
                jax.lax.bitcast_convert_type(Gb, jnp.int8).reshape(
                    Gb.shape[0], -1),
                jax.lax.bitcast_convert_type(Qf, jnp.int8).reshape(
                    Qf.shape[0], -1),
            ], axis=1)
            Q = jnp.zeros((1, 1), jnp.int16)  # unused in fused mode
        else:
            # (a one-stage int8 G table variant — per-DCT-coefficient
            # scales, coherent Q — lived here through r4's A/B battery;
            # it measured quality-parity but no fps win and is strictly
            # superseded by epu_two_stage, so it was deleted. PERF.md
            # keeps the measurements.)
            G = Gf.astype(jnp.bfloat16)
            Q = _tile_quad(G, settings.palette_size)  # [T, 3*S*S] f32, once
    else:
        G = jnp.zeros((1, 64, S), jnp.bfloat16)
        Q = jnp.zeros((1, 3 * S * S), jnp.float32)

    if ds_sharded is None:
        # single chip. Cell COMPACTION first: the reference runs the KNN
        # only when the motion re-search isn't already perfect (mpErr <=
        # cTileDCTSize skips it, tilingencoder.pas:1535-1547). Cells that
        # Reduce marked predicted with a phase-A motion PSNR at/above the
        # "perfect" threshold (euclidean TOL=192 -> 48.13 dB) stay
        # predicted in phase B with overwhelming likelihood, so their
        # KNN/EPU work is dropped and the survivors are gathered into
        # dense rows — on motion-heavy content this cuts the phase-A
        # corpus search + cartesian re-rank by the predicted fraction.
        # KF-start frames never predict (:1496) and always keep KNN.
        # Skipped cells get err=+inf: phase B then always keeps the
        # prediction for them. The exact-threshold proxy deviation (we
        # test the phase-A vs-original PSNR, the reference the phase-B
        # vs-reconstruction error) only matters for cells whose
        # reconstruction drifted; disabled in count_predicted_tiles
        # parity mode where every cell's tile feeds Reindex.
        host_res = isinstance(state.tiles_canon, np.ndarray)
        tm = state.tilemap
        pbits = max(1, (settings.palette_count - 1).bit_length())
        perfect_db = 10.0 * np.log10(255.0 * 255.0 / max(0.5, TOL / 192.0))
        skip_ok = (
            settings.knn_skip_perfect_pred
            and not settings.count_predicted_tiles
            and tm is not None
            and tm.predicted.any()
        )
        if skip_ok:
            need = ~(tm.predicted & (tm.psnr >= perfect_db - 1e-6))
            for kf in state.keyframes:
                need[kf.start_frame] = True
            sel = np.flatnonzero(need.reshape(-1))
            sel_cheap = np.flatnonzero(~need.reshape(-1))
        else:
            sel = np.arange(F * N, dtype=np.int64)
            sel_cheap = np.empty(0, np.int64)
        tiles_flat = state.tiles_canon.reshape(F * N, 8, 8, 3)

        def run_cells(cells, use_kk, use_pal_k, use_epu, use_pallas):
            """Dispatch only: returns (padded cell indexes, device packed
            [2, Mpad]). The padding repeats the last cell, so the device
            scatter writes it the identical value twice (no masking, no
            per-M compile class)."""
            M = len(cells)
            NR = 8192  # cells per compacted row (lax.map iteration)
            rows = max(1, -(-M // NR))
            # 1.5-step buckets {1,2,3,4,6,8,12,16,24,...}: <=33% padded
            # rows (pow2 wasted up to 2x — 45% measured on the bench
            # clip's 11-row phase) while keeping the compile classes
            # logarithmic for the persistent cache
            b = 1
            while b < rows:
                b = b * 3 // 2 if b * 3 // 2 > b else b + 1
            rows = b
            Mpad = rows * NR
            selp = np.concatenate(
                [cells, np.full(Mpad - M, cells[-1], np.int64)])
            # host-RAM streaming mode: gather on host, bound each h2d
            # staging copy; device mode: one device gather, one dispatch
            grows = rows if not host_res else max(1, min(rows, 32))
            outs = []
            for r0 in range(0, rows, grows):
                rsel = selp[r0 * NR : (r0 + grows) * NR]
                if host_res:
                    tiles_dev = jnp.asarray(tiles_flat[rsel])
                else:
                    tiles_dev = _gather_cells(tiles_flat, jnp.asarray(rsel))
                outs.append(_knn_all_frames(
                    tiles_dev.reshape(grows, NR, 8, 8, 3),
                    dsj, G, Q, pal_initial, pal_yuv, pp_dev,
                    palettes_dev, kk=use_kk, pal_k=use_pal_k, S=S,
                    cell_chunk=cell_chunk, epu=use_epu,
                    int16=settings.int16_features, pallas_topk=use_pallas,
                    ivf=ivf_state, ivf_probes=ivf_probes, g_inv=g_inv,
                    q_inv=q_inv,
                    stage1_dims=stage1_dims if use_epu else 0,
                    stage1_m=settings.epu_stage1_m,
                ).reshape(2, -1))
            packed = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
            return selp, packed

        jobs = []
        if os.environ.get("TILER_TPU_SYNC_SUBSTEPS"):
            print(f"phase A cells: full={len(sel)} cheap={len(sel_cheap)} "
                  f"of {F * N} (T={len(dsj)}, kk={kk}, pal_k={pal_k})")
        if len(sel):
            jobs.append((sel, run_cells(sel, kk, pal_k, epu, pallas_topk)))
        if len(sel_cheap):
            # skipped cells still get a CHEAP k=1 nearest tile (one argmin
            # matmul, no top-k/EPU): phase B then compares a real knn error
            # against the drifted prediction instead of never switching —
            # recovers most of the compaction's PSNR at ~6 ms/frame
            jobs.append((sel_cheap, run_cells(sel_cheap, 1, 1, False, "")))

        # device-side scatter keeps the [F, N] fields ON DEVICE for phase
        # B (the previous host round-trip pulled ~2.7 MB and re-uploaded
        # it); the packed results ALSO stream to the host in the
        # background, materialized by fetch() after phase B dispatches
        kt_dev = jnp.zeros(F * N, jnp.int32)
        kp_dev = jnp.zeros(F * N, jnp.int32)
        ke_dev = jnp.full(F * N, jnp.inf, jnp.float32)
        for cells, (selp, packed) in jobs:
            kt_dev, kp_dev, ke_dev = _scatter_knn(
                kt_dev, kp_dev, ke_dev, jnp.asarray(selp.astype(np.int32)),
                packed, pbits)
            try:
                packed.copy_to_host_async()
            except Exception:
                pass

        def fetch():
            out_tile = np.zeros(F * N, np.int32)
            out_pal = np.zeros(F * N, np.int32)
            for cells, (selp, packed_dev) in jobs:
                M = len(cells)
                packed = np.asarray(packed_dev)
                out_tile[cells] = (packed[0, :M] >> pbits).astype(np.int32)
                out_pal[cells] = (packed[0, :M] & ((1 << pbits) - 1)).astype(np.int32)
            return out_tile.reshape(F, N), out_pal.reshape(F, N)

        return (
            kt_dev.reshape(F, N),
            kp_dev.reshape(F, N),
            ke_dev.reshape(F, N),
            fetch,
        )

    # mesh path: corpus-sharded top-k per frame group (collectives per
    # dispatch; the tunnel-latency batching above is a single-chip concern)
    best_tile = np.empty((F, N), np.int32)
    best_pal = np.empty((F, N), np.int32)
    best_err = np.empty((F, N), np.float32)
    group = max(1, int(4e8 / (N * (192 * 4 + kk * kk * 4))))
    dev_outs = []  # dispatch all groups, sync once at the end
    for f0 in range(0, F, group):
        f1 = min(F, f0 + group)
        tiles = jnp.asarray(state.tiles_canon[f0:f1], jnp.float32)
        feats = tile_features_raster(tiles.reshape(-1, 8, 8, 3))
        if settings.int16_features:
            feats = jnp.round(feats)
        from ..parallel.knn import sharded_topk

        idx, err = sharded_topk(feats, ds_sharded, kk, mesh)
        idx = jnp.minimum(idx, T - 1)  # padded rows never rank
        if not epu:
            d = feats - dsj[idx[:, 0]]
            exact = jnp.sum(d * d, axis=1)
            dev_outs.append((idx[:, 0], pal_initial[idx[:, 0]], exact))
        elif stage1_dims:
            cand_idx = idx
            cand_pal = pal_initial[idx[:, :pal_k]]
            t, p, e = _epu_rank_two_stage(
                feats, cand_idx, cand_pal, G, g_inv, Q, q_inv,
                pal_yuv, pp_dev, palettes_dev, settings.palette_size,
                dims=stage1_dims, M=settings.epu_stage1_m,
                cell_chunk=cell_chunk, int16=settings.int16_features,
            )
            dev_outs.append((t, p, e))
        else:
            cand_idx = idx  # tie-break handled in _epu_rank_all
            cand_pal = pal_initial[idx[:, :pal_k]]
            t, p, _ = _epu_rank_all(
                feats, cand_idx, cand_pal, G, pal_yuv,
                settings.palette_size, cell_chunk=cell_chunk, Q=Q,
            )
            e = _exact_choice_err(feats, t, p, pp_dev, palettes_dev,
                                  int16=settings.int16_features)
            dev_outs.append((t, p, e))
    row = 0
    for t, p, e in dev_outs:
        g = t.shape[0] // N
        best_tile[row : row + g] = np.asarray(t).reshape(g, N)
        best_pal[row : row + g] = np.asarray(p).reshape(g, N)
        best_err[row : row + g] = np.asarray(e).reshape(g, N)
        row += g
    return (
        jnp.asarray(best_tile),
        jnp.asarray(best_pal),
        jnp.asarray(best_err),
        lambda: (best_tile, best_pal),
    )


@functools.partial(jax.jit, static_argnames=("pbits",), donate_argnums=(0, 1, 2))
def _scatter_knn(kt, kp, ke, cells, packed, pbits: int):
    """Unpack phase-A results and scatter them into the flat [F*N] device
    fields (padded duplicate indexes write identical values)."""
    tile = (packed[0] >> pbits).astype(jnp.int32)
    pal = (packed[0] & ((1 << pbits) - 1)).astype(jnp.int32)
    err = jax.lax.bitcast_convert_type(packed[1], jnp.float32)
    return (
        kt.at[cells].set(tile),
        kp.at[cells].set(pal),
        ke.at[cells].set(err),
    )


@functools.partial(jax.jit, static_argnames=("int16",))
def _exact_choice_err(feats, tile, pal, pp, palettes, int16: bool = False):
    """Exact fp32 error of the chosen (tile, palette) per cell."""
    n = tile.shape[0]
    S = palettes.shape[1]
    # bf16 one-hot render is EXACT here: each output pixel is a single
    # 0/1-selected uint8 palette value (integers <= 255 are exact in
    # bf16, the f32 accumulator adds one nonzero term) — halves the
    # render's HBM traffic vs the f32 one-hot
    palrow = palettes[pal].astype(jnp.bfloat16)  # [n, S, 3]
    oh = jax.nn.one_hot(pp[tile].reshape(n, 64), S, dtype=jnp.bfloat16)
    rgb = jnp.einsum("nps,nsc->npc", oh, palrow,
                     preferred_element_type=jnp.float32
                     ).reshape(n, 8, 8, 3)
    rf = tile_features_raster(rgb).reshape(-1, K)
    if int16:
        rf = jnp.round(rf)
    d = feats - rf
    return jnp.sum(d * d, axis=1)


@jax.jit
def _pack_phase_b(oy, ox, use_pred, cell_err):
    """[Lp, N] x4 -> one [2, Lp, N] i32 (single minimal d2h; bad tunnel
    windows move bytes at ~25 MB/s). Word 0: (oy+16384)<<16 | use<<15 |
    (ox+16384) — covers any radius < 16384; word 1: PSNR f32 bits."""
    w0 = (
        ((oy.astype(jnp.int32) + 16384) << 16)
        | (use_pred.astype(jnp.int32) << 15)
        | (ox.astype(jnp.int32) + 16384)
    )
    w1 = jax.lax.bitcast_convert_type(euclidean_to_psnr(cell_err), jnp.int32)
    return jnp.stack([w0, w1])


def _eval_vectors(cur, back, oy, ox, th, tw, int16: bool):
    """Exact weighted-DCT error of the given per-cell motion vectors
    against `back` (the phase-B candidate evaluation without a re-search):
    im2row window gather + one feature matmul + the Manhattan tie penalty
    (reference distance semantics, tilingencoder.pas:1232-1235).
    Returns (err [N] f32, win [N, 8, 8, 3] f32)."""
    H, W = cur.shape[0], cur.shape[1]
    N = th * tw
    curt = cur.reshape(th, TILE_W, tw, TILE_W, 3).swapaxes(1, 2)
    T = tile_features_raster(curt).reshape(N, K)
    if int16:
        T = jnp.round(T)
    wy = (jnp.arange(th, dtype=jnp.int32)[:, None] * TILE_W
          + oy.reshape(th, tw))
    wx = (jnp.arange(tw, dtype=jnp.int32)[None, :] * TILE_W
          + ox.reshape(th, tw))
    wyc = jnp.clip(wy, 0, H - TILE_W).reshape(-1)
    wxc = jnp.clip(wx, 0, W - TILE_W).reshape(-1)
    # direct two-level window gather: [N, 8, 8, 3] = 11 MB/frame of
    # gather traffic (an im2row stack here, as in _motion_core where it
    # amortizes over the whole search window, materialized 88 MB/frame)
    dy = jnp.arange(TILE_W, dtype=jnp.int32)
    win = back[
        (wyc[:, None, None] + dy[None, :, None]),
        (wxc[:, None, None] + dy[None, None, :]),
    ]
    Wv = tile_features_raster(win)
    if int16:
        Wv = jnp.round(Wv)
    d = T - Wv
    err = jnp.sum(d * d, axis=-1)
    err = err + jnp.abs(oy).astype(jnp.float32) + jnp.abs(ox).astype(jnp.float32)
    return err, win


@functools.partial(jax.jit, static_argnames=("radius", "th", "tw", "int16",
                                             "rank_dims", "mode"))
def _phase_b_scan_batch(frames_u8, knn_tile, knn_pal, knn_err, hm, vm,
                        kf_start, pay, pax, pp, palettes, radius: int,
                        th: int, tw: int, int16: bool = False,
                        rank_dims: int = K, mode: str = "research"):
    """Keyframe-parallel phase B: vmap the sequential per-KF scan over a
    batch of same-length keyframes (keyframes are independent — a KF-start
    frame never predicts, tilingencoder.pas:1496). The reference gets this
    overlap from nothing (it is strictly sequential); here G keyframes'
    sequential chains run in lockstep on one chip, G bounded by the motion
    transients (see reconstruct())."""
    f = lambda fr, kt, kp_, ke, h, v, ks, py, px: _phase_b_scan(
        fr, kt, kp_, ke, h, v, ks, py, px, pp, palettes, radius, th, tw,
        int16, rank_dims, mode)
    return jax.vmap(f)(frames_u8, knn_tile, knn_pal, knn_err, hm, vm,
                       kf_start, pay, pax)


@functools.partial(jax.jit, static_argnames=("radius", "th", "tw", "int16",
                                             "rank_dims", "mode"))
def _phase_b_scan(frames_u8, knn_tile, knn_pal, knn_err, hm, vm, kf_start,
                  pay, pax, pp, palettes, radius: int, th: int, tw: int,
                  int16: bool = False, rank_dims: int = K,
                  mode: str = "research"):
    """Sequential selection/render scan over frames, carry = back buffer.

    frames_u8 [F,H,W,3] uint8; knn_* [F,N]; hm/vm [F,N] bool;
    kf_start [F] bool; pay/pax [F,N] i32 phase-A vectors; pp [T,8,8]
    uint8; palettes [P,S,3] uint8.
    Returns per-frame (oy, ox [F,N] i32, use_pred [F,N] bool, err [F,N]).

    mode "research": full-radius motion re-search against the
    reconstruction every frame (reference parity, tilingencoder.pas:
    1496-1532). mode "reuse": evaluate the PHASE-A vector exactly against
    the reconstruction instead (~6x cheaper per frame); the pred-vs-knn
    decision still uses a true reconstruction error, only the vector
    itself is not re-optimized.
    """
    H, W = th * TILE_W, tw * TILE_W
    N = th * tw

    def step(back, xs):
        frame, ktile, kpal, kerr, hmf, vmf, kstart, py, px = xs
        cur = frame.astype(jnp.float32)
        if radius >= 1:
            def do_search(_):
                if mode == "reuse":
                    e, win = _eval_vectors(cur, back, py, px, th, tw, int16)
                    return py, px, e, win
                oy, ox, e, win = _motion_core(cur, back, radius, int16,
                                              rank_dims, return_windows=True)
                return oy.reshape(N), ox.reshape(N), e.reshape(N), win

            def no_search(_):
                return (
                    jnp.zeros(N, jnp.int32),
                    jnp.zeros(N, jnp.int32),
                    jnp.full(N, jnp.inf, jnp.float32),
                    jnp.zeros((N, TILE_W, TILE_W, 3), jnp.float32),
                )

            oy, ox, mperr, win = jax.lax.cond(kstart, no_search, do_search, None)
        else:
            oy = jnp.zeros(N, jnp.int32)
            ox = jnp.zeros(N, jnp.int32)
            mperr = jnp.full(N, jnp.inf, jnp.float32)
            win = jnp.zeros((N, TILE_W, TILE_W, 3), jnp.float32)

        perfect = mperr <= TOL
        knn_wins = (~perfect) & (kerr < mperr - TOL)
        use_pred = ~knn_wins
        cell_err = jnp.where(use_pred, mperr, kerr)

        # render knn choices: palette row gather + in-row one-hot matmul
        # (a per-pixel 2-level gather here cost 7.4 ms/frame; the batched
        # [64,S]x[S,3] matmul runs on the MXU and is exact for u8 values)
        tile_px = pp[ktile]  # [N, 8, 8]
        # bf16 one-hot is exact for uint8 palette values (single nonzero
        # per pixel, integers <= 255 exact in bf16); f32 accumulate
        palrow = palettes[kpal].astype(jnp.bfloat16)  # [N, S, 3]
        oh = jax.nn.one_hot(tile_px.reshape(N, 64), palettes.shape[1],
                            dtype=jnp.bfloat16)
        rgb = jnp.einsum("nps,nsc->npc", oh, palrow,
                         preferred_element_type=jnp.float32
                         ).reshape(N, TILE_W, TILE_W, 3)
        rgb = jnp.where(hmf[:, None, None, None], rgb[:, :, ::-1], rgb)
        rgb = jnp.where(vmf[:, None, None, None], rgb[:, ::-1, :], rgb)

        # predicted cells reuse the motion winner's window pixels (win) —
        # the same values a back[wy, wx] patch gather would fetch, already
        # pulled by the exact-error pass inside _motion_core
        chosen = jnp.where(
            use_pred.reshape(th, tw, 1, 1, 1),
            win.reshape(th, tw, TILE_W, TILE_W, 3),
            rgb.reshape(th, tw, TILE_W, TILE_W, 3),
        )
        front = chosen.transpose(0, 2, 1, 3, 4).reshape(H, W, 3)
        return front, (oy, ox, use_pred, cell_err)

    back0 = jnp.zeros((H, W, 3), jnp.float32)
    _, outs = jax.lax.scan(
        step, back0,
        (frames_u8, knn_tile, knn_pal, knn_err, hm, vm, kf_start, pay, pax),
    )
    return outs


def reconstruct(state: EncodeState, settings: EncoderSettings, mesh=None) -> EncodeState:
    F, N = state.n_frames, state.tilemap_size
    th, tw = state.tilemap_h, state.tilemap_w
    tm = state.tilemap
    R = settings.motion_predict_radius

    # TILER_TPU_SYNC_SUBSTEPS=1: print a drained per-block split of this
    # step (profiling only — the drains serialize work the production
    # dispatch overlaps, like TILER_TPU_SYNC_STEPS at the step level)
    _subs: list = []
    _t_sub = [time.monotonic()]

    def _sub(label, arrs=None):
        if not os.environ.get("TILER_TPU_SYNC_SUBSTEPS"):
            return
        if arrs is not None:
            jax.block_until_ready(arrs)
            # axon's block_until_ready does not flush programs whose
            # h2d inputs are still lazily queued — force a scalar read
            # per leaf so the stamp really drains (profiling path only;
            # each read costs one tunnel round-trip)
            for leaf in jax.tree_util.tree_leaves(arrs):
                float(jnp.ravel(leaf)[0].astype(jnp.float32))
        now = time.monotonic()
        _subs.append((label, now - _t_sub[0]))
        _t_sub[0] = now

    kt_dev, kp_dev, ke_dev, fetch_knn = _knn_phase(state, settings, mesh=mesh)
    _sub("phase A (knn+epu)", (kt_dev, kp_dev, ke_dev))
    kt_dev = kt_dev.reshape(F, N)
    kp_dev = kp_dev.reshape(F, N)
    ke_dev = ke_dev.reshape(F, N)

    # phase B runs per keyframe: keyframes are independent (a KF-start
    # frame never predicts, :1496), which bounds device memory to one
    # KF's frames and lets long videos stream from host RAM. KF slices
    # pad to power-of-two lengths so scan shapes (and compiles) are shared.
    pp_dev = jnp.asarray(state.corpus_pal_pixels)
    pal_dev = jnp.asarray(state.palettes_rgb)
    hm_dev = jnp.asarray(tm.hmirror)
    vm_dev = jnp.asarray(tm.vmirror)
    pay_dev = jnp.asarray(tm.pred_y.astype(np.int32))
    pax_dev = jnp.asarray(tm.pred_x.astype(np.int32))

    def _bucket(n):
        # pow2 up to 64, then 64-multiples: bounds both the number of
        # compiled scan lengths and the padded-frame waste (<~20%)
        if n <= 64:
            b = 8
            while b < n:
                b *= 2
            return b
        return -(-n // 64) * 64

    host_frames = isinstance(state.frames_rgb, np.ndarray)

    # group same-bucket keyframes and vmap G of them through one scan
    # (independent sequential chains run in lockstep); G is bounded by the
    # per-lane motion transients + the staged frame slices
    H, W = th * TILE_W, tw * TILE_W
    per_lane = lambda Lp: Lp * H * W * 3 + H * W * 1400
    by_bucket = {}
    for kf in state.keyframes:
        by_bucket.setdefault(_bucket(kf.end_frame + 1 - kf.start_frame), []).append(kf)

    results = {}  # kf.index -> [4, L, N] np
    for Lp, kfs in sorted(by_bucket.items()):
        gcap = max(1, min(8, int(6e9 / per_lane(Lp))))
        gcap = 1 << (gcap.bit_length() - 1)  # pow2 for compile sharing
        for b0 in range(0, len(kfs), gcap):
            batch = kfs[b0 : b0 + gcap]
            Gb = len(batch)
            Gp = 1 << (Gb - 1).bit_length()  # pad batch by repeating
            pads = [batch[i % Gb] for i in range(Gp)]
            idxs = np.stack([
                np.minimum(np.arange(Lp) + kf.start_frame, kf.end_frame)
                for kf in pads
            ])  # [Gp, Lp]
            kf_start_v = np.zeros((Gp, Lp), bool)
            kf_start_v[:, 0] = True
            idx_dev = jnp.asarray(idxs.astype(np.int32))
            if host_frames:  # stream the batch's frames from host RAM
                fr_slice = jnp.asarray(state.frames_rgb[idxs])
            else:
                fr_slice = state.frames_rgb[idx_dev]
            res = _phase_b_scan_batch(
                fr_slice,
                kt_dev[idx_dev], kp_dev[idx_dev], ke_dev[idx_dev],
                hm_dev[idx_dev], vm_dev[idx_dev],
                jnp.asarray(kf_start_v),
                pay_dev[idx_dev], pax_dev[idx_dev],
                pp_dev, pal_dev, R, th, tw,
                settings.int16_features, settings.motion_rank_dims,
                settings.phase_b_motion,
            )
            # one packed d2h per batch (each transfer pays tunnel latency);
            # psnr is computed on device in the same pass. Dispatch every
            # batch first — the host copies stream behind the scans
            packed_dev = jax.vmap(_pack_phase_b)(*res)  # [Gp, 2, Lp, N]
            try:
                packed_dev.copy_to_host_async()
            except Exception:
                pass
            results[(Lp, b0)] = (batch, packed_dev)
    _sub("phase B scans", [p for _, p in results.values()])

    # materialize the phase-A host copy now: its transfer overlapped the
    # phase-B scans just dispatched
    knn_tile, knn_pal = fetch_knn()
    _sub("phase A d2h")
    by_kf = {}
    for batch, packed_dev in results.values():
        packed = np.asarray(packed_dev)
        for g, kf in enumerate(batch):
            L = kf.end_frame + 1 - kf.start_frame
            by_kf[kf.index] = packed[g, :, :L]
    _sub("phase B d2h + unpack")
    pulled = [by_kf[kf.index] for kf in state.keyframes]
    w0 = np.concatenate([p[0] for p in pulled], axis=0)
    oy = (w0 >> 16).astype(np.int32) - 16384
    ox = (w0 & 0x7FFF).astype(np.int32) - 16384
    use_pred = ((w0 >> 15) & 1) != 0
    psnr = np.concatenate([p[1] for p in pulled], axis=0).view(np.float32)

    tm.predicted = use_pred
    tm.pred_y = oy.astype(np.int16)
    tm.pred_x = ox.astype(np.int16)
    if settings.count_predicted_tiles:
        # reference parity: predicted cells keep their KNN choice so
        # Reindex counts it into the TileSet (tilingencoder.pas:2012-2030)
        tm.tile_idx = knn_tile.astype(np.int64)
        tm.pal_idx = knn_pal.astype(np.int64)
    else:
        tm.tile_idx = np.where(~use_pred, knn_tile.astype(np.int64), -1)
        tm.pal_idx = np.where(~use_pred, knn_pal, -1)
    tm.psnr = psnr

    kf_psnr_accum = np.zeros(len(state.keyframes), np.float64)
    np.add.at(kf_psnr_accum, state.frame_kf, tm.psnr.sum(axis=1))
    state.kf_psnr = np.array(
        [kf_psnr_accum[k.index] / (N * k.frame_count) for k in state.keyframes]
    )
    state.total_psnr = float(kf_psnr_accum.sum() / (N * F))
    _sub("host tilemap/psnr")
    if _subs:
        print("reconstruct sub-split: "
              + " | ".join(f"{k} {v:.3f}s" for k, v in _subs))
    return state

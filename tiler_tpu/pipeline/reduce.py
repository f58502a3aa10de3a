"""esReduce: global tile budget via PSNR threshold + corpus dedup.

The reference golden-ratio-searches a PSNR threshold, re-running the full
corpus materialization + merge for every evaluation (SolveTileCount /
STCGREval, tilingencoder.pas:4014-4046). The evaluator is monotone in the
threshold, so this collapses to ONE dedup pass + a sorted-quantile lookup
over per-unique-tile minimum effective PSNR — exact same fixed point,
found in one pass (SURVEY.md section 7, hard part 6).

Semantics parity:
  - effective PSNR = PSNR/10 for keyframe-start frames (CKFPSNRDiv,
    :4016), plain PSNR otherwise; IsPredicted := eff > x (:4029-4032).
  - corpus = canonical tiles of unpredicted cells, exact-RGB duplicates
    merged with summed use counts (TransferTiles + MakeTilesUnique(True),
    :4048-4103, :4720-4781).
  - final order: use count desc, ties by pixel content (ReindexTiles,
    :4626-4718).
"""
from __future__ import annotations

import numpy as np

from ..config import EncoderSettings
from ..models.state import EncodeState


def _unique_rows(a: np.ndarray):
    """np.unique(axis=0) via void view (fast path for uint8 rows)."""
    b = np.ascontiguousarray(a).view([("", a.dtype)] * a.shape[1])[:, 0]
    _, first_idx, inverse = np.unique(b, return_index=True, return_inverse=True)
    return first_idx, inverse


def reduce_tiles(state: EncodeState, settings: EncoderSettings) -> EncodeState:
    F, N = state.n_frames, state.tilemap_size
    tm = state.tilemap
    psnr = tm.psnr.astype(np.float64).copy()  # [F, N]
    kf_start = np.zeros(F, bool)
    for kf in state.keyframes:
        kf_start[kf.start_frame] = True
    eff = np.where(kf_start[:, None], psnr / 10.0, psnr)

    tiles_flat = state.tiles_canon.reshape(F * N, -1)  # [M, 192] uint8
    first_idx, inverse = _unique_rows(tiles_flat)
    n_unique = len(first_idx)
    eff_flat = eff.reshape(-1)

    if settings.global_tiling_use_target_psnr:
        x = float(settings.global_tiling_target_psnr)
    else:
        target = settings.derived_tile_count(F * N)
        # per-unique-tile min effective PSNR; count(x) = #unique(min <= x)
        min_eff = np.full(n_unique, np.inf)
        np.minimum.at(min_eff, inverse, eff_flat)
        order = np.sort(min_eff)
        target = min(target, n_unique)
        x = float(order[target - 1]) if target >= 1 else -np.inf
        # the quantile may tie; check the neighbour below for a closer count
        cnt_at = int(np.searchsorted(order, x, side="right"))
        if target >= 2:
            x_lo = float(order[target - 2])
            cnt_lo = int(np.searchsorted(order, x_lo, side="right"))
            if abs(cnt_lo - target) < abs(cnt_at - target):
                x = x_lo

    unpred_flat = eff_flat <= x
    tm.predicted = (~unpred_flat).reshape(F, N)

    # corpus: unique canonical tiles among unpredicted cells
    sel = np.flatnonzero(unpred_flat)
    sel_u = inverse[sel]
    used_unique, sel_to_corpus = np.unique(sel_u, return_inverse=True)
    counts = np.bincount(sel_to_corpus, minlength=len(used_unique)).astype(np.int64)
    corpus = tiles_flat[first_idx[used_unique]].reshape(-1, 8, 8, 3)

    # sort: use count desc, ties by pixel content ascending
    keys = np.ascontiguousarray(corpus.reshape(len(corpus), -1))
    kview = keys.view([("", keys.dtype)] * keys.shape[1])[:, 0]
    order = np.lexsort((kview, -counts))
    rank = np.empty(len(order), np.int64)
    rank[order] = np.arange(len(order))

    state.corpus_rgb = corpus[order]
    state.corpus_use = counts[order]
    tile_idx = np.full(F * N, -1, np.int64)
    tile_idx[sel] = rank[sel_to_corpus]
    tm.tile_idx = tile_idx.reshape(F, N)
    return state

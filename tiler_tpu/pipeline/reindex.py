"""esReindex: dedup corpus on palette pixels, recount usage from the
tilemaps, drop unused tiles, sort by use count (desc, ties on content),
and remap tilemap indexes (Reindex, tilingencoder.pas:1993-2038;
MakeTilesUnique :4720-4781; ReindexTiles :4626-4718)."""
from __future__ import annotations

import numpy as np

from ..config import EncoderSettings
from ..models.state import EncodeState


def reindex(state: EncodeState, settings: EncoderSettings) -> EncodeState:
    tm = state.tilemap
    pp = np.asarray(state.corpus_pal_pixels)  # [T, 8, 8]; one d2h
    T = len(pp)

    # dedup on palette pixels (MakeTilesUnique(False))
    flat = np.ascontiguousarray(pp.reshape(T, 64))
    view = flat.view([("", flat.dtype)] * 64)[:, 0]
    _, first_idx, inverse = np.unique(view, return_index=True, return_inverse=True)

    # recount from tilemaps. The reference counts every TileIdx >= 0
    # including prediction-overridden cells (:2012-2030); by default we
    # only count emitted cells (smaller TileSet, same decoded pixels) —
    # count_predicted_tiles=True reproduces the reference accounting
    # (A/B numbers in docs/PERF.md).
    tid = tm.tile_idx.reshape(-1)
    if settings.count_predicted_tiles:
        emitted = tid >= 0
    else:
        emitted = (tid >= 0) & ~tm.predicted.reshape(-1)
    uidx = inverse[tid[emitted]]
    counts = np.bincount(uidx, minlength=len(first_idx)).astype(np.int64)

    keep = counts > 0
    kept = np.flatnonzero(keep)
    kpp = pp[first_idx[kept]]
    kcounts = counts[kept]

    # sort: use count desc, ties by pal pixel content asc
    keys = np.ascontiguousarray(kpp.reshape(len(kpp), 64))
    kview = keys.view([("", keys.dtype)] * 64)[:, 0]
    order = np.lexsort((kview, -kcounts))
    rank_of_kept = np.empty(len(order), np.int64)
    rank_of_kept[order] = np.arange(len(order))

    # unique-id -> final rank (or -1)
    final_of_unique = np.full(len(first_idx), -1, np.int64)
    final_of_unique[kept] = rank_of_kept

    new_tid = np.full_like(tid, -1)
    new_tid[emitted] = final_of_unique[uidx]
    tm.tile_idx = new_tid.reshape(tm.tile_idx.shape)

    state.corpus_pal_pixels = kpp[order]  # host (the writer consumes it)
    state.corpus_use = kcounts[order]
    # keep rgb/pal_initial aligned for rendering/debug views (device gather)
    import jax.numpy as jnp

    sel = first_idx[kept][order]
    if state.corpus_rgb is not None:
        state.corpus_rgb = jnp.asarray(state.corpus_rgb)[jnp.asarray(sel.astype(np.int32))]
    if state.corpus_pal_initial is not None:
        state.corpus_pal_initial = np.asarray(state.corpus_pal_initial)[sel]
    return state

"""esReindex: dedup corpus on palette pixels, recount usage from the
tilemaps, drop unused tiles, sort by use count (desc, ties on content),
and remap tilemap indexes (Reindex, tilingencoder.pas:1993-2038;
MakeTilesUnique :4720-4781; ReindexTiles :4626-4718).

Tile identity uses the same device-side double 32-bit polynomial hash as
Reduce (reduce.py): the [T, 8, 8] palette pixels stay in HBM and only
8 bytes/tile cross to the host for the dedup bookkeeping; the final
(kept, sorted) pixel array crosses once for the bitstream writer. Tie
order among equal use counts follows the content hash instead of the
reference's lexicographic pixel compare — deterministic, equally
arbitrary (same deviation as Reduce, documented there).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EncoderSettings
from ..models.state import EncodeState

_RNG = np.random.RandomState(0x1DE7)
# host numpy constants (no import-time backend init; see reduce.py)
_C1 = (_RNG.randint(0, 1 << 31, 64) * 2 + 1).astype(np.int32)
_C2 = (_RNG.randint(0, 1 << 31, 64) * 2 + 1).astype(np.int32)


@jax.jit
def _pal_hashes(pp_u8):
    flat = pp_u8.reshape(-1, 64).astype(jnp.int32)
    return jnp.stack(
        [jnp.sum(flat * _C1, axis=-1), jnp.sum(flat * _C2, axis=-1)]
    )  # [2, T]: one d2h


@jax.jit
def _gather(arr, idx):
    return arr[idx]


def reindex(state: EncodeState, settings: EncoderSettings) -> EncodeState:
    tm = state.tilemap
    pp_dev = jnp.asarray(state.corpus_pal_pixels)  # [T, 8, 8] device
    if state._pal_hashes_prefetch is not None:
        hh = np.asarray(state._pal_hashes_prefetch)  # streamed during reconstruct
        state._pal_hashes_prefetch = None
    else:
        hh = np.asarray(_pal_hashes(pp_dev))
    key = (hh[0].astype(np.int64) << 32) ^ (hh[1].astype(np.int64) & 0xFFFFFFFF)

    # dedup on palette pixels (MakeTilesUnique(False))
    uniq_keys, first_idx, inverse = np.unique(
        key, return_index=True, return_inverse=True
    )

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
    kcounts = counts[kept]

    # sort: use count desc, ties by content hash asc
    order = np.lexsort((uniq_keys[kept], -kcounts))
    rank_of_kept = np.empty(len(order), np.int64)
    rank_of_kept[order] = np.arange(len(order))

    # unique-id -> final rank (or -1)
    final_of_unique = np.full(len(first_idx), -1, np.int64)
    final_of_unique[kept] = rank_of_kept

    new_tid = np.full_like(tid, -1)
    new_tid[emitted] = final_of_unique[uidx]
    tm.tile_idx = new_tid.reshape(tm.tile_idx.shape)

    sel = first_idx[kept][order]
    sel_dev = jnp.asarray(sel.astype(np.int32))
    # ONE d2h of just the kept+sorted tile pixels (the writer's input);
    # the copy streams in the background and save() materializes it
    state.corpus_pal_pixels = _gather(pp_dev, sel_dev)
    try:
        state.corpus_pal_pixels.copy_to_host_async()
    except Exception:
        pass
    state.corpus_use = kcounts[order]
    # keep rgb/pal_initial aligned for rendering/debug views (device gather)
    if state.corpus_rgb is not None:
        state.corpus_rgb = _gather(jnp.asarray(state.corpus_rgb), sel_dev)
    if state.corpus_pal_initial is not None:
        state.corpus_pal_initial = np.asarray(state.corpus_pal_initial)[sel]
    return state

"""esReduce: global tile budget via PSNR threshold + corpus dedup.

The reference golden-ratio-searches a PSNR threshold, re-running the full
corpus materialization + merge for every evaluation (SolveTileCount /
STCGREval, tilingencoder.pas:4014-4046). The evaluator is monotone in the
threshold, so this collapses to ONE dedup pass + a sorted-quantile lookup
over per-unique-tile minimum effective PSNR — exact same fixed point,
found in one pass (SURVEY.md section 7, hard part 6).

Tile identity uses two independent 32-bit polynomial hashes of the
canonical RGB bytes computed ON DEVICE (the tiles never leave HBM; only
the 8-byte hashes cross to the host). A 64-bit collision over ~10^7 tiles
has probability ~1e-5 and would merely merge two visually unrelated tiles.

Semantics parity:
  - effective PSNR = PSNR/10 for keyframe-start frames (CKFPSNRDiv,
    :4016), plain PSNR otherwise; IsPredicted := eff > x (:4029-4032).
  - corpus = canonical tiles of unpredicted cells, exact-duplicate
    merge with summed use counts (TransferTiles + MakeTilesUnique(True),
    :4048-4103, :4720-4781).
  - final order: use count desc; ties break on the content hash instead
    of the reference's lexicographic pixel compare (deterministic, but a
    different — equally arbitrary — tie order).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EncoderSettings
from ..models.state import EncodeState

_RNG = np.random.RandomState(0x5EED)
# host numpy constants: a module-level jnp.asarray would init the JAX
# backend at import time (hangs forever on a dead axon tunnel); inside
# the jit trace they become on-device constants all the same
_C1 = (_RNG.randint(0, 1 << 31, 192) * 2 + 1).astype(np.int32)
_C2 = (_RNG.randint(0, 1 << 31, 192) * 2 + 1).astype(np.int32)


@jax.jit
def _tile_hashes(tiles_u8):
    """[..., 8, 8, 3] uint8 -> two int32 polynomial hashes per tile,
    stacked [2, ...] so the host pulls ONE transfer."""
    flat = tiles_u8.reshape(*tiles_u8.shape[:-3], 192).astype(jnp.int32)
    h1 = jnp.sum(flat * _C1, axis=-1)
    h2 = jnp.sum(flat * _C2, axis=-1)
    return jnp.stack([h1, h2])


@jax.jit
def _gather_tiles(tiles_flat, idx):
    return tiles_flat[idx]


def reduce_tiles(state: EncodeState, settings: EncoderSettings) -> EncodeState:
    F, N = state.n_frames, state.tilemap_size
    tm = state.tilemap
    psnr = tm.psnr.astype(np.float64)  # [F, N]
    kf_start = np.zeros(F, bool)
    for kf in state.keyframes:
        kf_start[kf.start_frame] = True
    eff = np.where(kf_start[:, None], psnr / 10.0, psnr)
    eff_flat = eff.reshape(-1)

    if state._hashes_prefetch is not None:
        # dispatched by predict_motion; the host copy streamed behind the
        # motion programs, so this materialization is (nearly) free
        hh = np.asarray(state._hashes_prefetch)
        state._hashes_prefetch = None
    elif isinstance(state.tiles_canon, np.ndarray):  # host-resident mode
        parts = []
        flat_tiles = state.tiles_canon.reshape(-1, 8, 8, 3)
        for i in range(0, len(flat_tiles), 262144):
            parts.append(np.asarray(_tile_hashes(jnp.asarray(flat_tiles[i : i + 262144]))))
        hh = np.concatenate(parts, axis=1)
    else:
        hh = np.asarray(_tile_hashes(state.tiles_canon))
        hh = hh.reshape(2, -1)
    key = (hh[0].astype(np.int64).reshape(-1) << 32) ^ (
        hh[1].astype(np.int64).reshape(-1) & 0xFFFFFFFF
    )
    uniq_keys, first_idx, inverse = np.unique(key, return_index=True, return_inverse=True)
    n_unique = len(first_idx)

    if settings.global_tiling_use_target_psnr:
        x = float(settings.global_tiling_target_psnr)
    else:
        target = settings.derived_tile_count(F * N)
        min_eff = np.full(n_unique, np.inf)
        np.minimum.at(min_eff, inverse, eff_flat)
        order = np.sort(min_eff)
        target = min(target, n_unique)
        x = float(order[target - 1]) if target >= 1 else -np.inf
        # The reference's golden search brackets the count step nearest the
        # target (GoldenRatioSearch, utils.pas:1044-1072 via STCGREval,
        # tilingencoder.pas:4014-4046). When a tie block of equal eff values
        # spans the target, the achievable counts are only the tie-block END
        # (threshold = tie value) or the tie-block START (threshold = previous
        # DISTINCT value). order[target-2] sits INSIDE the tie block and holds
        # the same value, so comparing against it was a no-op that always
        # overshot to the block end (round-2 bench: corpus 115,537 vs the
        # ~59,843 budget). Compare the two genuine step counts instead and
        # take the closer (ties -> the smaller corpus, respecting the budget).
        cnt_hi = int(np.searchsorted(order, x, side="right"))  # tie-block end
        cnt_lo = int(np.searchsorted(order, x, side="left"))  # count below tie
        if cnt_lo >= 1 and abs(cnt_lo - target) <= abs(cnt_hi - target):
            x = float(order[cnt_lo - 1])

    unpred_flat = eff_flat <= x
    tm.predicted = (~unpred_flat).reshape(F, N)

    sel = np.flatnonzero(unpred_flat)
    sel_u = inverse[sel]
    used_unique, sel_to_corpus = np.unique(sel_u, return_inverse=True)
    counts = np.bincount(sel_to_corpus, minlength=len(used_unique)).astype(np.int64)

    # sort: use count desc, ties by content hash (see module docstring)
    order = np.lexsort((uniq_keys[used_unique], -counts))
    rank = np.empty(len(order), np.int64)
    rank[order] = np.arange(len(order))

    rep_flat = first_idx[used_unique][order].astype(np.int32)
    if isinstance(state.tiles_canon, np.ndarray):  # host-resident mode
        state.corpus_rgb = jnp.asarray(
            state.tiles_canon.reshape(F * N, 8, 8, 3)[rep_flat]
        )
    else:
        tiles_flat = state.tiles_canon.reshape(F * N, 8, 8, 3)
        state.corpus_rgb = _gather_tiles(tiles_flat, jnp.asarray(rep_flat))
    state.corpus_use = counts[order]
    tile_idx = np.full(F * N, -1, np.int64)
    tile_idx[sel] = rank[sel_to_corpus]
    tm.tile_idx = tile_idx.reshape(F, N)
    return state

"""esPredictMotion: motion field over all frames.

Frame t searches frame t-1's ORIGINAL pixels; frame 0 searches frame 1
(TTilingEncoder.PredictMotion, tilingencoder.pas:1964-1991 — the buffers
drawn by DoXY are the un-mirrored frame tiles, i.e. the input frames).
Every frame pair is independent, so unlike the reference's sequential
double-buffer walk this is embarrassingly parallel; we loop on the host
but each search is one fused device program.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EncoderSettings
from ..models.state import EncodeState
from ..ops.metrics import euclidean_to_psnr
from .motion import motion_search_batch


def _frame_chunk(H: int, W: int, budget_bytes: float = 0.0) -> int:
    """Frames per dispatch. lax.map runs frames SEQUENTIALLY inside one
    program, so the field transients are per-iteration, not per-chunk —
    the chunk only bounds the [chunk, H, W, 3] cur+ref copies. Large
    chunks matter because every dispatch costs a full tunnel round-trip
    (~30-40 ms measured) on top of the compute, but the copies must fit
    next to whatever is already resident: size the budget from the
    device's actual free memory (conservative fallback 4e9 — a previous
    fixed 2e10 budget could stage ~20 GB in host-streaming mode and OOM
    a 16 GB-class chip)."""
    if not budget_bytes:
        budget_bytes = 4e9
        try:
            stats = jax.local_devices()[0].memory_stats()
            if stats and "bytes_limit" in stats:
                free = stats["bytes_limit"] - stats.get("bytes_in_use", 0)
                budget_bytes = max(1e9, min(0.5 * free, 2e10))
        except Exception:
            pass
    per_frame = H * W * 3 * 2  # cur + ref uint8 copies
    return max(1, int(budget_bytes / per_frame))


@functools.partial(jax.jit,
                   static_argnames=("radius", "int16", "rank_dims", "field_impl"))
def _motion_packed(cur, prev, radius: int, int16: bool, rank_dims: int,
                   field_impl: str = "passes"):
    """motion_search_batch + PSNR, packed into ONE i32 array so the host
    pulls a single minimal transfer (each d2h costs a tunnel round-trip
    and bad tunnel windows move bytes at ~25 MB/s): offsets fit 16 bits
    each in word 0; word 1 is the PSNR's f32 bits."""
    oy, ox, err = motion_search_batch(cur, prev, radius, int16, rank_dims,
                                      field_impl=field_impl)
    B = oy.shape[0]
    offs = ((oy.reshape(B, -1) + 32768) << 16) | (ox.reshape(B, -1) + 32768)
    psnr_bits = jax.lax.bitcast_convert_type(
        euclidean_to_psnr(err).reshape(B, -1), jnp.int32)
    return jnp.stack([offs, psnr_bits], axis=0)  # [2, B, N] i32


def predict_motion(state: EncodeState, settings: EncoderSettings,
                   mesh=None) -> EncodeState:
    R = settings.motion_predict_radius
    F = state.n_frames
    if F == 0 or R <= 0 or F < 2:
        state.ensure_ingest()
        return state
    tm = state.tilemap
    N = state.tilemap_size
    refs = np.concatenate([[1], np.arange(F - 1)])  # frame 0 predicts from 1
    if mesh is not None and mesh.shape.get("data", 1) > 1:
        state.ensure_ingest()
        return _predict_motion_dp(state, settings, mesh, state.frames_rgb,
                                  refs, R)
    pieces = state._ingest_pieces[0] if state._ingest_pieces else None
    outs = []
    if pieces is not None:
        # pipelined ingest: each piece's search program depends only on
        # that piece (+ the previous piece's last frame), so piece p's
        # motion runs on the chip while pieces p+1.. are still in flight
        # on the h2d stream — the load transfer hides under motion compute
        # instead of serializing in front of it. Ragged tails pad to the
        # leading piece size by repeating the last frame (one compile
        # class; the padded rows are sliced off on the host).
        B = int(pieces[0].shape[0])
        prev_tail = None
        for p, fp in enumerate(pieces):
            b = int(fp.shape[0])
            if p == 0:
                prev = jnp.concatenate([fp[1:2], fp[:-1]])
            else:
                prev = jnp.concatenate([prev_tail, fp[:-1]])
            prev_tail = fp[-1:]
            if b < B:  # ragged tail
                pad = jnp.broadcast_to(fp[-1:], (B - b,) + fp.shape[1:])
                fp = jnp.concatenate([fp, pad])
                prev = jnp.concatenate([prev, pad])
            outs.append(_motion_packed(
                fp, prev, R, settings.int16_features,
                settings.motion_rank_dims, settings.motion_field,
            )[:, :b])
            # dispatch this piece's tile pass BEHIND its motion program:
            # interleaving keeps every program's h2d dependency at piece
            # p or earlier, so the device streams through motion while
            # later pieces are still in flight (load.py defers the
            # passes for exactly this ordering)
            state.run_ingest_chunk(p)
    else:
        frames = state.frames_rgb
        chunk = _frame_chunk(state.height, state.width)
        for i in range(0, F, chunk):
            j = min(F, i + chunk)
            outs.append(_motion_packed(
                jnp.asarray(frames[i:j]), jnp.asarray(frames[refs[i:j]]), R,
                settings.int16_features, settings.motion_rank_dims,
                settings.motion_field,
            ))
    packed_dev = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    # dispatch Reduce's tile hashes now (they only need the canonical
    # tiles): the hash program + its d2h stream hide behind the motion
    # programs still crunching, so reduce_tiles starts with the hashes
    # already host-local
    from .reduce import _tile_hashes

    if state._ingest_pieces is not None:
        hash_parts = [_tile_hashes(tp) for tp in state._ingest_pieces[1]]
        hashes_dev = jnp.concatenate(
            [h.reshape(2, -1) for h in hash_parts], axis=1)
    elif not isinstance(state.tiles_canon, np.ndarray):
        hashes_dev = _tile_hashes(state.tiles_canon).reshape(2, -1)
    else:
        hashes_dev = None
    try:
        packed_dev.copy_to_host_async()
        if hashes_dev is not None:
            hashes_dev.copy_to_host_async()
    except Exception:
        pass
    state._hashes_prefetch = hashes_dev
    # run the deferred load finalization (small flag/corr pull + host
    # keyframe loop) while the motion programs just dispatched crunch
    state.ensure_ingest()
    packed = np.asarray(packed_dev)
    tm.pred_y[:] = ((packed[0] >> 16) & 0xFFFF).astype(np.int32) - 32768
    tm.pred_x[:] = (packed[0] & 0xFFFF).astype(np.int32) - 32768
    tm.psnr[:] = packed[1].view(np.float32)
    return state


def _predict_motion_dp(state, settings, mesh, frames, refs, R):
    """Data-parallel motion: frame pairs are independent, so the batch
    shards over the mesh "data" axis and each chip searches its frames
    (frame-pair parallelism the reference gets from its thread pool,
    tilingencoder.pas:1964-1991)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    state.ensure_ingest()
    F = state.n_frames
    N = state.tilemap_size
    dd = mesh.shape["data"]
    Fp = -(-F // dd) * dd
    idxs = np.minimum(np.arange(Fp), F - 1)
    sharding = NamedSharding(mesh, P("data"))
    cur = jax.device_put(jnp.asarray(np.asarray(frames)[idxs]), sharding)
    prev = jax.device_put(jnp.asarray(np.asarray(frames)[refs[idxs]]), sharding)
    oy, ox, err = _motion_vmap(cur, prev, R, settings.int16_features,
                               settings.motion_rank_dims,
                               settings.motion_field)
    tm = state.tilemap
    tm.pred_y[:] = np.asarray(oy).reshape(Fp, N)[:F]
    tm.pred_x[:] = np.asarray(ox).reshape(Fp, N)[:F]
    tm.psnr[:] = np.asarray(euclidean_to_psnr(err)).reshape(Fp, N)[:F]
    return state


@functools.partial(jax.jit,
                   static_argnames=("radius", "int16", "rank_dims", "field_impl"))
def _motion_vmap(cur, prev, radius: int, int16: bool, rank_dims: int,
                 field_impl: str = "passes"):
    from .motion import _motion_core

    return jax.vmap(
        lambda a, b: _motion_core(a, b, radius, int16, rank_dims,
                                  field_impl=field_impl)
    )(cur, prev)

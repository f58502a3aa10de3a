"""esPredictMotion: motion field over all frames.

Frame t searches frame t-1's ORIGINAL pixels; frame 0 searches frame 1
(TTilingEncoder.PredictMotion, tilingencoder.pas:1964-1991 — the buffers
drawn by DoXY are the un-mirrored frame tiles, i.e. the input frames).
Every frame pair is independent, so unlike the reference's sequential
double-buffer walk this is embarrassingly parallel; we loop on the host
but each search is one fused device program.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import EncoderSettings
from ..models.state import EncodeState
from ..ops.metrics import euclidean_to_psnr
from .motion import motion_search_batch


def _frame_chunk(H: int, W: int, budget_bytes: float = 6e9) -> int:
    """Frames per dispatch, bounded by the window-DCT field footprint."""
    per_frame = H * W * 192 * 4 * 3  # field + phase view + err headroom
    return max(1, int(budget_bytes / per_frame))


def predict_motion(state: EncodeState, settings: EncoderSettings) -> EncodeState:
    R = settings.motion_predict_radius
    F = state.n_frames
    if F == 0 or R <= 0 or F < 2:
        return state
    tm = state.tilemap
    N = state.tilemap_size
    frames = state.frames_rgb
    refs = np.concatenate([[1], np.arange(F - 1)])  # frame 0 predicts from 1
    chunk = _frame_chunk(state.height, state.width)
    outs = []  # keep results on device; sync ONCE at the end (the tunnel
    # round-trip per dispatch costs more than the compute)
    for i in range(0, F, chunk):
        j = min(F, i + chunk)
        oy, ox, err = motion_search_batch(
            jnp.asarray(frames[i:j]), jnp.asarray(frames[refs[i:j]]), R,
            settings.int16_features,
        )
        outs.append((oy, ox, euclidean_to_psnr(err)))
    oy = np.concatenate([np.asarray(o[0]).reshape(-1, N) for o in outs])
    ox = np.concatenate([np.asarray(o[1]).reshape(-1, N) for o in outs])
    ps = np.concatenate([np.asarray(o[2]).reshape(-1, N) for o in outs])
    tm.pred_y[:] = oy
    tm.pred_x[:] = ox
    tm.psnr[:] = ps
    return state

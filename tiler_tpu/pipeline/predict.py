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
from .motion import motion_search


def predict_motion(state: EncodeState, settings: EncoderSettings) -> EncodeState:
    R = settings.motion_predict_radius
    F = state.n_frames
    if F == 0 or R <= 0:
        return state
    tm = state.tilemap
    N = state.tilemap_size
    frames = state.frames_rgb
    for f in range(F):
        ref = 1 if f == 0 else f - 1
        if ref >= F:  # single-frame video: no prediction possible
            continue
        oy, ox, err = motion_search(jnp.asarray(frames[f]), jnp.asarray(frames[ref]), R)
        tm.pred_y[f] = np.asarray(oy).reshape(N)
        tm.pred_x[f] = np.asarray(ox).reshape(N)
        tm.psnr[f] = np.asarray(euclidean_to_psnr(err)).reshape(N)
    return state

"""Preview rendering: the GUI's four render pages as numpy images.

The Lazarus GUI renders input / output (with motion-predicted tiles from
the back buffer) / global-tiles sheet / palette sheet bitmaps plus a
per-frame PSNR readout (TTilingEncoder.Render, tilingencoder.pas:
3455-3736; page enum :20). Headless equivalents return RGB arrays for
notebooks, PNG export, or quick inspection."""
from __future__ import annotations

from typing import Optional

import numpy as np

from .models.state import EncodeState

TILE_W = 8


def render_input(state: EncodeState, frame_idx: int) -> np.ndarray:
    """The loaded input frame (rpInput)."""
    return np.asarray(state.frames_rgb[frame_idx])


def render_output(state: EncodeState, frame_idx: int) -> np.ndarray:
    """Decode the tilemap state up to frame_idx (rpOutput): tile commands
    through palettes, motion-predicted cells copied from the previous
    reconstruction."""
    tm = state.tilemap
    th, tw = state.tilemap_h, state.tilemap_w
    pal = np.asarray(state.palettes_rgb)
    pp = np.asarray(state.corpus_pal_pixels)
    prev = np.zeros((state.height, state.width, 3), np.uint8)
    for f in range(frame_idx + 1):
        cur = np.zeros_like(prev)
        for c in range(state.tilemap_size):
            y, x = divmod(c, tw)
            ys, xs = y * TILE_W, x * TILE_W
            if tm.predicted[f, c]:
                sy, sx = ys + int(tm.pred_y[f, c]), xs + int(tm.pred_x[f, c])
                cur[ys : ys + 8, xs : xs + 8] = prev[sy : sy + 8, sx : sx + 8]
            else:
                t = pp[tm.tile_idx[f, c]]
                if tm.hmirror[f, c]:
                    t = t[:, ::-1]
                if tm.vmirror[f, c]:
                    t = t[::-1]
                cur[ys : ys + 8, xs : xs + 8] = pal[tm.pal_idx[f, c]][t]
        prev = cur
    return prev


def render_tiles(state: EncodeState, page_w_tiles: int = 64,
                 palette_idx: Optional[int] = None) -> np.ndarray:
    """Global tile sheet (rpTilesPalette), tiles rendered through a palette
    (default: each tile's initial palette)."""
    pp = np.asarray(state.corpus_pal_pixels)
    pal = np.asarray(state.palettes_rgb)
    T = len(pp)
    if palette_idx is None:
        pidx = np.asarray(state.corpus_pal_initial)[:T] if state.corpus_pal_initial is not None else np.zeros(T, int)
    else:
        pidx = np.full(T, palette_idx)
    rows = -(-T // page_w_tiles)
    sheet = np.zeros((rows * TILE_W, page_w_tiles * TILE_W, 3), np.uint8)
    for i in range(T):
        y, x = divmod(i, page_w_tiles)
        sheet[y * 8 : y * 8 + 8, x * 8 : x * 8 + 8] = pal[pidx[i]][pp[i]]
    return sheet


def render_palettes(state: EncodeState, scale: int = 8) -> np.ndarray:
    """Palette sheet: one row per palette, one column per color."""
    pal = np.asarray(state.palettes_rgb)  # [P, S, 3]
    img = pal.repeat(scale, axis=0).repeat(scale, axis=1)
    return img


def frame_psnr(state: EncodeState, frame_idx: int) -> float:
    """Mean per-tile PSNR-HVS of a frame (GUI readout, :3713-3731)."""
    return float(state.tilemap.psnr[frame_idx].mean())

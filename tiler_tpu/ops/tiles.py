"""Tile extraction, mirroring, and the mirror-canonicalization heuristic.

Replaces TFrame.LoadFromImage scatter (tilingencoder.pas:1293-1327),
HMirrorTile/VMirrorTile (tilingencoder.pas:3257-3322), GetTileZoneSum and
GetTileHVMirrorHeuristics (tilingencoder.pas:4842-4878) with batched ops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .color import luma

TILE_W = 8


def frame_to_tiles(frame):
    """[H, W, C] -> [Th, Tw, 8, 8, C] (H, W multiples of 8)."""
    H, W = frame.shape[0], frame.shape[1]
    th, tw = H // TILE_W, W // TILE_W
    t = frame.reshape(th, TILE_W, tw, TILE_W, -1)
    return jnp.swapaxes(t, 1, 2)


def tiles_to_frame(tiles):
    """[Th, Tw, 8, 8, C] -> [Th*8, Tw*8, C]."""
    th, tw = tiles.shape[0], tiles.shape[1]
    t = jnp.swapaxes(tiles, 1, 2)
    return t.reshape(th * TILE_W, tw * TILE_W, *tiles.shape[4:])


def pad_frame(frame: np.ndarray) -> np.ndarray:
    """Zero-pad H,W up to multiples of 8 (reference ceil-divides the tilemap,
    tilingencoder.pas:1776; out-of-image pixels stay zero/black)."""
    H, W = frame.shape[:2]
    ph = (-H) % TILE_W
    pw = (-W) % TILE_W
    if ph or pw:
        frame = np.pad(frame, [(0, ph), (0, pw)] + [(0, 0)] * (frame.ndim - 2))
    return frame


def mirror_tiles(tiles, hmir, vmir):
    """Apply per-tile H/V mirrors. tiles [..., 8, 8, C]; hmir/vmir broadcastable
    bool arrays over the leading axes."""
    hm = jnp.asarray(hmir)[..., None, None, None]
    vm = jnp.asarray(vmir)[..., None, None, None]
    t = jnp.where(hm, tiles[..., :, ::-1, :], tiles)
    t = jnp.where(vm, t[..., ::-1, :, :], t)
    return t


def mirror_pal_tiles(tiles, hmir, vmir):
    """Same for palette-index tiles [..., 8, 8] (no channel axis)."""
    hm = jnp.asarray(hmir)[..., None, None]
    vm = jnp.asarray(vmir)[..., None, None]
    t = jnp.where(hm, tiles[..., :, ::-1], tiles)
    t = jnp.where(vm, t[..., ::-1, :], t)
    return t


def mirror_heuristics(tiles_rgb):
    """Canonical 'spin': mirror so the brightest quadrant sum is top-left.

    tiles_rgb: [..., 8, 8, 3] byte-scale. Returns (hmir, vmir) bool [...].
    GetTileHVMirrorHeuristics (tilingencoder.pas:4865-4878): quadrant sums of
    integer luma; HMirror when left side sum < right side sum, VMirror when
    top < bottom (strict <).
    """
    lum = luma(tiles_rgb)  # [..., 8, 8]
    q = lum.reshape(*lum.shape[:-2], 2, 4, 2, 4).sum(axis=(-3, -1))  # [..., 2, 2]
    left = q[..., 0, 0] + q[..., 1, 0]
    right = q[..., 0, 1] + q[..., 1, 1]
    top = q[..., 0, 0] + q[..., 0, 1]
    bottom = q[..., 1, 0] + q[..., 1, 1]
    return left < right, top < bottom


def canonicalize(tiles_rgb):
    """Mirror every tile to its canonical spin; returns (tiles, hmir, vmir).

    Matches AsyncLoadFromImage (tilingencoder.pas:1393-1410): the stored
    frame tiles are the mirrored (canonical) ones and the tilemap records
    the mirror flags used.
    """
    hmir, vmir = mirror_heuristics(tiles_rgb)
    return mirror_tiles(tiles_rgb, hmir, vmir), hmir, vmir

#!/usr/bin/env python
"""A/B: tile/palette index assignment vs LZMA compressed size + speed.

VERDICT r03 #5 ("save-step payload levers"): the writer's payload is
LZMA-compressed per keyframe, and the tile/palette index ASSIGNMENT is
a free variable — any consistent permutation decodes to identical
pixels (the reference's use-count-desc sort is one choice,
tilingencoder.pas:4626-4718). Two candidate re-orderings, both keeping
the reference's TileSet split invariant (use>=2 prefix in the TileSet,
singles inline as IntraTile):

  content   — within the reused prefix, sort tiles lexicographically by
              palette pixels: similar 64-byte rows become adjacent in
              the TileSet blob, which LZMA's match finder can exploit.
  first_use — within the reused prefix, number tiles by first emission
              order (KF raster): spatially-close cells get close
              indices, so command-word high bytes vary slowly.
  pal_luma  — keep tile order, but sort each PALETTE's colors by luma
              and remap every tile's pixel indices consistently: similar
              tiles under different palettes then share TileSet byte
              patterns (gradients all count 0->S).

Measured on the REFERENCE's own demo streams (real content, no encode
needed): read with GTMReader, permute, re-emit with GTMWriter, compare
per-mode compressed bytes + wall time. Run host-only (no JAX import).
"""
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from tiler_tpu.bitstream.gtm import GTMReader, GTMWriter, GTMDecoder


def use_counts(g):
    cnt = np.zeros(len(g.tiles_pal), np.int64)
    for fr in g.frames:
        emitted = (fr.tile_idx >= 0) & ~fr.predicted
        np.add.at(cnt, fr.tile_idx[emitted], 1)
    return cnt


def remap(g, perm):
    """perm[new] = old. Returns (tiles, counts_of_new, idx_map old->new)."""
    inv = np.empty(len(perm), np.int64)
    inv[perm] = np.arange(len(perm))
    return inv


def emit(g, order_name, counts):
    T = g.tileset_count  # reference: tiles in TileSet (use>=2 prefix)
    n = len(g.tiles_pal)
    if order_name == "pal_luma":
        # per-palette color permutation (luma-ascending) + consistent
        # tile pixel remap; tile/palette indexes unchanged
        pal = np.asarray(g.palettes_rgb, np.int32)  # [P, S, 3]
        luma = pal[..., 0] * 299 + pal[..., 1] * 587 + pal[..., 2] * 114
        order = np.argsort(luma, axis=1, kind="stable")  # [P, S] new->old
        inv = np.empty_like(order)  # old color -> new slot
        np.put_along_axis(inv, order, np.arange(order.shape[1])[None, :],
                          axis=1)
        pal_new = np.take_along_axis(pal, order[..., None], axis=1)
        # each tile is rendered through ONE palette per use... a tile can
        # be used with multiple palettes; remapping requires a single
        # permutation per tile. Use each tile's DOMINANT palette: count
        # (tile, palette) uses and remap by the most frequent.
        P, S = pal.shape[0], pal.shape[1]
        tp = np.zeros((n, P), np.int64)
        for fr in g.frames:
            m = (fr.tile_idx >= 0) & ~fr.predicted
            np.add.at(tp, (fr.tile_idx[m], fr.pal_idx[m]), 1)
        dom = np.argmax(tp, axis=1)  # [n]
        tiles_new = np.take_along_axis(
            inv[dom], g.tiles_pal.reshape(n, 64), axis=1
        ).reshape(n, 8, 8).astype(np.uint8)
        # cells whose palette != the tile's dominant palette would decode
        # WRONG colors under a per-tile remap — count how many
        total = int(tp.sum())
        wrong = int((tp * (np.arange(P)[None, :] != dom[:, None])).sum())
        frames = [__import__("copy").copy(fr) for fr in g.frames]
        print(f"  [pal_luma] cells on non-dominant palette: "
              f"{wrong}/{total} = {wrong/max(total,1):.2%} "
              f"(>0 means this ordering is NOT decode-safe here)")
        return tiles_new, counts, frames, pal_new
    if order_name == "use_count":
        perm = np.arange(n)
    elif order_name == "content":
        # reused prefix sorted by pixel content; tail (intra) unchanged
        pref = np.lexsort(g.tiles_pal[:T].reshape(T, 64).T[::-1])
        perm = np.concatenate([pref, np.arange(T, n)])
    elif order_name == "first_use":
        first = np.full(n, 1 << 60, np.int64)
        t = 0
        for fr in g.frames:
            emitted = np.flatnonzero((fr.tile_idx >= 0) & ~fr.predicted)
            ids = fr.tile_idx[emitted]
            pos = t + np.arange(len(emitted))
            np.minimum.at(first, ids, pos)
            t += len(fr.tile_idx)
        pref = np.argsort(first[:T], kind="stable")
        perm = np.concatenate([pref, np.arange(T, n)])
    else:
        raise ValueError(order_name)

    old_to_new = np.empty(n, np.int64)
    old_to_new[perm] = np.arange(n)
    tiles = g.tiles_pal[perm]
    cnts = counts[perm]
    frames = []
    for fr in g.frames:
        import copy
        f2 = copy.copy(fr)
        tid = fr.tile_idx.copy()
        m = tid >= 0
        tid[m] = old_to_new[tid[m]]
        f2.tile_idx = tid
        frames.append(f2)
    return tiles, cnts, frames


def run(path):
    g = GTMReader.read(path)
    counts = use_counts(g)
    print(f"\n== {path} ==  tiles={len(g.tiles_pal)} tileset={g.tileset_count} "
          f"frames={len(g.frames)} pal={len(g.palettes_rgb)}x{g.palette_size}")
    base = {}
    ref_rgb = None
    for order in ("use_count", "content", "first_use", "pal_luma"):
        out = emit(g, order, counts)
        pal_rgb = g.palettes_rgb
        if len(out) == 4:
            tiles, cnts, frames, pal_rgb = out
        else:
            tiles, cnts, frames = out
        for mode in ("optimal", "fast"):
            w = GTMWriter(g.tilemap_w, g.tilemap_h, g.fps or 25.0,
                          g.palette_size, settings_text=g.settings_text,
                          lzma_mode=mode)
            import io
            buf = io.BytesIO()
            t0 = time.time()
            stats = w.write(buf, tiles, cnts, pal_rgb, frames,
                            g.keyframe_end)
            dt = time.time() - t0
            key = f"{order}/{mode}"
            b = stats.total_bytes
            if order == "use_count":
                base[mode] = b
            # decode-identity check once per ordering (optimal only)
            note = ""
            if mode == "optimal":
                dec = np.stack(GTMDecoder(buf.getvalue()).decode_frames(6))
                if ref_rgb is None:
                    ref_rgb = dec
                    note = " (decode ref)"
                else:
                    note = " decode==" + str(bool(np.array_equal(dec, ref_rgb)))
            print(f"  {key:22s} {b:9d} B  {b/base[mode]-1:+7.3%}  "
                  f"{dt:6.1f}s{note}", flush=True)


if __name__ == "__main__":
    paths = sys.argv[1:] or [
        "/root/reference/docs/demo/city_cif.gtm",
        "/root/reference/docs/demo/football_cif.gtm",
    ]
    for p in paths:
        run(p)

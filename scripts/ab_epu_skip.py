#!/usr/bin/env python
"""Measure how often the EPU cartesian re-rank changes the phase-A winner
vs the plain KNN top-1, and whether the top-k feature-distance margin
(d2/d1) predicts it — the basis for a decisive-top-1 EPU skip.

Usage: python scripts/ab_epu_skip.py [city]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("TILER_TPU_PLATFORM"):  # host-only smoke runs
    jax.config.update("jax_platforms", os.environ["TILER_TPU_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", "/tmp/tiler_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from bench import synthetic_clip, realistic_clip
    from tiler_tpu.config import EncoderSettings
    from tiler_tpu.pipeline.encoder import Encoder
    from tiler_tpu.pipeline import reconstruct as RC
    from tiler_tpu.pipeline.motion import tile_features_raster
    from tiler_tpu.ops.color import rgb_to_yuv

    F = int(os.environ.get("PB_FRAMES", "16"))
    H = int(os.environ.get("PB_H", "720"))
    W = int(os.environ.get("PB_W", "1280"))
    clip = realistic_clip(F, H, W) if "city" in sys.argv else synthetic_clip(F, H, W)
    assert clip is not None, "reference demo stream unavailable"
    settings = EncoderSettings(
        palette_count=int(os.environ.get("PB_PALETTES", "1024")),
        palette_size=16, motion_predict_radius=32,
        global_tiling_quality_based_tile_count=7.0, epu_knn_k=64,
    )
    enc = Encoder(settings, log=lambda *a: None)
    enc.load_frames(clip, fps=25.0).predict_motion().reduce() \
       .prepare_palettes().dither()
    st = enc.state
    S = settings.palette_size
    T = len(st.corpus_pal_pixels)
    print(f"T={T}", flush=True)

    rendered = RC._render_corpus_dev(
        jnp.asarray(st.palettes_rgb),
        jnp.asarray(st.corpus_pal_initial.astype(np.int32)),
        jnp.asarray(st.corpus_pal_pixels))
    dsj = tile_features_raster(rendered.astype(jnp.float32))
    G = RC._indicator_dcts(st.corpus_pal_pixels, S).astype(jnp.bfloat16)
    Q = RC._tile_quad(G, S)
    pal_initial = jnp.asarray(st.corpus_pal_initial.astype(np.int32))
    pal_yuv = rgb_to_yuv(jnp.asarray(st.palettes_rgb, jnp.float32))
    pp_dev = jnp.asarray(st.corpus_pal_pixels)
    palettes_dev = jnp.asarray(st.palettes_rgb)

    kk, pal_k = 64, 16
    ntri3 = 3 * (S * (S + 1) // 2)
    per_cell = kk * (64 * S * 2 + ntri3 * 4) + pal_k * ntri3 * 4
    cell_chunk = max(64, min(4096, int(3e8 / per_cell)))
    Tpad = 256
    while Tpad < T:
        Tpad *= 2

    tiles = jnp.asarray(st.tiles_canon, jnp.float32)  # [F, N, 8, 8, 3]
    N = tiles.shape[1]

    changed_tile = 0
    changed_any = 0
    total = 0
    # per-cell records for margin analysis
    margins = []
    imp = []
    chg = []
    for f in range(tiles.shape[0]):
        feats = tile_features_raster(tiles[f])
        idx, errk = RC._topk_oneshot(feats, dsj, kk, Tpad)
        cand_pal = pal_initial[idx[:, :pal_k]]
        t, p, _ = RC._epu_rank_all(feats, idx, cand_pal, G, pal_yuv, S,
                                   cell_chunk=cell_chunk, Q=Q)
        e_epu = RC._exact_choice_err(feats, t, p, pp_dev, palettes_dev)
        e_top1 = RC._exact_choice_err(feats, idx[:, 0], pal_initial[idx[:, 0]],
                                      pp_dev, palettes_dev)
        t, p, idxh, errkh = map(np.asarray, (t, p, idx, errk))
        e_epu, e_top1 = np.asarray(e_epu), np.asarray(e_top1)
        ct = t != idxh[:, 0]
        ca = ct | (p != np.asarray(pal_initial)[idxh[:, 0]])
        changed_tile += int(ct.sum())
        changed_any += int(ca.sum())
        total += N
        d1 = np.maximum(errkh[:, 0], 1e-6)
        margins.append(errkh[:, 1] / d1)  # top-2/top-1 ranked distance ratio
        imp.append((e_top1 - e_epu) / np.maximum(e_top1, 1e-6))
        chg.append(ca)
    margins = np.concatenate(margins)
    imp = np.concatenate(imp)
    chg = np.concatenate(chg)
    print(f"cells={total} EPU changed tile: {changed_tile/total:.3%} "
          f"changed (tile,pal): {changed_any/total:.3%}")
    print(f"mean exact-err improvement from EPU: {imp.mean():.4%} "
          f"(p95 {np.percentile(imp, 95):.3%})")
    for thr in (1.05, 1.1, 1.2, 1.5, 2.0, 3.0):
        skip = margins >= thr
        # what EPU improvement would the skipped cells have missed?
        missed = imp[skip]
        print(f"  margin>={thr:4.2f}: skips {skip.mean():6.2%} of cells | "
              f"changed-any among skipped {chg[skip].mean() if skip.any() else 0:.3%} | "
              f"missed improvement mean {missed.mean() if skip.any() else 0:.4%} "
              f"p99 {np.percentile(missed, 99) if skip.any() else 0:.3%}")


if __name__ == "__main__":
    main()

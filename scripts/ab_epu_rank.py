#!/usr/bin/env python
"""Where in the 64-candidate list do EPU winners actually land?

If the winning tile's KNN rank concentrates in the top few, the cartesian
re-rank width (and its dominant Gi/Qi row-gather traffic) can be capped
with bounded output deviation — same playbook as the measured epu_pal_k
cap. Reports the winner-rank CDF and the exact-error regret of capping.

Usage: python scripts/ab_epu_rank.py [city]
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

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

    F, H, W = 16, 720, 1280
    clip = realistic_clip(F, H, W) if "city" in sys.argv else synthetic_clip(F, H, W)
    settings = EncoderSettings(
        palette_count=1024, palette_size=16, motion_predict_radius=32,
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

    tiles = jnp.asarray(st.tiles_canon, jnp.float32)
    ranks = []
    err_full = []
    err_cap = {c: [] for c in (8, 16, 24, 32)}
    for f in range(tiles.shape[0]):
        feats = tile_features_raster(tiles[f])
        idx, _ = RC._topk_oneshot(feats, dsj, kk, Tpad)
        t64, p64, _ = RC._epu_rank_all(feats, idx, pal_initial[idx[:, :pal_k]],
                                       G, pal_yuv, S, cell_chunk=cell_chunk, Q=Q)
        e64 = RC._exact_choice_err(feats, t64, p64, pp_dev, palettes_dev)
        r = np.argmax(np.asarray(idx) == np.asarray(t64)[:, None], axis=1)
        ranks.append(r)
        err_full.append(np.asarray(e64))
        for c in err_cap:
            pk = min(pal_k, c)
            tc, pc, _ = RC._epu_rank_all(
                feats, idx[:, :c], pal_initial[idx[:, :pk]], G, pal_yuv, S,
                cell_chunk=cell_chunk, Q=Q)
            ec = RC._exact_choice_err(feats, tc, pc, pp_dev, palettes_dev)
            err_cap[c].append(np.asarray(ec))
    ranks = np.concatenate(ranks)
    err_full = np.concatenate(err_full)
    print("winner tile-rank CDF:", flush=True)
    for c in (1, 2, 4, 8, 16, 24, 32, 48, 64):
        print(f"  rank<{c:3d}: {(ranks < c).mean():8.4%}")
    for c, es in sorted(err_cap.items()):
        ec = np.concatenate(es)
        reg = (ec - err_full) / np.maximum(err_full, 1e-6)
        worse = (ec > err_full * (1 + 1e-6)).mean()
        print(f"cap kk={c:2d}: cells worse {worse:7.3%} | regret mean "
              f"{reg.mean():.4%} p99 {np.percentile(reg, 99):.4%} "
              f"max {reg.max():.3%}")


if __name__ == "__main__":
    main()

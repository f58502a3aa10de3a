#!/usr/bin/env python
"""Microbenchmark reconstruct phase A internals + load internals at bench
shapes on the real chip: where do the 80 ms/frame (phase A) and the load
second actually go?"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tiler_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, iters=3):
    fn()  # warm/compile
    best = np.inf
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    print(f"{name:52s} {best*1e3:9.2f} ms", flush=True)
    return best


def main():
    from bench import synthetic_clip
    from tiler_tpu.config import EncoderSettings
    from tiler_tpu.pipeline.encoder import Encoder
    from tiler_tpu.pipeline import reconstruct as RC
    from tiler_tpu.pipeline.motion import tile_features_raster
    from tiler_tpu.pipeline import load as LOAD
    from tiler_tpu.ops.color import rgb_to_yuv

    F, H, W = 16, 720, 1280
    clip = synthetic_clip(F, H, W)
    settings = EncoderSettings(
        palette_count=1024, palette_size=16, motion_predict_radius=32,
        global_tiling_quality_based_tile_count=7.0, epu_knn_k=64,
    )

    # ---- load internals -------------------------------------------------
    timeit("load: h2d 44MB frames", lambda: jnp.asarray(clip))
    frames_dev = jnp.asarray(clip)
    timeit("load: _load_chunk compute (16f)",
           lambda: LOAD._load_chunk(frames_dev))
    def full_load():
        enc = Encoder(settings, log=lambda *a: None)
        enc.load_frames(clip, fps=25.0)
        return enc.state.correlations
    timeit("load: full load() (h2d+compute+pull)", full_load, iters=2)

    # ---- state up to reconstruct ---------------------------------------
    enc = Encoder(settings, log=lambda *a: None)
    enc.load_frames(clip, fps=25.0).predict_motion().reduce() \
       .prepare_palettes().dither()
    st = enc.state
    T = len(st.corpus_pal_pixels)
    S = settings.palette_size
    print(f"corpus T={T}")

    rendered = RC._render_corpus_dev(
        jnp.asarray(st.palettes_rgb),
        jnp.asarray(st.corpus_pal_initial.astype(np.int32)),
        jnp.asarray(st.corpus_pal_pixels))
    dsj = tile_features_raster(rendered.astype(jnp.float32))
    jax.block_until_ready(dsj)

    tiles_f = jnp.asarray(st.tiles_canon[0]).reshape(-1, 8, 8, 3)
    N = tiles_f.shape[0]
    feats = tile_features_raster(tiles_f.astype(jnp.float32))
    jax.block_until_ready(feats)
    timeit("phaseA: tile features (1 frame)",
           lambda: tile_features_raster(tiles_f.astype(jnp.float32)))

    kk = 64
    from tiler_tpu.kernels.knn_topk import knn_bucket_topk
    Tp = -(-T // 4096) * 4096
    dsp = jnp.pad(dsj, ((0, Tp - T), (0, 0)))
    dsT = dsp.astype(jnp.bfloat16).T
    d2p = jnp.sum(dsp * dsp, axis=1) + jnp.where(jnp.arange(Tp) < T, 0.0, 1e30)
    jax.block_until_ready((dsT, d2p))
    timeit("phaseA: knn_bucket_topk k=64 (1 frame)",
           lambda: knn_bucket_topk(feats, dsT, d2p, kk))
    idx, err = knn_bucket_topk(feats, dsT, d2p, kk)
    jax.block_until_ready(idx)

    G = RC._indicator_dcts(st.corpus_pal_pixels, S).astype(jnp.bfloat16)
    Q = RC._tile_quad(G, S)
    pal_yuv = rgb_to_yuv(jnp.asarray(st.palettes_rgb, jnp.float32))
    pal_initial = jnp.asarray(st.corpus_pal_initial.astype(np.int32))
    jax.block_until_ready((G, Q, pal_yuv))
    cand_pal = pal_initial[idx]
    ntri3 = 3 * (S * (S + 1) // 2)
    per_cell = kk * (64 * S * 2 + ntri3 * 4) + kk * ntri3 * 4
    cell_chunk = max(64, min(4096, int(3e8 / per_cell)))
    print(f"cell_chunk={cell_chunk}")
    timeit("phaseA: _epu_rank_all kp=64 (1 frame)",
           lambda: RC._epu_rank_all(feats, idx, cand_pal, G, pal_yuv, S,
                                    cell_chunk=cell_chunk, Q=Q))
    for kp in (16, 8):
        cp = pal_initial[idx[:, :kp]]
        timeit(f"phaseA: _epu_rank_all kp={kp} (1 frame)",
               lambda: RC._epu_rank_all(feats, idx, cp, G, pal_yuv, S,
                                        cell_chunk=cell_chunk, Q=Q))
    t, p, e = RC._epu_rank_all(feats, idx, cand_pal, G, pal_yuv, S,
                               cell_chunk=cell_chunk, Q=Q)
    pp_dev = jnp.asarray(st.corpus_pal_pixels)
    palettes_dev = jnp.asarray(st.palettes_rgb)
    timeit("phaseA: _exact_choice_err (1 frame)",
           lambda: RC._exact_choice_err(feats, t, p, pp_dev, palettes_dev))

    # full phase A for reference
    t0 = time.perf_counter()
    RC._knn_phase(st, settings)
    print(f"{'phaseA: full _knn_phase (16 frames)':52s} "
          f"{(time.perf_counter()-t0)*1e3:9.2f} ms")


if __name__ == "__main__":
    main()

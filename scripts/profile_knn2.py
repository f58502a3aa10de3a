#!/usr/bin/env python
"""Time each piece of the phase-A KNN/EPU pipeline at bench shapes."""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tiler_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(label, fn, reps=2):
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        jax.block_until_ready(r)
        dt = time.perf_counter() - t0
    print(f"  {label:40s} {dt*1e3:8.1f} ms", flush=True)
    return r


def main():
    from bench import synthetic_clip
    from tiler_tpu.config import EncoderSettings
    from tiler_tpu.pipeline.encoder import Encoder
    from tiler_tpu.pipeline import reconstruct as R
    from tiler_tpu.pipeline.motion import tile_features_raster

    F, H, W = 16, 720, 1280
    clip = synthetic_clip(F, H, W)
    settings = EncoderSettings(
        palette_count=1024, palette_size=16, motion_predict_radius=32,
        global_tiling_quality_based_tile_count=7.0, epu_knn_k=64,
    )
    enc = Encoder(settings, log=lambda *a: None)
    enc.load_frames(clip, fps=25.0)
    enc.predict_motion().reduce().prepare_palettes().dither()
    st = enc.state
    S = settings.palette_size

    rendered = t("render corpus", lambda: R._render_corpus_dev(
        jnp.asarray(st.palettes_rgb),
        jnp.asarray(st.corpus_pal_initial.astype(np.int32)),
        jnp.asarray(st.corpus_pal_pixels)))
    dsj = t("corpus features", lambda: tile_features_raster(
        rendered.astype(jnp.float32)))
    T = int(dsj.shape[0])
    print(f"  corpus T={T}")
    G = t("indicator DCTs G", lambda: R._indicator_dcts(
        st.corpus_pal_pixels, S).astype(jnp.bfloat16))
    Q = t("tile quad Q", lambda: R._tile_quad(G, S))

    # compacted cell set
    tm = st.tilemap
    need = ~(tm.predicted & (tm.psnr >= 48.13 - 1e-6))
    for kf in st.keyframes:
        need[kf.start_frame] = True
    sel = np.flatnonzero(need.reshape(-1))
    M = len(sel)
    print(f"  knn-needed cells M={M}")
    tiles_flat = st.tiles_canon.reshape(F * 14400 if False else -1, 8, 8, 3)
    NR = 8192
    rows = 1 << ((max(1, -(-M // NR))) - 1).bit_length()
    selp = np.concatenate([sel, np.full(rows * NR - M, sel[-1], np.int64)])
    tiles_dev = t("gather cells", lambda: R._gather_cells(
        tiles_flat, jnp.asarray(selp)))

    feats0 = t("feats (1 row)", lambda: tile_features_raster(
        tiles_dev[:NR].astype(jnp.float32)).reshape(NR, 192))

    from tiler_tpu.kernels.knn_topk import knn_bucket_topk, TB
    Tp = -(-T // 4096) * 4096
    dsp = jnp.pad(dsj, ((0, Tp - T), (0, 0)))
    dsT = dsp.astype(jnp.bfloat16).T
    d2p = jnp.sum(dsp * dsp, axis=1) + jnp.where(jnp.arange(Tp) < T, 0.0, 1e30)
    jax.block_until_ready((dsT, d2p))
    idx, err = t("pallas topk (1 row)", lambda: knn_bucket_topk(
        feats0, dsT, d2p, 64))

    pal_initial = jnp.asarray(st.corpus_pal_initial.astype(np.int32))
    pal_yuv = R.rgb_to_yuv(jnp.asarray(st.palettes_rgb, jnp.float32))
    ntri3 = 3 * (S * (S + 1) // 2)
    for pal_k in (64, 16):
        per_cell = 64 * (64 * S * 2 + ntri3 * 4) + pal_k * ntri3 * 4
        cell_chunk = max(64, min(4096, int(3e8 / per_cell)))
        cand_pal = pal_initial[idx[:, :pal_k]]
        t(f"epu rank (1 row, pal_k={pal_k}, cc={cell_chunk})",
          lambda: R._epu_rank_all(feats0, idx, cand_pal, G, pal_yuv, S,
                                  cell_chunk=cell_chunk, Q=Q))
    tt, pp_, ee = R._epu_rank_all(feats0, idx, pal_initial[idx[:, :16]],
                                  G, pal_yuv, S, cell_chunk=1024, Q=Q)
    t("exact choice err (1 row)", lambda: R._exact_choice_err(
        feats0, tt, pp_, jnp.asarray(st.corpus_pal_pixels),
        jnp.asarray(st.palettes_rgb)))
    print(f"  rows total = {rows} (x per-row costs above)")

    # full _knn_all_frames one-dispatch for comparison
    pbits = max(1, (settings.palette_count - 1).bit_length())
    pk = min(settings.epu_pal_k or 64, 64)
    out = t("knn_all_frames (all rows)", lambda: R._knn_all_frames(
        tiles_dev.reshape(rows, NR, 8, 8, 3), dsj, G, Q, pal_initial,
        pal_yuv, jnp.asarray(st.corpus_pal_pixels),
        jnp.asarray(st.palettes_rgb), kk=64, pal_k=pk, S=S,
        cell_chunk=max(64, min(4096, int(3e8 / (64*(64*S*2+ntri3*4)+pk*ntri3*4)))),
        epu=True, int16=False, pallas_topk=True))
    t("d2h packed", lambda: np.asarray(out))


if __name__ == "__main__":
    main()

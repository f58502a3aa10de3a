#!/usr/bin/env python
"""Sub-phase profile of reconstruct (phase A KNN + EPU, phase B scan) and
load at bench shapes. Run with the chip idle; pass --trace to also dump a
jax.profiler trace to /tmp/tiler_trace."""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tiler_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_PULL_LAT = [0.0]


def _force(r):
    """block_until_ready is NOT sufficient on the axon tunnel (unconsumed
    dispatches get elided and report ready in ~0.1ms); a 4-byte d2h of a
    reduction over every output leaf forces real execution."""
    leaves = [l for l in jax.tree_util.tree_leaves(r)
              if hasattr(l, "astype")]
    s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
    return float(s)


def timeit(label, fn, n=3):
    _force(fn())  # warm (compile)
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        _force(fn())
        best = min(best, time.perf_counter() - t0)
    best = max(0.0, best - _PULL_LAT[0])
    print(f"{label:52s} {best*1e3:9.1f} ms", flush=True)
    return best


def main():
    from bench import synthetic_clip
    from tiler_tpu.config import EncoderSettings
    from tiler_tpu.pipeline.encoder import Encoder
    from tiler_tpu.pipeline import reconstruct as RC
    from tiler_tpu.pipeline.motion import tile_features_raster, _motion_core
    from tiler_tpu.ops.color import rgb_to_yuv

    F, H, W = 16, 720, 1280
    clip = synthetic_clip(F, H, W)
    settings = EncoderSettings(
        palette_count=1024, palette_size=16, motion_predict_radius=32,
        global_tiling_quality_based_tile_count=7.0, epu_knn_k=64,
    )
    # measure the scalar-pull latency baseline (subtracted from timings)
    z = jnp.zeros((8, 8), jnp.float32)
    _force(z + 1)
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        _force(z + 1)
        lats.append(time.perf_counter() - t0)
    _PULL_LAT[0] = float(np.median(lats))
    print(f"pull latency baseline: {_PULL_LAT[0]*1e3:.1f} ms", flush=True)

    enc = Encoder(settings, log=lambda *a: None)
    enc.load_frames(clip, fps=25.0)
    enc.predict_motion()
    enc.reduce()
    enc.prepare_palettes()
    enc.dither()
    st = enc.state
    S = settings.palette_size
    T = len(st.corpus_pal_pixels)
    N = st.tilemap_size
    print(f"T={T} N={N} F={F}", flush=True)

    rendered = RC._render_corpus_dev(
        jnp.asarray(st.palettes_rgb),
        jnp.asarray(st.corpus_pal_initial.astype(np.int32)),
        jnp.asarray(st.corpus_pal_pixels),
    )
    dsj = tile_features_raster(rendered.astype(jnp.float32))
    jax.block_until_ready(dsj)
    Tpad = 256
    while Tpad < T:
        Tpad *= 2

    tiles0 = jnp.asarray(st.tiles_canon[jnp.asarray([0])]).reshape(1, N, 8, 8, 3)
    feats0 = tile_features_raster(tiles0.reshape(-1, 8, 8, 3).astype(jnp.float32))
    jax.block_until_ready(feats0)

    timeit("feats one frame", lambda: tile_features_raster(
        tiles0.reshape(-1, 8, 8, 3).astype(jnp.float32)))
    timeit(f"topk_oneshot k=64 one frame (Tpad={Tpad})",
           lambda: RC._topk_oneshot(feats0, dsj, 64, Tpad))
    timeit("topk_oneshot k=1 one frame",
           lambda: RC._topk_oneshot(feats0, dsj, 1, Tpad))

    G = RC._indicator_dcts(st.corpus_pal_pixels, S).astype(jnp.bfloat16)
    Q = RC._tile_quad(G, S)
    jax.block_until_ready((G, Q))
    pal_initial = jnp.asarray(st.corpus_pal_initial.astype(np.int32))
    pal_yuv = rgb_to_yuv(jnp.asarray(st.palettes_rgb, jnp.float32))
    pp_dev = jnp.asarray(st.corpus_pal_pixels)
    palettes_dev = jnp.asarray(st.palettes_rgb)

    idx, err = RC._topk_oneshot(feats0, dsj, 64, Tpad)
    cand_idx = jnp.sort(idx, axis=1)
    cand_pal = jnp.sort(pal_initial[idx], axis=1)
    jax.block_until_ready((cand_idx, cand_pal))
    kk = 64
    per_cell = kk * (64 * S * 2 + 3 * S * S * 4) + kk * 3 * S * S * 4
    cell_chunk = max(64, min(4096, int(3e8 / per_cell)))
    print(f"cell_chunk={cell_chunk}", flush=True)
    timeit("epu_rank_all one frame",
           lambda: RC._epu_rank_all(feats0, cand_idx, cand_pal, G, pal_yuv, S,
                                    cell_chunk=cell_chunk, Q=Q))
    t_, p_, _ = RC._epu_rank_all(feats0, cand_idx, cand_pal, G, pal_yuv, S,
                                 cell_chunk=cell_chunk, Q=Q)
    timeit("exact_choice_err one frame",
           lambda: RC._exact_choice_err(feats0, t_, p_, pp_dev, palettes_dev))

    tiles_all = jnp.asarray(st.tiles_canon).reshape(F, N, 8, 8, 3)
    timeit("knn_all_frames (16f, full phase A)",
           lambda: RC._knn_all_frames(
               tiles_all, dsj, G, Q, pal_initial, pal_yuv, pp_dev,
               palettes_dev, kk=kk, pal_k=kk, S=S, cell_chunk=cell_chunk,
               epu=True, int16=False), n=1)

    # phase B pieces
    fr0 = jnp.asarray(st.frames_rgb[0]).astype(jnp.float32)
    fr1 = jnp.asarray(st.frames_rgb[1]).astype(jnp.float32)
    timeit("motion_core one frame (radius 32)",
           lambda: _motion_core(fr1, fr0, 32, False, 192))

    kt, kp, ke, _fetch = RC._knn_phase(st, settings)
    th, tw = st.tilemap_h, st.tilemap_w
    tm = st.tilemap
    timeit("phase_b_scan (16 frames, 1 KF)",
           lambda: RC._phase_b_scan(
               jnp.asarray(st.frames_rgb), jnp.asarray(kt), jnp.asarray(kp),
               jnp.asarray(ke), jnp.asarray(tm.hmirror), jnp.asarray(tm.vmirror),
               jnp.asarray(np.eye(1, F, 0, bool)[0]), pp_dev, palettes_dev,
               32, th, tw, False, 192), n=1)

    if "--trace" in sys.argv:
        with jax.profiler.trace("/tmp/tiler_trace"):
            jax.block_until_ready(RC._knn_all_frames(
                tiles_all, dsj, G, Q, pal_initial, pal_yuv, pp_dev,
                palettes_dev, kk=kk, pal_k=kk, S=S, cell_chunk=cell_chunk,
                epu=True, int16=False))
        print("trace written to /tmp/tiler_trace", flush=True)




def topk_ab():
    """A/B the XLA approx_max_k path vs the Pallas bucket kernel at bench
    shapes (python scripts/profile_knn.py --ab)."""
    from tiler_tpu.kernels.knn_topk import knn_bucket_topk, TB, SB

    rng = np.random.default_rng(0)
    N, T = 14400, 115537
    feats = jnp.asarray(rng.normal(0, 500, (N, 192)).astype(np.float32))
    ds = jnp.asarray(rng.normal(0, 500, (T, 192)).astype(np.float32))
    jax.block_until_ready((feats, ds))

    z = jnp.zeros((8, 8), jnp.float32)
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        _force(z + 1)
        lats.append(time.perf_counter() - t0)
    _PULL_LAT[0] = float(np.median(lats))
    print(f"pull latency baseline: {_PULL_LAT[0]*1e3:.1f} ms", flush=True)

    from tiler_tpu.pipeline import reconstruct as RC
    Tpad = 256
    while Tpad < T:
        Tpad *= 2
    timeit("xla approx_max_k k=64", lambda: RC._topk_oneshot(feats, ds, 64, Tpad))
    Tp = -(-T // 4096) * 4096
    dsp = jnp.pad(ds, ((0, Tp - T), (0, 0)))
    dsT = dsp.astype(jnp.bfloat16).T
    d2p = jnp.sum(dsp * dsp, axis=1) + jnp.where(jnp.arange(Tp) < T, 0.0, 1e30)
    jax.block_until_ready((dsT, d2p))
    timeit("pallas bucket_topk k=64", lambda: knn_bucket_topk(feats, dsT, d2p, 64))
    timeit("pallas bucket_topk k=1", lambda: knn_bucket_topk(feats, dsT, d2p, 1))
    timeit("xla topk k=1", lambda: RC._topk_oneshot(feats, ds, 1, Tpad))


if __name__ == "__main__":
    if "--ab" in sys.argv:
        topk_ab()
    else:
        main()

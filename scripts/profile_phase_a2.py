#!/usr/bin/env python
"""Bisect phase A cost by toggling _knn_all_frames static args — each
variant is ONE dispatch over all 16 frames, so tunnel latency amortizes
and differences are real device compute."""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tiler_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from bench import synthetic_clip
    from tiler_tpu.config import EncoderSettings
    from tiler_tpu.pipeline.encoder import Encoder
    from tiler_tpu.pipeline import reconstruct as RC
    from tiler_tpu.pipeline.motion import tile_features_raster
    from tiler_tpu.ops.color import rgb_to_yuv

    F, H, W = 16, 720, 1280
    clip = synthetic_clip(F, H, W)
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
    tiles_dev = jnp.asarray(st.tiles_canon).reshape(F, -1, 8, 8, 3)
    jax.block_until_ready((dsj, G, Q, pal_yuv, tiles_dev))

    ntri3 = 3 * (S * (S + 1) // 2)

    def run(kk, pal_k, epu, pallas_topk, label):
        per_cell = kk * (64 * S * 2 + ntri3 * 4) + pal_k * ntri3 * 4
        cell_chunk = max(64, min(4096, int(3e8 / per_cell)))
        fn = lambda: RC._knn_all_frames(
            tiles_dev, dsj, G, Q, pal_initial, pal_yuv, pp_dev, palettes_dev,
            kk=kk, pal_k=pal_k, S=S, cell_chunk=cell_chunk, epu=epu,
            int16=False, pallas_topk=pallas_topk)
        np.asarray(jnp.ravel(fn())[:1])  # compile + true sync
        t0 = time.perf_counter()
        out = None
        for _ in range(3):
            out = fn()
        np.asarray(jnp.ravel(out)[:1])
        best = (time.perf_counter() - t0) / 3
        print(f"{label:56s} {best*1e3:9.1f} ms ({best/F*1e3:6.1f}/frame)",
              flush=True)

    run(1, 1, False, False, "knn k=1 (argmin), no EPU")
    run(64, 64, False, True, "pallas topk k=64, no EPU")
    run(64, 64, False, False, "xla approx topk k=64, no EPU")
    run(64, 1, True, True, "EPU kp=1")
    run(64, 16, True, True, "EPU kp=16")
    run(64, 64, True, True, "EPU kp=64 (bench default)")
    run(64, 64, True, False, "EPU kp=64, xla topk")


if __name__ == "__main__":
    main()

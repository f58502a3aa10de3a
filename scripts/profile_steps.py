#!/usr/bin/env python
"""Profile load / palettes / reindex / save step internals + h2d bandwidth."""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tiler_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tick(name, t0):
    print(f"{name:44s} {(time.perf_counter()-t0)*1e3:9.1f} ms", flush=True)
    return time.perf_counter()


def main():
    from bench import synthetic_clip
    from tiler_tpu.config import EncoderSettings
    from tiler_tpu.pipeline.encoder import Encoder

    F, H, W = 16, 720, 1280
    clip = synthetic_clip(F, H, W)
    settings = EncoderSettings(
        palette_count=1024, palette_size=16, motion_predict_radius=32,
        global_tiling_quality_based_tile_count=7.0, epu_knn_k=64,
    )

    # h2d / d2h bandwidth through the tunnel
    buf = np.zeros((64, 1024, 1024), np.uint8)  # 64MB
    t0 = time.perf_counter()
    d = jnp.asarray(buf)
    jax.block_until_ready(d)
    t0 = tick("h2d 64MB", t0)
    h = np.asarray(d)
    t0 = tick("d2h 64MB", t0)
    del h

    # warm a full encode once (compile cache), then re-time steps piecewise
    enc = Encoder(settings, log=lambda *a: None)
    t0 = time.perf_counter()
    enc.run_all(clip, fps=25.0, out_path="/tmp/prof.gtm")
    t0 = tick("warmup full encode", t0)

    os.environ["TILER_TPU_SYNC_STEPS"] = "1"
    enc = Encoder(settings, log=lambda *a: None)

    t0 = time.perf_counter()
    enc.load_frames(clip, fps=25.0)
    t0 = tick("load total", t0)
    enc.predict_motion()
    t0 = tick("predict_motion total", t0)
    enc.reduce()
    t0 = tick("reduce total", t0)

    # palettes piecewise
    from tiler_tpu.pipeline import palettes as PAL
    st = enc.state
    t0 = time.perf_counter()
    feats = PAL._corpus_features(st, settings)
    jax.block_until_ready(feats)
    t0 = tick("palettes: corpus features", t0)
    from tiler_tpu.cluster.kmeans import kmeans
    cents, assign1, _ = kmeans(
        feats, min(settings.palette_count * 8, len(feats)),
        weights=jnp.asarray(st.corpus_use.astype(np.float32)),
        iters=settings.kmeans_iters, seed=settings.seed, init="sample",
    )
    jax.block_until_ready(cents)
    t0 = tick("palettes: kmeans level1 (k=8192)", t0)
    _, assign2, _ = kmeans(cents, settings.palette_count,
                           iters=settings.kmeans_iters, seed=settings.seed + 1,
                           init="kpp")
    jax.block_until_ready(assign2)
    t0 = tick("palettes: kmeans level2 (k=1024)", t0)
    PAL.palettization(st, settings)
    t0 = tick("palettes: palettization (all)", t0)
    PAL.quantization(st, settings)
    t0 = tick("palettes: quantization", t0)
    PAL.optimize_palettes(st, settings)
    t0 = tick("palettes: optimize (2-opt)", t0)

    enc.dither()
    t0 = tick("dither total", t0)

    # reconstruct piecewise
    from tiler_tpu.pipeline import reconstruct as RC
    t0 = time.perf_counter()
    G = RC._indicator_dcts(st.corpus_pal_pixels, settings.palette_size).astype(jnp.bfloat16)
    jax.block_until_ready(G)
    t0 = tick(f"reconstruct: indicator_dcts T={len(st.corpus_pal_pixels)}", t0)
    kt, kp, ke, _fetch = RC._knn_phase(st, settings)
    t0 = tick("reconstruct: knn phase (all frames)", t0)
    enc.reconstruct()
    t0 = tick("reconstruct total (incl phase B)", t0)

    enc.reindex()
    t0 = tick("reindex total", t0)

    # save piecewise
    from tiler_tpu.bitstream import lzma_codec
    from tiler_tpu.pipeline import save as SAVE
    t0 = time.perf_counter()
    stats = SAVE.save(st, settings, "/tmp/prof.gtm")
    t0 = tick("save total", t0)
    # LZMA alone on the payload
    from tiler_tpu.bitstream.gtm import GTMWriter, FrameCommands
    tm = st.tilemap
    frames = [FrameCommands(tile_idx=tm.tile_idx[f], pal_idx=tm.pal_idx[f],
                            predicted=tm.predicted[f], pred_x=tm.pred_x[f],
                            pred_y=tm.pred_y[f], hmirror=tm.hmirror[f],
                            vmirror=tm.vmirror[f]) for f in range(F)]
    w = GTMWriter(st.tilemap_w, st.tilemap_h, st.fps, settings.palette_size,
                  settings_text=settings.to_ini())
    t0 = time.perf_counter()
    payload = w._prologue(st.corpus_pal_pixels, st.corpus_use, st.palettes_rgb,
                          palettes_valid=st.palettes_valid)
    for f in range(F):
        payload += w._frame_bytes(frames[f], st.corpus_pal_pixels,
                                  st.corpus_use, f == F - 1)
    t0 = tick(f"save: command assembly ({len(payload)} B)", t0)
    comp = lzma_codec.compress(payload, lc=8)
    t0 = tick(f"save: lzma ({len(payload)} -> {len(comp)} B)", t0)


if __name__ == "__main__":
    main()

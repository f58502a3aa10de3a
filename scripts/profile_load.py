#!/usr/bin/env python
"""Bisect the load step: h2d pieces vs _load_chunk compute vs dispatch."""
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
    from tiler_tpu.pipeline import load as L
    from tiler_tpu.models.state import EncodeState

    F, H, W = 16, 720, 1280
    clip = synthetic_clip(F, H, W)
    settings = EncoderSettings(
        palette_count=1024, palette_size=16, motion_predict_radius=32,
        global_tiling_quality_based_tile_count=7.0, epu_knn_k=64,
    )

    # warm compile
    st = EncodeState()
    L.load(st, clip, 25.0, settings)
    del st

    for trial in range(3):
        # h2d alone (all pieces, matching the load piece size)
        piece = 4
        t0 = time.perf_counter()
        pieces = [jnp.asarray(clip[i : i + piece]) for i in range(0, F, piece)]
        jax.block_until_ready(pieces)
        t_h2d = time.perf_counter() - t0

        # _load_chunk compute alone on device-resident input
        t0 = time.perf_counter()
        outs = [L._load_chunk(p) for p in pieces]
        jax.block_until_ready(outs)
        t_comp = time.perf_counter() - t0

        # full load (as the encoder runs it, non-deferred)
        st = EncodeState()
        t0 = time.perf_counter()
        L.load(st, clip, 25.0, settings)
        jax.block_until_ready((st.tiles_canon, st.frames_rgb))
        t_full = time.perf_counter() - t0
        print(f"trial {trial}: h2d {t_h2d*1e3:7.1f} ms | chunk-compute "
              f"{t_comp*1e3:7.1f} ms | full load {t_full*1e3:7.1f} ms",
              flush=True)

    # one-piece variant: single h2d + single chunk
    t0 = time.perf_counter()
    whole = jnp.asarray(clip)
    jax.block_until_ready(whole)
    t1 = time.perf_counter()
    out = L._load_chunk(whole)
    jax.block_until_ready(out)
    t2 = time.perf_counter()
    print(f"one-piece: h2d {(t1-t0)*1e3:7.1f} ms | compute {(t2-t1)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Profile reconstruct internals at bench shapes: phase-A corpus ranking,
EPU re-rank, exact re-evaluation, phase-B scan, and the d2h pulls."""
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
    from tiler_tpu.pipeline import reconstruct as R

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

    # warm + timed reconstruct (whole step)
    import copy
    for it in range(2):
        st2 = copy.copy(st)
        st2.tilemap = copy.deepcopy(st.tilemap)
        t0 = time.perf_counter()
        R.reconstruct(st2, settings)
        jax.block_until_ready([])
        dt = time.perf_counter() - t0
    print(f"reconstruct total: {dt*1e3:.0f} ms", flush=True)

    # knn phase alone
    for it in range(2):
        t0 = time.perf_counter()
        kt, kp, ke, _fetch = R._knn_phase(st, settings)
        dt = time.perf_counter() - t0
    print(f"  _knn_phase (incl pulls): {dt*1e3:.0f} ms", flush=True)

    # how many cells survive compaction?
    tm = st.tilemap
    perfect_db = 10.0 * np.log10(255.0 * 255.0 / 1.0)
    need = ~(tm.predicted & (tm.psnr >= 48.13 - 1e-6))
    print(f"  cells: {need.size}, knn-needed: {need.sum()} "
          f"({need.mean():.1%})", flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.zeros(1) + 1)
    print(f"  (device sync baseline {1e3*(time.perf_counter()-t0):.1f} ms)",
          flush=True)


if __name__ == "__main__":
    main()

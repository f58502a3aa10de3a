#!/usr/bin/env python
"""A/B the phase-B motion mode (research vs reuse) on the bench clip.

Runs the full encode once per mode with synced steps and reports
reconstruct time, PSNR-HVS, and stream size (for docs/PARITY.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["TILER_TPU_SYNC_STEPS"] = "1"

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tiler_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import synthetic_clip  # noqa: E402
from tiler_tpu.config import EncoderSettings  # noqa: E402
from tiler_tpu.pipeline.encoder import Encoder  # noqa: E402

F, H, W = 16, 720, 1280
clip = synthetic_clip(F, H, W)

for mode in sys.argv[1:] or ["research", "reuse"]:
    settings = EncoderSettings(
        palette_count=1024,
        palette_size=16,
        motion_predict_radius=32,
        global_tiling_quality_based_tile_count=7.0,
        epu_knn_k=64,
        phase_b_motion=mode,
    )
    # warmup (compiles), then one timed synced run
    for it in range(2):
        enc = Encoder(settings, log=lambda *a: None)
        t0 = time.time()
        enc.run_all(clip, fps=25.0, out_path=f"/tmp/ab_{mode}.gtm")
        wall = time.time() - t0
    print(
        json.dumps(
            {
                "mode": mode,
                "wall_s": round(wall, 2),
                "steps": {k: round(v, 3) for k, v in enc.timings.items()},
                "psnr_hvs_db": round(enc.state.total_psnr, 3),
                "bytes": enc.stats.total_bytes,
            }
        ),
        flush=True,
    )

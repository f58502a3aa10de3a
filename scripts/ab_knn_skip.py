#!/usr/bin/env python
"""Adequacy A/B for knn_skip_perfect_pred on DRIFT-HEAVY content
(VERDICT r03 weak #5).

The compaction skips phase-A KNN/EPU for cells whose phase-A motion
PSNR is at the "perfect" threshold, where the reference tests the
phase-B vs-RECONSTRUCTION error (tilingencoder.pas:1535-1547). The
proxy deviates exactly when the reconstruction drifts from the source —
long keyframes at low quality. This script encodes real content
(city_cif at native CIF) under drift-friendly settings with the skip on
vs off and reports PSNR / bytes / the skipped-cell fraction, so the
0.13 dB bench-clip number (docs/PERF.md) gets a worst-case companion.

Usage: [PB_FRAMES=48] [PB_Q=2.0] python scripts/ab_knn_skip.py
"""
import os
import sys

import jax

if os.environ.get("TILER_TPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TILER_TPU_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", "/tmp/tiler_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from bench import realistic_clip
    from tiler_tpu.config import EncoderSettings
    from tiler_tpu.pipeline.encoder import Encoder

    F = int(os.environ.get("PB_FRAMES", "48"))
    Q = float(os.environ.get("PB_Q", "2.0"))
    clip = realistic_clip(F, 288, 352)
    assert clip is not None, "reference demo stream unavailable"

    for skip in (True, False):
        s = EncoderSettings(
            palette_count=128, palette_size=16, motion_predict_radius=16,
            global_tiling_quality_based_tile_count=Q, epu_knn_k=64,
            knn_skip_perfect_pred=skip,
            # drift-friendly: one long keyframe (no shot cuts in city)
            shot_trans_max_seconds_per_kf=60.0,
        )
        enc = Encoder(s, log=lambda *a: None)
        enc.run_all(clip, fps=25.0, out_path="/tmp/ab_skip.gtm")
        st = enc.state
        tm = st.tilemap
        pred_frac = float(tm.predicted.mean())
        print(f"skip={int(skip)} q={Q} F={F}: "
              f"PSNR-HVS {st.total_psnr:.4f} dB  "
              f"bytes {enc.stats.total_bytes}  "
              f"kf_psnr {[round(float(x), 3) for x in st.kf_psnr]}  "
              f"predicted {pred_frac:.2%}", flush=True)


if __name__ == "__main__":
    main()

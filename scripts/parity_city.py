#!/usr/bin/env python
"""Quality/bitrate parity experiment against the reference demo streams.

The original city_cif.y4m source isn't in the snapshot, so the
reference-decoded frames (our GTMDecoder output of the committed
city_cif.gtm) stand in as the encode input. Reports our bitrate and
RGB-PSNR of our decode vs the input, next to the reference stream's
header bitrate (BASELINE.md: 319,585 B/s at 352x288).

Usage: python scripts/parity_city.py [frames] [quality] [palette_count]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import os

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/tiler_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # platform override BEFORE any tiler import: module-level jnp
    # constants (ops/metrics.py) init the backend at import, which hangs
    # forever on a dead axon tunnel — the knob exists to escape that
    if os.environ.get("TILER_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["TILER_TPU_PLATFORM"])

    from tiler_tpu.bitstream.gtm import GTMDecoder, parse_header
    from tiler_tpu.config import EncoderSettings
    from tiler_tpu.pipeline.encoder import Encoder

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    quality = float(sys.argv[2]) if len(sys.argv) > 2 else 7.0
    pal_count = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    demo = "/root/reference/docs/demo/city_cif.gtm"
    header = parse_header(open(demo, "rb").read(68))
    print(f"reference: {header['avg_bytes_per_sec']} B/s avg", flush=True)

    frames = np.stack(
        [f[..., :3] for f in GTMDecoder(demo).decode_frames()[:n_frames]]
    )
    fps = 25.0  # CIF demo rate

    settings = EncoderSettings(
        palette_count=pal_count,
        palette_size=16,
        motion_predict_radius=32,
        global_tiling_quality_based_tile_count=quality,
        epu_knn_k=16,
        kmeans_iters=16,
    )
    # settings overrides, e.g. PB_SETTINGS=epu_two_stage=1 (same syntax
    # as chip_playbook children) — for pre-promotion quality gates
    settings.apply_overrides(os.environ.get("PB_SETTINGS", ""))
    enc = Encoder(settings)
    t0 = time.time()
    enc.run_all(frames, fps=fps, out_path="/tmp/city_ours.gtm")
    wall = time.time() - t0

    ours = np.stack([f[..., :3] for f in GTMDecoder("/tmp/city_ours.gtm").decode_frames()])
    mse = np.mean((ours.astype(np.float64) - frames.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255 * 255 / max(mse, 1e-9))
    bps = enc.stats.total_bytes * fps / n_frames
    print(
        f"ours: {enc.stats.total_bytes} bytes = {bps:.0f} B/s "
        f"({bps/header['avg_bytes_per_sec']:.2f}x reference), "
        f"RGB-PSNR {psnr:.2f} dB vs input, PSNR-HVS {enc.state.total_psnr:.2f}, "
        f"encode {wall:.1f}s ({n_frames/wall:.2f} fps)",
        flush=True,
    )


if __name__ == "__main__":
    main()

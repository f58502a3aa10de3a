#!/usr/bin/env python
"""Matched-bitrate RD point (VERDICT r04 #6 / BASELINE "within 0.5 dB at
matched bitrate", readme.md:21).

Bisects GlobalTilingQualityBasedTileCount until OUR stream's header
bitrate lands within +-1%% of the reference demo stream's own header
bitrate, then reports the RGB-PSNR/PSNR-HVS of our reconstruction at
that operating point — for both demo contents.

Honest stand-in (the original y4m sources are stripped from the
snapshot, .MISSING_LARGE_BLOBS): the input is the reference's DECODED
frames, so PSNR is measured against the reference's own pictures. At
bitrate parity, "our encode reproduces the reference's pictures at X dB
while spending the same bits the reference spent to produce them" is
the strongest source-free parity statement available; a source-true
comparison needs the original clips.

Usage: python scripts/parity_matched.py [city football] [--tol 0.01]
Writes docs/PARITY_MATCHED.json and prints one JSON line per eval.
"""
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def encode_point(frames, fps, q, demo_settings):
    from tiler_tpu.bitstream.gtm import GTMDecoder
    from tiler_tpu.config import EncoderSettings
    from tiler_tpu.pipeline.encoder import Encoder

    settings = EncoderSettings(
        palette_count=demo_settings.get("palette_count", 128),
        palette_size=16,
        motion_predict_radius=32,
        global_tiling_quality_based_tile_count=q,
        epu_knn_k=64,
    )
    enc = Encoder(settings, log=lambda *a: None)
    t0 = time.time()
    enc.run_all(frames, fps=fps, out_path="/tmp/parity_m.gtm")
    wall = time.time() - t0
    ours = np.stack([f[..., :3]
                     for f in GTMDecoder("/tmp/parity_m.gtm").decode_frames()])
    mse = np.mean((ours.astype(np.float64) - frames.astype(np.float64)) ** 2)
    return {
        "q": round(q, 4),
        "bytes": enc.stats.total_bytes,
        "bps": enc.stats.total_bytes * fps / len(frames),
        "rgb_psnr_db": round(10 * np.log10(255 * 255 / max(mse, 1e-9)), 3),
        "psnr_hvs_db": round(enc.state.total_psnr, 3),
        "encode_s": round(wall, 1),
    }


# Repo-local so host restarts (which wipe /tmp) keep completed evals.
CACHE = os.path.join(ROOT, "docs", "PARITY_MATCHED_CACHE.json")


def match_content(content, tol):
    from tiler_tpu.bitstream.gtm import GTMDecoder, parse_header

    demo = f"/root/reference/docs/demo/{content}_cif.gtm"
    header = parse_header(open(demo, "rb").read(4096))
    ref_bps = header["avg_bytes_per_sec"]
    frames = np.stack([f[..., :3] for f in GTMDecoder(demo).decode_frames()])
    fps = 25.0
    print(f"# {content}: {len(frames)} frames, reference {ref_bps} B/s",
          flush=True)

    # Flap-resilient: each (content, q) eval persists immediately, so a
    # tunnel death mid-bisection costs only the eval in flight.
    try:
        with open(CACHE) as f:
            cache = json.load(f)
    except (OSError, json.JSONDecodeError):
        cache = {}
    evals = []

    def ev(q):
        key = f"{content}:{round(q, 4)}"
        if key in cache:
            row = cache[key]
        else:
            row = encode_point(frames, fps, q, {})
            row["x_reference"] = round(row["bps"] / ref_bps, 4)
            cache[key] = row
            with open(CACHE, "w") as f:
                json.dump(cache, f)
        evals.append(row)
        print(json.dumps(row), flush=True)
        return row

    # bracket: bitrate rises with quality. r4: q=7 -> 0.91x on city.
    lo_q, hi_q = 7.0, 14.0
    lo = ev(lo_q)
    hi = ev(hi_q)
    assert lo["bps"] < ref_bps, f"q={lo_q} already above reference bitrate"
    saturated = False
    for _ in range(6):
        if hi["bps"] >= ref_bps:
            break
        prev = hi
        lo_q, lo = hi_q, hi
        hi_q *= 1.5
        hi = ev(hi_q)
        # The tile budget saturates on short clips (the sqrt-scaling
        # count formula caps at the content's useful tile count): if a
        # 1.5x quality step buys <1.5% bitrate, the encoder cannot
        # reach the reference's rate on this content — report the
        # saturation point; "we cannot spend as many bits as the
        # reference did even at max quality" IS the parity statement.
        if hi["bps"] < prev["bps"] * 1.015:
            saturated = True
            break
    else:
        saturated = hi["bps"] < ref_bps
    best = min(evals, key=lambda r: abs(r["bps"] - ref_bps))
    if saturated:
        best = max(evals, key=lambda r: r["bps"])
        return {"content": content, "ref_bps": ref_bps, "matched": best,
                "saturated": True, "evals": evals}
    for _ in range(6):
        if abs(best["bps"] / ref_bps - 1.0) <= tol:
            break
        # Regula falsi on (q, bps): bitrate is near-linear in the quality
        # factor over a bracket, so interpolating converges in 2-3 evals
        # where pure bisection needs 5-6 (each eval is a ~3.5 min encode).
        frac = (ref_bps - lo["bps"]) / max(hi["bps"] - lo["bps"], 1e-9)
        mid_q = lo_q + (hi_q - lo_q) * min(max(frac, 0.1), 0.9)
        mid = ev(mid_q)
        if abs(mid["bps"] / ref_bps - 1.0) < abs(best["bps"] / ref_bps - 1.0):
            best = mid
        if mid["bps"] < ref_bps:
            lo_q, lo = mid_q, mid
        else:
            hi_q, hi = mid_q, mid
    return {
        "content": content,
        "ref_bps": ref_bps,
        "matched": best,
        "evals": evals,
    }


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tiler_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    contents = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "city", "football"]
    tol = 0.01
    if "--tol" in sys.argv:
        tol = float(sys.argv[sys.argv.index("--tol") + 1])
    path = os.path.join(ROOT, "docs", "PARITY_MATCHED.json")
    out = {}
    if os.path.exists(path):  # merge: per-content invocations accumulate
        try:
            with open(path) as f:
                out = json.load(f)
        except (OSError, json.JSONDecodeError):
            out = {}
    for c in contents:
        out[c] = match_content(c, tol)
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

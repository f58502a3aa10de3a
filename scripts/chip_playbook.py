#!/usr/bin/env python
"""One-shot measurement battery for a freshly-recovered TPU tunnel.

Runs, in order, each in a fresh child process (env knobs bind at
module import): a synced-step bench split at reference defaults, the
realistic-content (city) split, the IVF KNN / motion-dims / kmeans-iters
/ int8-G A/Bs, the equal-corpus quality point, the TK-dither block-width
sweep, and finally an auto-composed combo of every winning flag. Writes
everything to /tmp/chip_playbook.json and prints a summary. Budget
~45-75 min with a warm compile cache (11-12 full-encode children; city
runs ~2.5x slower than synthetic).

Usage: python scripts/chip_playbook.py [--quick]
  --quick: 8 frames instead of 16, skip the TK sweep
"""
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = "/tmp/chip_playbook.json"

CHILD = r"""
import json, os, sys, time
import jax
if os.environ.get("TILER_TPU_PLATFORM"):  # host-only smoke runs
    jax.config.update("jax_platforms", os.environ["TILER_TPU_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", "/tmp/tiler_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, %(root)r)
from bench import synthetic_clip, realistic_clip
from tiler_tpu.config import EncoderSettings
from tiler_tpu.pipeline.encoder import Encoder

F = int(os.environ.get("PB_FRAMES", "16"))
W = int(os.environ.get("PB_W", "1280"))
H = int(os.environ.get("PB_H", "720"))
resample_to = None
if os.environ.get("PB_CONTENT") == "city":
    clip = realistic_clip(F)  # source-res CIF; device upscales (r5)
    assert clip is not None, "reference demo stream unavailable"
    resample_to = (H, W)
else:
    clip = synthetic_clip(F, H, W)
settings = EncoderSettings(
    palette_count=int(os.environ.get("PB_PALETTES", "1024")),
    palette_size=16,
    motion_predict_radius=int(os.environ.get("PB_RADIUS", "32")),
    global_tiling_quality_based_tile_count=7.0,
    epu_knn_k=int(os.environ.get("PB_EPU_K", "64")),
)
settings.apply_overrides(os.environ.get("PB_SETTINGS", ""))
def run_one(enc):
    if resample_to is not None:
        enc.load_frames(clip, fps=25.0, resample_to=resample_to)
        enc.run_all(out_path="/tmp/pb.gtm")
    else:
        enc.run_all(clip, fps=25.0, out_path="/tmp/pb.gtm")
    return enc
# warm (compiles)
enc = run_one(Encoder(settings, log=lambda *a: None))
# steady, best of 2
best = None
for _ in range(2):
    t0 = time.time()
    enc = run_one(Encoder(settings, log=lambda *a: None))
    best = min(best or 1e9, time.time() - t0)
# synced split
os.environ["TILER_TPU_SYNC_STEPS"] = "1"
enc2 = run_one(Encoder(settings, log=lambda *a: None))
print("PBJSON " + json.dumps({
    "fps": round(F / best, 3),
    "wall_s": round(best, 2),
    "steps": {k: round(v, 3) for k, v in enc2.timings.items()},
    "psnr": round(enc.state.total_psnr, 3),
    "bytes": enc.stats.total_bytes,
    "corpus": (0 if enc.state.corpus_use is None
               else len(enc.state.corpus_use)),
}))
"""


def probe():
    """Cheap disposable-child tunnel probe — bench.py's implementation
    (same semantics, plus its TILER_BENCH_FAKE_PROBE / PROBE_TIMEOUT_S
    test hooks; keeping one copy stops the two from drifting)."""
    sys.path.insert(0, ROOT)
    from bench import _tunnel_alive

    # bench.py must keep jax OUT of module scope (guard comment at its
    # top): this import runs in the playbook's MAIN process, and a
    # module-level jax import there would wedge us on a dead tunnel —
    # the failure mode the disposable-child probe exists to avoid.
    assert "jax" not in sys.modules, (
        "bench.py imported jax at module scope; see its header invariant")
    return _tunnel_alive()


def run_child(name, env_extra, frames, timeout=3000):
    env = dict(os.environ, PB_FRAMES=str(frames), **env_extra)
    print(f"=== {name} ({env_extra or 'defaults'}) ===", flush=True)
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, "-c", CHILD % {"root": ROOT}],
            env=env, timeout=timeout, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        print("  TIMEOUT", flush=True)
        return {"error": "timeout"}
    for line in r.stdout.splitlines():
        if line.startswith("PBJSON "):
            d = json.loads(line[len("PBJSON "):])
            d["setup_s"] = round(time.time() - t0, 1)
            print("  " + json.dumps(d), flush=True)
            return d
    print(f"  FAILED rc={r.returncode}\n{r.stderr[-2000:]}", flush=True)
    return {"error": f"rc={r.returncode}"}


def main():
    quick = "--quick" in sys.argv
    fresh = "--fresh" in sys.argv
    frames = 8 if quick else 16

    # Resumable across tunnel flaps: reload prior results and skip any
    # child that already measured (has "fps"); persist after EVERY child;
    # probe between children and exit rc=2 the moment the tunnel dies so
    # the recovery watcher can re-enter its probe loop instead of letting
    # each remaining child eat its full 50-min timeout.
    results = {"frames": frames, "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
    if not fresh and os.path.exists(OUT):
        try:
            with open(OUT) as f:
                prev = json.load(f)
            if prev.get("frames") == frames:
                results.update({k: v for k, v in prev.items()
                                if k not in ("ts",)})
                done = [k for k, v in results.items()
                        if isinstance(v, dict) and "fps" in v]
                print(f"resuming {OUT}: {len(done)} children already "
                      f"measured ({', '.join(done)})", flush=True)
        except (json.JSONDecodeError, OSError):
            pass

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    def measure(key, name, env_extra, timeout=3000):
        if isinstance(results.get(key), dict) and "fps" in results[key]:
            return
        if not probe():
            print(f"tunnel died before child {key!r}; saving partial "
                  f"results and exiting 2", flush=True)
            save()
            sys.exit(2)
        results[key] = run_child(name, env_extra, frames, timeout=timeout)
        save()

    measure("baseline", "baseline", {})
    # realistic content runs ~2.5x slower than synthetic (BENCH_r3_g);
    # its synced split shows which stage pays for real-content corpora
    measure("city", "city upscaled", {"PB_CONTENT": "city"}, timeout=4800)
    measure("ivf", "ivf knn", {"PB_SETTINGS": "knn_backend=ivf"})
    measure("ivf_p16", "ivf knn P=16",
            {"PB_SETTINGS": "knn_backend=ivf,ivf_probes=16"})
    measure("motion_d48", "motion rank dims 48",
            {"PB_SETTINGS": "motion_rank_dims=48"})
    # r=6 -> 108 dims: under one 128-lane tile (192 occupies 1.5); the
    # d48 child measured slower from sub-128 padding, 108 pads only 16%
    measure("motion_d108", "motion rank dims 108",
            {"PB_SETTINGS": "motion_rank_dims=108"})
    # halve the EPU candidate list (the re-rank is the largest reconstruct
    # block); the combo filter's psnr/bytes gates decide if quality holds
    measure("epu_k32", "EPU knn k=32", {"PB_SETTINGS": "epu_knn_k=32"})
    measure("kmeans_i12", "kmeans 12 iters",
            {"PB_SETTINGS": "kmeans_iters=12"})
    # halo-blocked motion rank is the r4 default (bit-identical output;
    # removes the 0.4 GB/frame shift stack) — this child REVERTS it so
    # the unattended run proves the new default is not a regression
    measure("motion_halo_off", "motion halo off (old full stack)",
            {"TILER_TPU_MOTION_BM": "0"})
    measure("motion_bm16", "motion halo BM=16", {"TILER_TPU_MOTION_BM": "16"})
    # two-stage EPU (int8 low-freq G + int16 Q rank, exact top-M): Gi /8,
    # Qi /2 — 99.3% winner agreement at CIF/256 (scripts/ab_epu_lowrank)
    measure("epu_2s", "two-stage EPU", {"PB_SETTINGS": "epu_two_stage=1"})
    measure("epu_2s_k32", "two-stage EPU + k=32",
            {"PB_SETTINGS": "epu_two_stage=1,epu_knn_k=32"})
    # M=16 was the r4 battery's quality failure (-0.47 dB via the
    # tie-collapse toward popular tile ids); M=32 measured at-or-better
    # than the full bf16 rank per cell (agreement 99.83%, max exact-err
    # delta +0.000% at CIF/1024/k=64 — scripts/ab_epu_lowrank.py), so
    # only the fps question remains
    measure("epu_2s_m32", "two-stage EPU M=32",
            {"PB_SETTINGS": "epu_two_stage=1,epu_stage1_m=32"})
    # VERDICT r2 #1 asks for PSNR "within 0.3 dB of r02 at equal corpus
    # size": r02's 115,537-tile corpus was the tie-block overshoot bug
    # (2x the derived budget), so pin its corpus explicitly and show the
    # fixed rate control reaches at least r02's quality there
    measure("corpus_r02", "corpus pinned at r02's 115537",
            {"PB_SETTINGS": "global_tiling_tile_count=115537"})
    if not quick:
        for blk in (2048, 4096):
            measure(f"tk_blk_{blk}", f"tk blk {blk}",
                    {"TILER_TPU_TK_BLK": str(blk)})

    # combo: merge every candidate that beat baseline by >=2% fps without
    # hurting quality (psnr -0.15 dB) or size (+2%), and measure the set
    # together — the recovery probe runs this unattended, so the combined
    # number must not wait for a human to read the individual A/Bs
    base = results.get("baseline", {})
    combo_env = {}
    combo_keys = []
    candidates = {
        "ivf": {"PB_SETTINGS": "knn_backend=ivf"},
        "ivf_p16": {"PB_SETTINGS": "knn_backend=ivf,ivf_probes=16"},
        "motion_d48": {"PB_SETTINGS": "motion_rank_dims=48"},
        "motion_d108": {"PB_SETTINGS": "motion_rank_dims=108"},
        "epu_k32": {"PB_SETTINGS": "epu_knn_k=32"},
        "kmeans_i12": {"PB_SETTINGS": "kmeans_iters=12"},
        "epu_2s": {"PB_SETTINGS": "epu_two_stage=1"},
        "epu_2s_k32": {"PB_SETTINGS": "epu_two_stage=1,epu_knn_k=32"},
        "epu_2s_m32": {"PB_SETTINGS": "epu_two_stage=1,epu_stage1_m=32"},
        "motion_halo_off": {"TILER_TPU_MOTION_BM": "0"},
        "motion_bm16": {"TILER_TPU_MOTION_BM": "16"},
        "tk_blk_2048": {"TILER_TPU_TK_BLK": "2048"},
        "tk_blk_4096": {"TILER_TPU_TK_BLK": "4096"},
    }
    if base.get("fps"):
        passing = []
        for k, env in candidates.items():
            v = results.get(k, {})
            if not isinstance(v, dict) or "fps" not in v:
                continue
            if (v["fps"] >= base["fps"] * 1.02
                    and v.get("psnr", 0) >= base.get("psnr", 0) - 0.15
                    and v.get("bytes", 0) <= base.get("bytes", 1) * 1.02):
                passing.append((v["fps"], k, env))
        # fastest first, one variant per mutually-exclusive family
        def family(k):
            if k.startswith("ivf"):
                return "ivf"
            if k.startswith("tk_blk"):
                return "tk_blk"
            if k.startswith("motion_halo") or k.startswith("motion_bm"):
                return "motion_bm"
            if k.startswith("motion_d"):
                return "motion_dims"
            if k.startswith("epu_2s") or k.startswith("epu_k32"):
                return "epu_tables"  # all reshape the same EPU re-rank
            return k

        seen_fams = set()
        for _, k, env in sorted(passing, reverse=True):
            if family(k) in seen_fams:
                continue
            seen_fams.add(family(k))
            for ek, ev in env.items():
                if ek == "PB_SETTINGS" and combo_env.get(ek):
                    combo_env[ek] = combo_env[ek] + "," + ev
                else:
                    combo_env[ek] = ev
            combo_keys.append(k)
    if len(combo_keys) > 1:
        if not (isinstance(results.get("combo"), dict)
                and "fps" in results["combo"]):
            # only (re)label the flag union when the combo child will
            # actually run: a resumed file keeps its measured combo, and
            # overwriting combo_flags would attribute those numbers to a
            # flag set that was never measured together
            results["combo_flags"] = combo_keys
        measure("combo", f"combo {'+'.join(combo_keys)}", combo_env)

    save()
    print(f"\nwrote {OUT}")
    base = results.get("baseline", {})
    for k, v in results.items():
        if isinstance(v, dict) and "fps" in v:
            delta = ""
            if k != "baseline" and base.get("fps"):
                delta = f"  ({v['fps']/base['fps'] - 1:+.1%} fps vs baseline)"
            print(f"{k:14s} fps={v['fps']:<7} psnr={v.get('psnr')} "
                  f"bytes={v.get('bytes')}{delta}")


if __name__ == "__main__":
    main()

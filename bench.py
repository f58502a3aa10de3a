#!/usr/bin/env python
"""Driver benchmark: full-pipeline GTM encode throughput on one TPU chip.

Prints JSON lines {"metric", "value", "unit", "vs_baseline", ...}; the
LAST line is the measurement of record. Earlier lines are outage
armor: a stale/placeholder line goes out immediately (before any JAX
work, which can hang for hours when the axon tunnel is down) so the
driver always has something to parse, and a successful live run then
supersedes it. Consumers must parse the last JSON line, not the first.
Baseline target: 30 fps at 720p on one v5e chip (BASELINE.md).

Settings are the REFERENCE DEFAULTS (tilingencoder.pas:3817-3845):
PaletteCount 1024, PaletteSize 16, MotionPredictRadius 32,
QualityBasedTileCount 7.0, Thomas Knoll dithering, EPU on (cEpuKnnK=64).

The first pass warms the persistent compilation cache (the axon remote
compile is slow and its latency is not an encoder property); the
reported number is the steady-state wall-clock fps, best of an ADAPTIVE
number of full encodes (3-6; more while the run spread exceeds 1.25x —
the tunnel's window variance reached 2x in the r4 battery), including
host bitstream assembly and LZMA. A final step-synced run records the
per-step steady breakdown (async dispatch otherwise credits
device-resident outputs to the consuming step).

Env knobs: TILER_BENCH_W/H (default 1280x720), TILER_BENCH_FRAMES (16),
TILER_BENCH_PALETTES (1024), TILER_BENCH_EPU_K (64).
"""
import json
import os
import sys
import time

import numpy as np

# INVARIANT: no module-level `import jax` (or any tiler_tpu import) in
# this file, ever. scripts/chip_playbook.py imports this module into its
# PARENT process to share _tunnel_alive; a module-level jax import would
# wedge that parent on a dead tunnel — the exact failure mode the
# disposable-child probe exists to avoid. All heavy imports live inside
# main(), which only runs in the TILER_BENCH_CHILD subprocess.


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synthetic_clip(F, H, W, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    base = np.stack(
        [(yy * 255 // H), (xx * 255 // W), ((yy + xx) * 255 // (H + W))], -1
    ).astype(np.uint8)
    noise = rng.randint(0, 30, (H, W, 3)).astype(np.uint8)
    frames = []
    for f in range(F):
        img = np.roll(base + noise, (3 * f, 5 * f), (0, 1))
        # max(1, ...): keep tiny host-only smoke shapes (PB_W/PB_H below
        # 128) from a zero modulo; the moving square just pins at 0,0
        x0 = (40 + 11 * f) % max(1, W - 64)
        y0 = (30 + 7 * f) % max(1, H - 64)
        img[y0 : y0 + 64, x0 : x0 + 64] = [220, 40, 40]
        frames.append(img)
    return np.stack(frames)


DEMO_GTM = "/root/reference/docs/demo/city_cif.gtm"
DEMO_GTM_MKF = "/root/reference/docs/demo/football_cif.gtm"


def synthetic_clip_420(F, H, W, seed=0):
    """The synthetic clip as a 4:2:0 PlanarClip — the shape every real
    video ingest has (y4m / yuv420p sources ship raw planes; the device
    does chroma upsample + YUV->RGB, ops/resample.py). h2d volume drops
    44 -> 22 MB/16f. Reported as a SEPARATE bench point: the chroma
    subsample changes content, so the headline RGB point stays
    comparable across rounds."""
    rgb = synthetic_clip(F, H, W, seed).astype(np.float32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = (b - y) / 2.03211 + 128.0
    v = (r - y) / 1.13983 + 128.0
    yq = np.clip(np.round(y), 0, 255).astype(np.uint8)
    # box-average 2x2 chroma subsample
    uq = np.clip(np.round(
        u.reshape(F, H // 2, 2, W // 2, 2).mean((2, 4))), 0, 255
    ).astype(np.uint8)
    vq = np.clip(np.round(
        v.reshape(F, H // 2, 2, W // 2, 2).mean((2, 4))), 0, 255
    ).astype(np.uint8)
    from tiler_tpu.io.video import PlanarClip
    return PlanarClip(yq, uq, vq, 25.0)


def realistic_clip(F):
    """Real-content bench input: the reference's own city_cif demo
    decoded at SOURCE resolution. VERDICT r02 weak #8: the synthetic
    clip's exact np.roll motion makes half the field zero-error ties;
    this point keeps fps/PSNR trends honest on real content. The encoder
    upscales to the bench resolution ON DEVICE (settings.device_resample
    / load_frames(resample_to=...)): the TPU-first ingest ships ~4.9 MB
    of CIF pixels per 16 frames instead of 44 MB of pre-upscaled 720p —
    VERDICT r04 #2 (through r4 this function upscaled bilinearly on the
    host, which made the realistic point mostly a tunnel-h2d benchmark).
    Returns None when the reference demos are unavailable."""
    if not os.path.exists(DEMO_GTM):
        return None
    from tiler_tpu.bitstream.gtm import GTMDecoder
    dec = GTMDecoder(DEMO_GTM)
    frames = []
    for i, fr in enumerate(dec.decode_frames()):
        if i >= F:
            break
        frames.append(fr[..., :3])
    return np.stack(frames)  # [F, 288, 352, 3] uint8


def multikf_clip(F):
    """Multi-keyframe realistic bench input (VERDICT r04 #4): the
    reference's own football_cif demo (3 keyframes in 260 frames) decoded
    at source resolution, with the REFERENCE's keyframe starts passed as
    manual keyframes so the bench point always measures the multi-KF
    machinery (KF-parallel phase B, per-KF streamed save) regardless of
    where the correlation rule would cut. Returns (frames, kf_list) or
    (None, None)."""
    if not os.path.exists(DEMO_GTM_MKF):
        return None, None
    from tiler_tpu.bitstream.gtm import GTMDecoder, GTMReader
    g = GTMReader.read(DEMO_GTM_MKF)
    kf_starts = [0] + [i + 1 for i, e in enumerate(g.keyframe_end)
                       if e and i + 1 < F]
    dec = GTMDecoder(DEMO_GTM_MKF)
    frames = []
    for i, fr in enumerate(dec.decode_frames()):
        if i >= F:
            break
        frames.append(fr[..., :3])
    return np.stack(frames), sorted(set(kf_starts))


def main():
    # env knobs parse BEFORE the heavy imports: a malformed knob must
    # fail fast even when the tunnel is wedged (importing the encoder
    # can hang on backend init — tests rely on the <1s crash)
    W = int(os.environ.get("TILER_BENCH_W", 1280))
    H = int(os.environ.get("TILER_BENCH_H", 720))
    F = int(os.environ.get("TILER_BENCH_FRAMES", 16))
    P = int(os.environ.get("TILER_BENCH_PALETTES", 1024))
    EK = int(os.environ.get("TILER_BENCH_EPU_K", 64))

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/tiler_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tiler_tpu.config import EncoderSettings
    from tiler_tpu.pipeline.encoder import Encoder
    from tiler_tpu.bitstream.gtm import GTMDecoder

    log(f"bench: {W}x{H} x{F} frames on {jax.devices()} | P={P} EPU_K={EK}")
    clip = synthetic_clip(F, H, W)
    settings = EncoderSettings(
        palette_count=P,
        palette_size=16,
        motion_predict_radius=32,
        global_tiling_quality_based_tile_count=7.0,
        epu_knn_k=EK,
    )

    out = "/tmp/tiler_bench.gtm"
    # warmup (compiles)
    t0 = time.time()
    enc = Encoder(settings, log=log)
    enc.run_all(clip, fps=25.0, out_path=out)
    log(f"warmup encode: {time.time()-t0:.1f}s")

    # timed steady-state, adaptive best-of-N: the tunnel's run-to-run
    # variance is ±20% in steady windows but 2x+ in degraded ones
    # (r4 battery: identical code measured 2.6-5.4 fps across windows).
    # 3 runs minimum; keep going (up to 6) while the spread stays wide —
    # extra runs cost ~1 min each and materially de-noise the captured
    # number toward the true steady-state.
    walls = []
    for i in range(6):
        t0 = time.time()
        enc = Encoder(settings, log=lambda *a: None)
        enc.run_all(clip, fps=25.0, out_path=out)
        walls.append(time.time() - t0)
        if i >= 2 and max(walls) / min(walls) < 1.25:
            break
    wall = min(walls)
    fps = F / wall
    log(f"steady walls: {['%.2f' % w for w in walls]}")

    # step-synced steady run for the per-step breakdown
    os.environ["TILER_TPU_SYNC_STEPS"] = "1"
    enc2 = Encoder(settings, log=lambda *a: None)
    enc2.run_all(clip, fps=25.0, out_path=out)
    del os.environ["TILER_TPU_SYNC_STEPS"]
    steps = {k: round(v, 3) for k, v in enc2.timings.items()}
    log("steady steps (synced): " + json.dumps(steps))
    # window-quality provenance: the load step is ~pure h2d of the clip
    # bytes, so its synced time doubles as a tunnel bandwidth gauge
    # (driver windows measured 13-130 MB/s; fps tracks it). null when the
    # synced run somehow lacks a load timing — 0.0 would read as measured.
    load_s = steps.get("load")
    h2d_mbps = (round(F * H * W * 3 / 1e6 / max(load_s, 1e-3), 1)
                if load_s else None)

    # sanity: stream must decode to the right frame count
    frames = GTMDecoder(out).decode_frames()
    assert len(frames) == F, "bench stream failed to decode"
    log(
        f"steady encode: {wall:.1f}s = {fps:.3f} fps | "
        f"PSNR-HVS {enc.state.total_psnr:.2f} dB | {enc.stats.total_bytes} bytes"
    )

    result = {
        "metric": f"encode_fps_{H}p",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 5),
        "settings": {"palette_count": P, "epu_knn_k": EK,
                     "frames": F, "w": W, "h": H},
        "steady_steps_s": steps,
        "tunnel_h2d_mbps": h2d_mbps,
        "psnr_hvs_db": round(enc.state.total_psnr, 3),
        "bytes": enc.stats.total_bytes,
    }
    # explicit untunneled-hardware projection (VERDICT r04 #7): replace
    # the measured load step (h2d through the ~13-130 MB/s relay) with
    # the same bytes at PCIe-class 10 GB/s; other steps keep their
    # measured values (which still INCLUDE ~30 ms/step of tunnel pull
    # latency, so this projection stays conservative)
    if load_s is not None:
        proj_wall = wall - load_s + F * H * W * 3 / 1e10
        result["untunneled_projection_fps"] = round(F / proj_wall, 3)

    # synthetic 4:2:0 ingest point: same content chroma-subsampled and
    # shipped as raw planes (the shape every real video source has) —
    # measures the device-ingest path at bench resolution; the RGB
    # headline above stays content-comparable across rounds
    clip420 = synthetic_clip_420(F, H, W)
    enc420 = Encoder(settings, log=lambda *a: None)
    enc420.load_frames(clip420, fps=25.0)
    enc420.run_all(out_path=out)  # warmup
    walls420 = []
    for i in range(4):
        t0 = time.time()
        enc420 = Encoder(settings, log=lambda *a: None)
        enc420.load_frames(clip420, fps=25.0)
        enc420.run_all(out_path=out)
        walls420.append(time.time() - t0)
        if i >= 1 and max(walls420) / min(walls420) < 1.25:
            break
    log(f"synthetic 4:2:0 planar ingest: {min(walls420):.1f}s = "
        f"{F/min(walls420):.3f} fps")
    result["synthetic_420"] = {
        "metric": f"encode_fps_{H}p_planar420",
        "fps": round(F / min(walls420), 4),
        "vs_baseline": round(F / min(walls420) / 30.0, 5),
        "psnr_hvs_db": round(enc420.state.total_psnr, 3),
        "bytes": enc420.stats.total_bytes,
    }

    # first-class second point: real content (city_cif demo upscaled to
    # bench res). VERDICT r03 #7: always emitted so round-over-round
    # trends don't depend on the motion-flattering synthetic clip.
    result["realistic"] = None
    real = realistic_clip(F)
    if real is not None:
        def run_real(enc):
            # device-resample ingest: source-res pixels over h2d, Lanczos
            # upscale to bench resolution on chip
            enc.load_frames(real, fps=25.0, resample_to=(H, W))
            enc.run_all(out_path=out)
            return enc

        enc3 = run_real(Encoder(settings, log=lambda *a: None))  # warmup
        # same adaptive de-noising as the synthetic loop (this is the
        # number verdicts gate on; realistic runs ~1.4x longer so the
        # minimum is 2 runs instead of 3)
        rwalls = []
        for i in range(5):
            t0 = time.time()
            enc3 = run_real(Encoder(settings, log=lambda *a: None))
            rwalls.append(time.time() - t0)
            if i >= 1 and max(rwalls) / min(rwalls) < 1.25:
                break
        best = min(rwalls)
        log(
            f"realistic (city upscaled): {best:.1f}s = {F/best:.3f} fps | "
            f"PSNR-HVS {enc3.state.total_psnr:.2f} dB | "
            f"{enc3.stats.total_bytes} bytes"
        )
        # synced split for the realistic point too: the city-vs-synthetic
        # fps gap was hard to attribute all of r4 without one
        os.environ["TILER_TPU_SYNC_STEPS"] = "1"
        enc4 = run_real(Encoder(settings, log=lambda *a: None))
        del os.environ["TILER_TPU_SYNC_STEPS"]
        rsteps = {k: round(v, 3) for k, v in enc4.timings.items()}
        result["realistic"] = {
            "metric": f"encode_fps_{H}p_realistic",
            "content": "city_cif upscaled",
            "fps": round(F / best, 4),
            "vs_baseline": round(F / best / 30.0, 5),
            "psnr_hvs_db": round(enc3.state.total_psnr, 3),
            "bytes": enc3.stats.total_bytes,
            "steady_steps_s": rsteps,
        }

    # multi-keyframe realistic point (VERDICT r04 #4): football demo at
    # the reference's own 3-KF segmentation, device-upscaled. Measures
    # KF-parallel phase B + the streamed per-KF save on >1 keyframe.
    result["realistic_multikf"] = None
    MF = int(os.environ.get("TILER_BENCH_MKF_FRAMES", 80))
    mkf, kfs = multikf_clip(MF)
    if mkf is not None and len(kfs) >= 2:
        def run_mkf(enc):
            enc.load_frames(mkf, fps=25.0, manual_keyframes=kfs,
                            resample_to=(H, W))
            enc.run_all(out_path=out)
            return enc

        enc5 = run_mkf(Encoder(settings, log=lambda *a: None))  # warmup
        mwalls = []
        for i in range(3):
            t0 = time.time()
            enc5 = run_mkf(Encoder(settings, log=lambda *a: None))
            mwalls.append(time.time() - t0)
            if i >= 1 and max(mwalls) / min(mwalls) < 1.25:
                break
        mbest = min(mwalls)
        os.environ["TILER_TPU_SYNC_STEPS"] = "1"
        enc6 = run_mkf(Encoder(settings, log=lambda *a: None))
        del os.environ["TILER_TPU_SYNC_STEPS"]
        log(f"realistic multi-KF (football x{MF}, {len(kfs)} KFs): "
            f"{mbest:.1f}s = {MF/mbest:.3f} fps | "
            f"PSNR-HVS {enc5.state.total_psnr:.2f} dB | "
            f"{enc5.stats.total_bytes} bytes")
        result["realistic_multikf"] = {
            "metric": f"encode_fps_{H}p_realistic_multikf",
            "content": f"football_cif x{MF} (device-upscaled)",
            "frames": MF,
            "n_kf": len(kfs),
            "fps": round(MF / mbest, 4),
            "vs_baseline": round(MF / mbest / 30.0, 5),
            "psnr_hvs_db": round(enc5.state.total_psnr, 3),
            "bytes": enc5.stats.total_bytes,
            "steady_steps_s": {k: round(v, 3)
                               for k, v in enc6.timings.items()},
        }

    print(json.dumps(result))


_LAST_GOOD = os.environ.get(
    "TILER_BENCH_LAST_GOOD",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "BENCH_LAST_GOOD.json"),
)


def _tunnel_alive() -> bool:
    """Cheap child-process probe: one tiny device matmul. The axon tunnel
    wedges by futex-waiting forever inside backend init, so the probe
    must be a separate process we can abandon. TILER_BENCH_FAKE_PROBE
    (dead|alive) overrides for supervisor tests."""
    import subprocess

    fake = os.environ.get("TILER_BENCH_FAKE_PROBE")
    if fake:
        return fake == "alive"
    timeout_s = int(os.environ.get("TILER_BENCH_PROBE_TIMEOUT_S", 150))
    code = ("import jax,jax.numpy as jnp;"
            "x=jnp.ones((128,128));print(float((x@x).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except Exception:
        return False


def _supervised():
    """Run the bench in a child process with stall detection.

    The axon tunnel occasionally drops a client mid-operation (the
    remote restarts); the client then futex-waits forever. A wedged
    child shows no new stderr output AND ~no CPU for minutes — kill and
    retry (fresh clients reconnect fine once the remote is back).

    Outage discipline (round-3 postmortem, BENCH_r03 rc=124/parsed=null):
    an external timeout on the whole bench run can SIGKILL us at any
    moment, so a parseable JSON line must hit stdout BEFORE any long
    wait. On the FIRST failed probe we immediately emit the last good
    in-round measurement marked stale, then keep probing in whatever
    time remains; if the tunnel recovers, the real measurement is
    printed as a later line and supersedes the stale one (the driver
    parses the last JSON line)."""
    import signal
    import subprocess
    import threading

    retry_sleep = int(os.environ.get("TILER_BENCH_PROBE_RETRY_S", 60))
    outage_budget = int(os.environ.get("TILER_BENCH_OUTAGE_BUDGET_S", 3000))
    stale_emitted = False
    if not _tunnel_alive():
        log("bench: first tunnel probe failed; emitting stale fallback "
            "NOW, then waiting for recovery")
        _emit_stale("tunnel down at bench start (will overwrite with a "
                    "real measurement if it recovers in time)")
        stale_emitted = True
        deadline = time.time() + outage_budget
        while True:
            if time.time() > deadline:
                log("bench: tunnel never recovered within budget; "
                    "stale line stands")
                return 0
            time.sleep(retry_sleep)
            if _tunnel_alive():
                log("bench: tunnel recovered; running the real bench")
                break
            log("bench: tunnel probe failed; waiting for recovery")

    # An outage can ALSO start mid-run (probe passed, child wedges, the
    # stall loop + retries below can spend hours) — emit the stale line
    # up front unconditionally so an external SIGKILL at any later point
    # still leaves a parseable JSON on stdout; a successful child prints
    # the real line after it, and the driver parses the LAST line.
    if not stale_emitted:
        _emit_stale("placeholder before live attempts (superseded by the "
                    "real measurement below if one completes)")
        stale_emitted = True

    for attempt in range(3):
        env = dict(os.environ, TILER_BENCH_CHILD="1")
        p = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            stdout=subprocess.PIPE, stderr=sys.stderr, env=env,
        )
        # drain stdout concurrently: a child writing more than the ~64KB
        # pipe buffer would otherwise block on write with no CPU activity
        # and be misdiagnosed as wedged
        chunks = []
        drain = threading.Thread(
            target=lambda: chunks.append(p.stdout.read()), daemon=True
        )
        drain.start()
        t0 = time.time()
        base_cpu = 0
        base_t = time.time()
        wedged = False
        while p.poll() is None:
            time.sleep(15)
            if time.time() - t0 > 2400:
                wedged = True
                break
            try:
                with open(f"/proc/{p.pid}/stat") as f:
                    parts = f.read().split()
                cpu = int(parts[13]) + int(parts[14])
            except OSError:
                break
            # meaningful progress = >=0.5s of CPU since the baseline; a
            # bare "cpu changed" test is defeated by ~1-jiffy keepalive
            # ticks from a futex-waiting tunnel client (observed: a child
            # wedged 17 min while its CPU crept 3 ticks)
            if cpu - base_cpu >= 50:
                base_cpu = cpu
                base_t = time.time()
            elif time.time() - base_t > 240:
                wedged = True
                break
        if wedged:
            log(f"bench child stalled (attempt {attempt + 1}); restarting")
            try:
                p.send_signal(signal.SIGKILL)
                p.wait(timeout=30)
            except Exception:
                pass
            time.sleep(10)
            continue
        drain.join(timeout=30)
        out = (chunks[0] if chunks else b"").decode()
        if p.returncode == 0 and out.strip():
            sys.stdout.write(out)
            sys.stdout.flush()
            try:  # keep the last good measurement for outage fallback
                json.loads(out.strip().splitlines()[-1])
                with open(_LAST_GOOD, "w") as f:
                    f.write(out.strip().splitlines()[-1] + "\n")
            except Exception:
                pass
            return 0
        log(f"bench child exit rc={p.returncode}; retrying")
        time.sleep(10)
    # children exhausted. A healthy tunnel means a code regression, not
    # an outage: still print a stale line (the driver must always get a
    # parseable JSON) but exit nonzero so the failure is visible.
    # (re-emit with the accurate reason — the driver parses the LAST
    # line, so this supersedes the placeholder emitted up front)
    if _tunnel_alive():
        log("bench: children failed but the tunnel probe passes — "
            "code regression, emitting stale line with rc=1")
        _emit_stale("bench child failed with a HEALTHY tunnel — "
                    "code regression, investigate")
        return 1
    _emit_stale("bench child kept stalling/failing (tunnel down)")
    return 0


def _emit_stale(reason: str) -> int:
    """Outage fallback: print the most recent good in-round measurement,
    explicitly marked stale. ALWAYS prints a parseable JSON line — if no
    last-good file exists, a zero-value record with the reason."""
    try:
        with open(_LAST_GOOD) as f:
            result = json.loads(f.read())
    except Exception:
        H = int(os.environ.get("TILER_BENCH_H", 720))
        result = {"metric": f"encode_fps_{H}p", "value": 0.0,
                  "unit": "frames/s", "vs_baseline": 0.0,
                  "error": "no last-good measurement available"}
    result["stale"] = True
    result["stale_reason"] = reason
    log(f"bench: emitting last good measurement (STALE: {reason})")
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    if os.environ.get("TILER_BENCH_CHILD"):
        main()
    else:
        raise SystemExit(_supervised())

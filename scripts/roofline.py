#!/usr/bin/env python
"""Roofline audit of the device hot path (VERDICT r04 #1).

For each hot block: measure wall time on the real chip (timings end in a
d2h value read — axon's lazy queue rule), compute the block's analytic
HBM byte volume and MXU FLOP count, and report achieved GB/s and
TFLOP/s against v5e peaks. Where a block is far from both roofs, the
gap is dispatch overhead, VPU-bound elementwise work, or layout copies —
the table says which lever to pull.

v5e peaks: 197 TFLOP/s bf16 (MXU), ~819 GB/s HBM. VPU is ~5 TOP/s-ish
f32 elementwise (8x128 lanes x 4 ALUs x ~0.94 GHz); blocks dominated by
per-element key packing/min reductions bind on it, not HBM.

Shapes default to the bench steady state (720p x16, corpus 33k, kk=64,
pal_k=16, ~39%% phase-A cell compaction -> ~5600 cells/frame).
"""
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tiler_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12
PEAK_HBM = 819e9
REPS = int(os.environ.get("RL_REPS", 5))

rows = []


def _pull(out):
    return float(jax.tree_util.tree_reduce(
        lambda a, b: a + b.astype(jnp.float32).sum().astype(jnp.float32),
        out, jnp.float32(0)))


_FLOOR = [0.0]


def _measure_floor():
    """Tunnel round-trip floor: a value pull costs ~25-40 ms through the
    relay regardless of work. Every timing below dispatches REPS programs
    before ONE pull and subtracts this floor, so the per-dispatch numbers
    are device time, not tunnel latency."""
    x = jnp.ones((8, 128), jnp.float32)
    _pull(x * 1.0)
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        _pull(x * 1.0)
        samples.append(time.perf_counter() - t0)
    _FLOOR[0] = min(samples)
    print(f"pull floor: {_FLOOR[0]*1e3:.1f} ms")


def bench(name, fn, *args, bytes_moved=0, flops=0, note=""):
    _pull(fn(*args))  # compile + flush
    t0 = time.perf_counter()
    out = None
    for _ in range(REPS):
        out = fn(*args)  # dispatches queue back-to-back on the device
    _pull(out)
    dt = max(1e-9, (time.perf_counter() - t0 - _FLOOR[0]) / REPS)
    gbs = bytes_moved / dt / 1e9 if bytes_moved else 0.0
    tfs = flops / dt / 1e12 if flops else 0.0
    row = dict(block=name, ms=round(dt * 1e3, 2),
               gb=round(bytes_moved / 1e9, 3), gbps=round(gbs, 1),
               hbm_pct=round(100 * gbs * 1e9 / PEAK_HBM, 1),
               tflops=round(tfs, 2),
               mxu_pct=round(100 * tfs * 1e12 / PEAK_BF16, 1), note=note)
    rows.append(row)
    print(f"{name:34s} {dt*1e3:8.2f} ms  {gbs:7.1f} GB/s ({row['hbm_pct']:5.1f}%)"
          f"  {tfs:7.2f} TF/s ({row['mxu_pct']:5.1f}%)  {note}")
    return dt


def main():
    rng = np.random.RandomState(0)
    dev = jax.devices()[0]
    print(f"device: {dev}, reps={REPS}")

    H, W = 720, 1280
    K = 192
    T = int(os.environ.get("RL_T", 33000))
    S = 16
    P = 1024
    kk = 64
    kp = 16
    NC = int(os.environ.get("RL_CELLS", 5600))  # compacted cells/frame
    NF = (H // 8) * (W // 8)  # full cells/frame

    # ---- raw transfer/gather primitives ---------------------------------
    Gbf = jnp.asarray(rng.randn(T, 64, S).astype(np.float32)).astype(jnp.bfloat16)
    ntri = S * (S + 1) // 2
    Qf = jnp.asarray(rng.randn(T, 3 * ntri).astype(np.float32))
    ci = jnp.asarray(rng.randint(0, T, (NC, kk)).astype(np.int32))

    bench("Gi gather [NC,kk,64,S] bf16",
          jax.jit(lambda G, ci: G[ci]), Gbf, ci,
          bytes_moved=NC * kk * 64 * S * 2 * 2,  # read rows + write out
          note="per-frame EPU G rows")
    bench("Qi gather [NC,kk,3ntri] f32",
          jax.jit(lambda Q, ci: Q[ci]), Qf, ci,
          bytes_moved=NC * kk * 3 * ntri * 4 * 2,
          note="per-frame EPU Q rows")
    G8 = jnp.asarray(rng.randint(-127, 127, (T, 64, S)).astype(np.int8))
    bench("Gi gather int8 [NC,kk,64,S]",
          jax.jit(lambda G, ci: G[ci]), G8, ci,
          bytes_moved=NC * kk * 64 * S * 1 * 2,
          note="compact-table candidate")
    Q16 = jnp.asarray(rng.randint(-32000, 32000, (T, 3 * ntri)).astype(np.int16))
    bench("Qi gather int16 [NC,kk,3ntri]",
          jax.jit(lambda Q, ci: Q[ci]), Q16, ci,
          bytes_moved=NC * kk * 3 * ntri * 2 * 2,
          note="compact-table candidate")

    # sorted indices: does locality help the gather engine?
    cis = jnp.asarray(np.sort(rng.randint(0, T, (NC, kk)).astype(np.int32)))
    bench("Gi gather, row-sorted ids",
          jax.jit(lambda G, ci: G[ci]), Gbf, cis,
          bytes_moved=NC * kk * 64 * S * 2 * 2)
    flat_sorted = jnp.asarray(
        np.sort(rng.randint(0, T, (NC * kk,)).astype(np.int32)))
    bench("Gi gather, globally-sorted ids",
          jax.jit(lambda G, ci: G[ci]), Gbf, flat_sorted,
          bytes_moved=NC * kk * 64 * S * 2 * 2)

    # ---- EPU rank (current production) ----------------------------------
    from tiler_tpu.pipeline import reconstruct as RC

    feats = jnp.asarray(rng.randn(NC, K).astype(np.float32) * 100)
    pal_yuv = jnp.asarray(rng.rand(P, S, 3).astype(np.float32) * 255)
    cp = jnp.asarray(rng.randint(0, P, (NC, kp)).astype(np.int32))
    per_cell = kk * (64 * S * 2 + 3 * ntri * 4) + kp * 3 * ntri * 4
    cell_chunk = max(64, min(4096, int(3e8 / per_cell)))
    Qtab = RC._tile_quad(Gbf, S)
    _pull(Qtab)
    epu_bytes = (NC * kk * (64 * S * 2 + 3 * ntri * 4)       # Gi + Qi
                 + NC * kp * (S * 3 * 4 + 3 * ntri * 4))      # Py + Rj
    epu_flops = (2 * NC * kk * 64 * S * 3                     # C einsum
                 + 2 * NC * kk * kp * (3 * ntri + S * 3))     # err einsums
    bench("_epu_rank_all (1 frame)",
          functools.partial(RC._epu_rank_all, S=S, cell_chunk=cell_chunk),
          feats, ci, cp, Gbf, pal_yuv,
          bytes_moved=epu_bytes, flops=epu_flops,
          note=f"cell_chunk={cell_chunk}")

    # ---- KNN top-k -------------------------------------------------------
    ds = jnp.asarray(rng.randn(T, K).astype(np.float32) * 100)
    from tiler_tpu.kernels.knn_topk import knn_bucket_topk

    Tp = -(-T // 4096) * 4096
    dsp = jnp.pad(ds, ((0, Tp - T), (0, 0)))
    dsT = dsp.astype(jnp.bfloat16).T
    d2p = jnp.sum(dsp * dsp, axis=1) + jnp.where(jnp.arange(Tp) < T, 0.0, 1e30)
    for n, nm in ((NC, "compacted"), (NF, "full")):
        f = feats[:n] if n <= NC else jnp.asarray(
            rng.randn(n, K).astype(np.float32) * 100)
        bench(f"knn_bucket_topk kk=64 ({nm})",
              functools.partial(knn_bucket_topk, k=kk), f, dsT, d2p,
              bytes_moved=(-(-n // 512)) * Tp * K * 2 + n * K * 4
              + 4 * (Tp // 512) * n * 4,
              flops=2 * n * Tp * K,
              note=f"N={n}; VPU ~11 ops/elem = "
                   f"{11 * n * Tp / 1e9:.1f} Gop")
    bench(f"topk_oneshot kk=64 (XLA, compacted)",
          functools.partial(RC._topk_oneshot, k=kk, Tpad=1 << (T - 1).bit_length()),
          feats, ds,
          bytes_moved=NC * (1 << (T - 1).bit_length()) * 2 * 2
          + NC * K * 4 + T * K * 4,
          flops=2 * NC * T * K)

    # ---- motion core -----------------------------------------------------
    from tiler_tpu.pipeline import motion as M

    cur = jnp.asarray(rng.randint(0, 255, (H, W, 3)).astype(np.uint8))
    prev = jnp.asarray(rng.randint(0, 255, (H, W, 3)).astype(np.uint8))
    R = 32
    # window field: (H-7)(W-7) windows x 192 bf16 out; DCT as basis matmul
    wf_bytes = (H - 7) * (W - 7) * K * 2 + H * W * 3
    wf_flops = 2 * (H - 7) * (W - 7) * K * 64
    bench("motion window_field_bf16", jax.jit(M._window_field_bf16), prev,
          bytes_moved=wf_bytes, flops=wf_flops)
    NQ = 8
    mh, mw = -(-(H - 7 + 2 * 64) // 8), -(-(W - 7 + 2 * 64) // 8)
    cross_flops = 2 * mh * mw * 64 * NQ * NQ * K
    bench("motion _motion_core (1 frame)",
          jax.jit(lambda a, b: M._motion_core(a, b, R)), cur, prev,
          bytes_moved=wf_bytes + mh * mw * NQ * NQ * K * 2 * 2,
          flops=wf_flops + cross_flops,
          note="field + neigh-stack + cross einsum + argmin")

    # ---- h2d reference point ---------------------------------------------
    host = np.zeros((16, H, W, 3), np.uint8)
    bench("h2d 44MB (16x720p RGB)", lambda x: jnp.asarray(x), host,
          bytes_moved=host.nbytes, note="tunnel gauge")

    print()
    print(json.dumps(rows))


if __name__ == "__main__":
    main()

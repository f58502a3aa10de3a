#!/usr/bin/env python
"""Microbenchmark the hot pieces of the pipeline on the real chip.

Times each piece of _motion_core and the reconstruct KNN/EPU path in
isolation (block_until_ready around each) so optimization targets the
measured cost, not the guessed one.
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tiler_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tiler_tpu.pipeline import motion as M

H, W = 720, 1280
R = 32
REPS = 5


def _pull(out):
    # axon's block_until_ready does NOT flush its lazy dispatch queue
    # (measured: a 44 MB h2d "completes" in 0 ms, then costs 0.8 s at
    # first use) — only an actual d2h value read forces execution, so
    # every timing must end in one
    return float(jax.tree_util.tree_reduce(
        lambda a, b: a + b.astype(jnp.float32).sum().astype(jnp.float32),
        out, jnp.float32(0)))


def timeit(name, fn, *args):
    _pull(fn(*args))  # compile+warm+flush
    t0 = time.perf_counter()
    for _ in range(REPS):
        _pull(fn(*args))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:40s} {dt*1e3:9.2f} ms")
    return dt


def main():
    rng = np.random.RandomState(0)
    prev = jnp.asarray(rng.randint(0, 255, (H, W, 3)).astype(np.uint8))
    cur = jnp.asarray(rng.randint(0, 255, (H, W, 3)).astype(np.uint8))

    print(f"== motion pieces at {W}x{H}, R={R} on {jax.devices()[0]} ==")
    th, tw = H // 8, W // 8
    Q = 1
    while Q * 8 < R:
        Q *= 2
    P = Q * 8
    NQ = 2 * Q
    K = 192

    timeit("full _motion_core", jax.jit(lambda a, b: M._motion_core(a, b, R)), cur, prev)

    timeit("window_field_bf16", jax.jit(M._window_field_bf16), prev)

    F = M._window_field_bf16(prev)
    mu = jnp.zeros((K,), jnp.float32)

    @jax.jit
    def center_pad(F):
        Fc = (F.astype(jnp.float32) - mu).astype(jnp.bfloat16)
        N2 = jnp.sum(Fc.astype(jnp.float32) * Fc.astype(jnp.float32), axis=-1)
        ph = (-(H - 7 + 2 * P)) % 8
        pw = (-(W - 7 + 2 * P)) % 8
        Fp = jnp.pad(Fc, ((P, P + ph), (P, P + pw), (0, 0)))
        N2p = jnp.pad(N2, ((P, P + ph), (P, P + pw)), constant_values=jnp.inf)
        return Fp, N2p

    timeit("center+norm+pad", center_pad, F)
    Fp, N2p = center_pad(F)
    mh = Fp.shape[0] // 8
    mw = Fp.shape[1] // 8

    @jax.jit
    def blockify(Fp):
        return Fp.reshape(mh, 8, mw, 8, K).transpose(0, 2, 1, 3, 4).reshape(mh, mw, 64, K)

    timeit("Fblk transpose", blockify, Fp)
    Fblk = blockify(Fp)

    tpad = jnp.zeros((mh + NQ - 1, mw + NQ - 1, K), jnp.bfloat16)

    @jax.jit
    def neigh_stack(tpad):
        return jnp.stack(
            [
                tpad[NQ - 1 - qy : NQ - 1 - qy + mh, NQ - 1 - qx : NQ - 1 - qx + mw]
                for qy in range(NQ)
                for qx in range(NQ)
            ],
            axis=2,
        )

    timeit("neigh stack", neigh_stack, tpad)
    neigh = neigh_stack(tpad)

    @jax.jit
    def cross(Fblk, neigh):
        return jnp.einsum("mnsk,mnqk->mnqs", Fblk, neigh, preferred_element_type=jnp.bfloat16)

    timeit("cross einsum", cross, Fblk, neigh)
    D = cross(Fblk, neigh)

    T2 = jnp.zeros((th, tw), jnp.float32)
    N2blk = jnp.zeros((mh, mw, 64), jnp.float32)
    pen = jnp.zeros((64, NQ * NQ), jnp.float32)

    @jax.jit
    def assemble_argmin(D, T2, N2blk):
        pieces = []
        for qy in range(NQ):
            for qx in range(NQ):
                qi = qy * NQ + qx
                e = (
                    T2[:, :, None]
                    - 2.0 * D[qy : qy + th, qx : qx + tw, qi].astype(jnp.float32)
                    + N2blk[qy : qy + th, qx : qx + tw]
                    + pen[:, qi]
                )
                pieces.append(e.astype(jnp.bfloat16))
        err = jnp.stack(pieces, axis=2)
        flat = err.reshape(th, tw, NQ * NQ * 64)
        return jnp.argmin(flat, axis=-1)

    timeit("assemble+argmin", assemble_argmin, D, T2, N2blk)

    # tile features + exact recompute
    @jax.jit
    def tilefeats(cur):
        c = cur.astype(jnp.float32).reshape(th, 8, tw, 8, 3).swapaxes(1, 2)
        return M.tile_features_raster(c)

    timeit("tile_features(cur)", tilefeats, cur)

    bestflat = assemble_argmin(D, T2, N2blk)

    @jax.jit
    def exact_recompute(cur, prev, bestflat):
        T = tilefeats(cur)
        bestq = (bestflat // 64).astype(jnp.int32)
        bests = (bestflat % 64).astype(jnp.int32)
        best_oy = ((bestq // NQ) * 8 - P + bests // 8).astype(jnp.int32)
        best_ox = ((bestq % NQ) * 8 - P + bests % 8).astype(jnp.int32)
        wy = jnp.arange(th, dtype=jnp.int32)[:, None] * 8 + best_oy
        wx = jnp.arange(tw, dtype=jnp.int32)[None, :] * 8 + best_ox
        wyc = jnp.clip(wy, 0, H - 8).reshape(-1)
        wxc = jnp.clip(wx, 0, W - 8).reshape(-1)
        prevf = prev.astype(jnp.float32)
        R1 = jnp.stack([prevf[:, dx : dx + W - 7] for dx in range(8)], axis=2)
        win = R1[wyc[:, None] + jnp.arange(8)[None, :], wxc[:, None]]
        Wv = M.tile_features_raster(win)
        diff = T.reshape(-1, K) - Wv
        return jnp.sum(diff * diff, axis=-1)

    timeit("exact winner recompute", exact_recompute, cur, prev, bestflat)

    # ---- reconstruct KNN/EPU pieces -------------------------------------
    print("== reconstruct pieces ==")
    from tiler_tpu.pipeline import reconstruct as RC

    T = 60000
    S = 16
    Pn = 1024
    kk = 64
    N = th * tw
    ds = jnp.asarray(rng.randn(T, K).astype(np.float32) * 100)
    feats = jnp.asarray(rng.randn(N, K).astype(np.float32) * 100)

    timeit("topk kk=64 (1 frame cells)", lambda f, d: RC._topk_candidates(f, d, kk), feats, ds)

    pp = rng.randint(0, S, (T, 8, 8)).astype(np.uint8)
    _pull(RC._indicator_dcts(pp, S))  # compile+flush
    t0 = time.perf_counter()
    G = RC._indicator_dcts(pp, S).astype(jnp.bfloat16)
    _pull(G)
    print(f"{'indicator_dcts (once)':40s} {(time.perf_counter()-t0)*1e3:9.2f} ms")

    pal_yuv = jnp.asarray(rng.rand(Pn, S, 3).astype(np.float32) * 255)
    cand_idx = jnp.asarray(np.sort(rng.randint(0, T, (N, kk)), 1).astype(np.int32))
    cand_pal = jnp.asarray(np.sort(rng.randint(0, Pn, (N, kk)), 1).astype(np.int32))
    cell_chunk = max(8, min(512, int(2e8 / (kk * kk * 64 * 3 * 4))))
    print(f"cell_chunk={cell_chunk}")
    timeit(
        "epu_rank_all (1 frame)",
        functools.partial(RC._epu_rank_all, S=S, cell_chunk=cell_chunk),
        feats, cand_idx, cand_pal, G, pal_yuv,
    )


if __name__ == "__main__":
    main()

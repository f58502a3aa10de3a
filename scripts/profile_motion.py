#!/usr/bin/env python
"""Bisect _motion_core: field build vs neigh stack vs einsum vs per-q
min loop vs exact recompute. Each stage is one jit over one 720p frame."""
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


def _sync(x):
    # axon block_until_ready is a no-op; a tiny d2h pull truly syncs
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(jnp.ravel(leaves[0])[:1])


def timeit(name, fn, iters=10):
    _sync(fn())  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:56s} {dt*1e3:9.2f} ms", flush=True)


def main():
    from bench import synthetic_clip
    from tiler_tpu.pipeline import motion as M

    H, W = 720, 1280
    clip = synthetic_clip(2, H, W)
    cur = jnp.asarray(clip[1])
    prev = jnp.asarray(clip[0])
    jax.block_until_ready((cur, prev))

    R = 32
    TILE_W = 8
    K = 192
    th, tw = H // 8, W // 8
    Q = 1
    while Q * TILE_W < R:
        Q *= 2
    P = Q * TILE_W
    mh = -(-(H - 7 + 2 * P) // TILE_W)
    mw = -(-(W - 7 + 2 * P) // TILE_W)
    NQ = 2 * Q
    pen_np = M.make_penalty(R, P)

    @jax.jit
    def prep(cur_rgb, prev_rgb):
        cur_t = cur_rgb.astype(jnp.float32).reshape(th, 8, tw, 8, 3).swapaxes(1, 2)
        T = M.tile_features_raster(cur_t)
        mu = jnp.mean(T.reshape(-1, K), axis=0)
        Tc = T - mu
        T2 = jnp.sum(Tc * Tc, axis=-1)
        Tb = Tc.astype(jnp.bfloat16)
        tpad = jnp.pad(Tb, ((NQ - 1, mh - th), (NQ - 1, mw - tw), (0, 0)))
        return T, mu, T2, tpad

    T, mu, T2, tpad = jax.block_until_ready(prep(cur, prev))
    timeit("prep: tile feats + pad", lambda: prep(cur, prev))

    @jax.jit
    def field(prev_rgb, mu):
        return M._window_field_blocks(prev_rgb, mu, P, mh, mw, K)

    Fblk, N2blk = jax.block_until_ready(field(prev, mu))
    timeit("field blocks (window DCT)", lambda: field(prev, mu))

    @jax.jit
    def neigh_stack(tpad):
        return jnp.stack(
            [tpad[NQ - 1 - qy : NQ - 1 - qy + mh, NQ - 1 - qx : NQ - 1 - qx + mw]
             for qy in range(NQ) for qx in range(NQ)], axis=2)

    neigh = jax.block_until_ready(neigh_stack(tpad))
    timeit("neigh stack (64 shifts)", lambda: neigh_stack(tpad))

    @jax.jit
    def einsum_d(Fblk, neigh):
        return jnp.einsum("mnsk,mnqk->mnqs", Fblk, neigh,
                          preferred_element_type=jnp.bfloat16)

    D = jax.block_until_ready(einsum_d(Fblk, neigh))
    timeit("D einsum (batched 64x64x192)", lambda: einsum_d(Fblk, neigh))

    @jax.jit
    def qloop(D, T2, N2blk):
        mins, args = [], []
        for qy in range(NQ):
            for qx in range(NQ):
                qi = qy * NQ + qx
                e = (T2[:, :, None]
                     - 2.0 * D[qy:qy+th, qx:qx+tw, qi].astype(jnp.float32)
                     + N2blk[qy:qy+th, qx:qx+tw]
                     + jnp.asarray(pen_np[:, qi])).astype(jnp.bfloat16)
                mins.append(jnp.min(e, axis=-1))
                args.append(jnp.argmin(e, axis=-1))
        minq = jnp.stack(mins, axis=2)
        argq = jnp.stack(args, axis=2)
        bestq = jnp.argmin(minq, axis=-1).astype(jnp.int32)
        bests = jnp.take_along_axis(argq, bestq[..., None], axis=2)[..., 0]
        return bestq, bests.astype(jnp.int32)

    bq, bs = jax.block_until_ready(qloop(D, T2, N2blk))
    timeit("per-q min loop + merge", lambda: qloop(D, T2, N2blk))

    @jax.jit
    def exact(prev_rgb, T, bestq, bests):
        best_oy = ((bestq // NQ) * 8 - P + bests // 8).astype(jnp.int32)
        best_ox = ((bestq % NQ) * 8 - P + bests % 8).astype(jnp.int32)
        wy = jnp.arange(th, dtype=jnp.int32)[:, None] * 8 + best_oy
        wx = jnp.arange(tw, dtype=jnp.int32)[None, :] * 8 + best_ox
        wyc = jnp.clip(wy, 0, H - 8).reshape(-1)
        wxc = jnp.clip(wx, 0, W - 8).reshape(-1)
        prevf = prev_rgb.astype(jnp.float32)
        R1 = jnp.stack([prevf[:, dx : dx + W - 7] for dx in range(8)], axis=2)
        win = R1[wyc[:, None] + jnp.arange(8)[None, :], wxc[:, None]]
        Wv = M.tile_features_raster(win)
        diff = T.reshape(-1, K) - Wv
        return jnp.sum(diff * diff, axis=-1)

    jax.block_until_ready(exact(prev, T, bq, bs))
    timeit("exact winner recompute", lambda: exact(prev, T, bq, bs))

    timeit("FULL motion_search (fused)",
           lambda: M.motion_search(cur, prev, R))


if __name__ == "__main__":
    main()

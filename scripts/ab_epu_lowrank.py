#!/usr/bin/env python
"""Fidelity A/B for a TWO-STAGE EPU re-rank (ROADMAP #1 / VERDICT r03 #3).

The EPU's cost is gather volume (Gi 12.8 + Qi 7.1 ms/720p-frame at
kk=64, docs/PERF.md), not FLOPs. Candidate structural cut: rank all
kk x kp pairs with CHEAP tables, keep the top M pairs per cell, then
re-rank those M with EXACT pixel-render errors (the same
_exact_choice_err the winner already gets today). Stage-1 levers:

  - G restricted to the low-frequency r x r DCT block per channel
    (PSNR-HVS weights concentrate energy there; the motion ranker's
    rank_dims uses the same physics) -> Gi bytes x r^2/64, int8 on top
    (per-coefficient scales — the one-stage int8-G scheme that shipped
    as epu_int8_tables until r4's battery measured it fps-neutral and
    superseded by the two-stage path; deleted from the encoder).
  - Q optionally int16 with per-COLUMN scales folded into the palette
    outer products Rj (exact fold, like g_inv into ftw) -> Qi bytes /2.

Because stage 2 is EXACT on the survivors, final quality only degrades
when the true winner falls outside stage-1's top M — this script
measures exactly that: winner agreement and chosen-pair exact-error
delta vs the production full-bf16 rank, per (r, M, q16) variant.

Usage: PB_W=352 PB_H=288 PB_PALETTES=256 PB_FRAMES=4 \
       python scripts/ab_epu_lowrank.py [city]
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("TILER_TPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TILER_TPU_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", "/tmp/tiler_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def lf_indices(r):
    v, u = np.mgrid[0:r, 0:r]
    return (v * 8 + u).reshape(-1)


def main():
    from bench import synthetic_clip, realistic_clip
    from tiler_tpu.config import EncoderSettings
    from tiler_tpu.pipeline.encoder import Encoder
    from tiler_tpu.pipeline import reconstruct as RC
    from tiler_tpu.pipeline.motion import tile_features_raster
    from tiler_tpu.ops.color import rgb_to_yuv
    from tiler_tpu.ops.dct import DCT_WEIGHTS

    F = int(os.environ.get("PB_FRAMES", "4"))
    H = int(os.environ.get("PB_H", "288"))
    W = int(os.environ.get("PB_W", "352"))
    clip = (realistic_clip(F, H, W) if "city" in sys.argv
            else synthetic_clip(F, H, W))
    settings = EncoderSettings(
        palette_count=int(os.environ.get("PB_PALETTES", "256")),
        palette_size=16, motion_predict_radius=16,
        global_tiling_quality_based_tile_count=7.0, epu_knn_k=64,
    )
    enc = Encoder(settings, log=lambda *a: None)
    enc.load_frames(clip, fps=25.0).predict_motion().reduce() \
       .prepare_palettes().dither()
    st = enc.state
    S = settings.palette_size
    T = len(st.corpus_pal_pixels)
    print(f"T={T} P={settings.palette_count}", flush=True)

    rendered = RC._render_corpus_dev(
        jnp.asarray(st.palettes_rgb),
        jnp.asarray(st.corpus_pal_initial.astype(np.int32)),
        jnp.asarray(st.corpus_pal_pixels))
    dsj = tile_features_raster(rendered.astype(jnp.float32))
    Gf = RC._indicator_dcts(st.corpus_pal_pixels, S)  # [T, 64, S] f32
    G = Gf.astype(jnp.bfloat16)
    Q = RC._tile_quad(G, S)
    pal_initial = jnp.asarray(st.corpus_pal_initial.astype(np.int32))
    pal_yuv = rgb_to_yuv(jnp.asarray(st.palettes_rgb, jnp.float32))
    pp_dev = jnp.asarray(st.corpus_pal_pixels)
    palettes_dev = jnp.asarray(st.palettes_rgb)

    kk, pal_k = 64, 16
    ntri3 = 3 * (S * (S + 1) // 2)
    per_cell = kk * (64 * S * 2 + ntri3 * 4) + pal_k * ntri3 * 4
    cell_chunk = max(64, min(4096, int(3e8 / per_cell)))
    Tpad = 256
    while Tpad < T:
        Tpad *= 2

    tri_i, tri_j = np.triu_indices(S)
    w = np.asarray(DCT_WEIGHTS, np.float64)
    wf = jnp.asarray(w.transpose(1, 2, 0).reshape(64, 3), jnp.float32)

    def quantize_q16(Qf, Rall):
        """int16 Q with per-column scales folded EXACTLY into Rall."""
        cmax = jnp.maximum(jnp.max(jnp.abs(Qf), axis=0), 1e-9)  # [3*ntri]
        qs = 32767.0 / cmax
        Q16 = jnp.round(Qf * qs[None, :]).astype(jnp.int16)
        return Q16, Rall / qs[None, :]

    _prep = {}  # (lf, M, q16) -> jitted rank fn; tables + jit built ONCE
    # per variant, not per frame (jax.jit caches by function identity, so
    # a closure created inside the per-frame loop recompiles every call)

    def two_stage(feats, idx, cand_pal, lf, M, q16):
        """Stage 1: int8 low-freq G + (f32|int16) Q pair rank; stage 2:
        exact re-rank of the per-cell top-M pairs."""
        B = feats.shape[0]
        cache_key = (tuple(lf), M, q16)
        if cache_key in _prep:
            rank = _prep[cache_key]
            ts, ps, es = [], [], []
            for i in range(0, B, cell_chunk):
                t, p, e = rank(feats[i:i + cell_chunk], idx[i:i + cell_chunk],
                               cand_pal[i:i + cell_chunk])
                ts.append(t); ps.append(p); es.append(e)
            return (jnp.concatenate(ts), jnp.concatenate(ps),
                    jnp.concatenate(es))
        # stage-1 tables
        Glf = Gf[:, jnp.asarray(lf), :]  # [T, L, S]
        vmax = jnp.maximum(jnp.max(jnp.abs(Glf), axis=(0, 2)), 1e-6)
        gsc = 127.0 / vmax
        G8 = jnp.round(Glf * gsc[None, :, None]).astype(jnp.int8)
        g_inv = (1.0 / gsc).astype(jnp.float32)
        wlf = wf[jnp.asarray(lf)]  # [L, 3]
        # quad table over the SUBSET coefficients (can't reuse _tile_quad:
        # its wf2 is indexed by the full 64-coefficient raster)
        Pc = pal_yuv.transpose(0, 2, 1)
        Rall = (Pc[..., tri_i] * Pc[..., tri_j]).reshape(
            pal_yuv.shape[0], -1)  # [P, 3*ntri]
        wlf2 = (wlf * wlf)  # [L, 3]
        G8f = G8.astype(jnp.float32) * g_inv[None, :, None]
        outs = []
        for c in range(3):
            o = jnp.einsum("tvs,tvu->tsu", G8f * wlf2[:, c][None, :, None],
                           G8f, preferred_element_type=jnp.float32)
            outs.append(o[:, tri_i, tri_j]
                        * jnp.asarray((tri_i != tri_j) + 1.0, jnp.float32))
        Qlf = jnp.stack(outs, axis=1).reshape(T, -1)  # [T, 3*ntri] f32
        Rj_all = Rall
        if q16:
            Qlf, Rj_all = quantize_q16(Qlf, Rall)

        @jax.jit
        def rank(f, ci, cp):
            b = f.shape[0]
            Gi = G8[ci]  # [b, kk, L, S] int8
            ftw = (f.reshape(-1, 3, 64).transpose(0, 2, 1)
                   * wf[None])[:, jnp.asarray(lf), :]  # [b, L, 3]
            ftw = ftw * g_inv[None, :, None]
            C = jnp.einsum("bkvs,bvc->bksc", Gi.astype(jnp.bfloat16),
                           ftw.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            Py = pal_yuv[cp]
            Rj = Rj_all[cp].astype(jnp.float32)
            Qi = Qlf[ci].astype(jnp.float32)
            err = jnp.einsum("bkx,bjx->bkj", Qi, Rj,
                             precision=jax.lax.Precision.HIGH,
                             preferred_element_type=jnp.float32)
            err = err - 2.0 * jnp.einsum(
                "bksc,bjsc->bkj", C, Py,
                precision=jax.lax.Precision.HIGH,
                preferred_element_type=jnp.float32)
            err = err.reshape(b, -1)
            _, top = jax.lax.top_k(-err, M)  # [b, M] pair slots
            mk = top // pal_k
            mj = top % pal_k
            mt = jnp.take_along_axis(ci, mk, axis=1)  # [b, M] tiles
            mp = jnp.take_along_axis(cp, mj, axis=1)  # [b, M] palettes
            # stage 2: exact errors of the M survivors
            ex = RC._exact_choice_err(
                jnp.repeat(f, M, axis=0),
                mt.reshape(-1), mp.reshape(-1), pp_dev, palettes_dev,
            ).reshape(b, M)
            # reference tie-break among exact-minimal pairs: packed-id min
            P = pal_yuv.shape[0]
            combo = mt * P + mp
            m = jnp.min(ex, axis=1)
            sel = jnp.where(ex <= m[:, None], combo, jnp.int32(2**31 - 1))
            best = jnp.min(sel, axis=1)
            return best // P, best % P, m

        _prep[cache_key] = rank
        ts, ps, es = [], [], []
        for i in range(0, B, cell_chunk):
            t, p, e = rank(feats[i:i + cell_chunk], idx[i:i + cell_chunk],
                           cand_pal[i:i + cell_chunk])
            ts.append(t); ps.append(p); es.append(e)
        return (jnp.concatenate(ts), jnp.concatenate(ps),
                jnp.concatenate(es))

    tiles = jnp.asarray(st.tiles_canon, jnp.float32)
    N = tiles.shape[1]
    variants = [(4, 8, False), (4, 16, False), (6, 8, False),
                (4, 8, True), (4, 16, True), (2, 16, False),
                # deeper survivor pools: r4's chip battery failed the
                # M=16 funnel at bench settings (k=64 -> 1024 pairs;
                # -0.47 dB via used-tile shrink) — measure whether more
                # exact-re-ranked survivors recover full-rank agreement
                (4, 32, True), (4, 64, True), (6, 32, True)]
    agree = {v: 0 for v in variants}
    dsum = {v: 0.0 for v in variants}
    dmax = {v: 0.0 for v in variants}
    base_err_sum = 0.0
    total = 0
    for f in range(tiles.shape[0]):
        feats = tile_features_raster(tiles[f])
        idx, _ = RC._topk_oneshot(feats, dsj, kk, Tpad)
        cand_pal = pal_initial[idx[:, :pal_k]]
        t0, p0, _ = RC._epu_rank_all(feats, idx, cand_pal, G, pal_yuv, S,
                                     cell_chunk=cell_chunk, Q=Q)
        e0 = RC._exact_choice_err(feats, t0, p0, pp_dev, palettes_dev)
        t0, p0, e0 = map(np.asarray, (t0, p0, e0))
        base_err_sum += float(e0.sum())
        total += N
        for v in variants:
            r, M, q16 = v
            t, p, e = two_stage(feats, idx, cand_pal, lf_indices(r), M, q16)
            t, p, e = map(np.asarray, (t, p, e))
            agree[v] += int(((t == t0) & (p == p0)).sum())
            rel = (e - e0) / np.maximum(e0, 1e-6)
            dsum[v] += float(rel.sum())
            dmax[v] = max(dmax[v], float(rel.max()))
        print(f"frame {f} done", flush=True)

    print(f"\ncells={total}  (baseline = production bf16 full-rank EPU)")
    for v in variants:
        r, M, q16 = v
        print(f"  r={r} ({3*r*r:3d} dims) M={M:2d} q16={int(q16)}: "
              f"winner agreement {agree[v]/total:7.3%}  "
              f"mean exact-err delta {dsum[v]/total:+.4%}  "
              f"max {dmax[v]:+.3%}")


if __name__ == "__main__":
    main()

"""EPU cartesian re-rank vs a scalar float64 oracle (VERDICT round-1
item: EPU tie-break parity was asserted, not tested).

Oracle semantics (TFrame.Reconstruct EPU loop, tilingencoder.pas:
1563-1609): for each cell, evaluate every (candidate tile, candidate
palette) pair's weighted-DCT error of the tile rendered through that
palette, iterate candidates ascending with strict <, take the first
minimum. The production path ranks in bf16 and re-evaluates the winner
exactly, so selections may differ on near-ties — the test requires the
CHOSEN pair's exact error to match the oracle's optimum within the bf16
ranking noise, and exact agreement for decisive cases."""
import numpy as np
import jax.numpy as jnp
import pytest

from tiler_tpu.ops.color import rgb_to_yuv
from tiler_tpu.ops.dct import DCT_MAT, DCT_WEIGHTS
from tiler_tpu.pipeline import reconstruct as R


def _oracle_features(rgb_tile):
    """float64 weighted-DCT YUV features, (c, v, u) raster."""
    yuv = np.asarray(rgb_to_yuv(jnp.asarray(rgb_tile, jnp.float64)))
    D = np.asarray(DCT_MAT, np.float64)
    z = np.einsum("vy,yxc,ux->cvu", D, yuv, D)
    return (z * np.asarray(DCT_WEIGHTS, np.float64)).reshape(192)


def test_epu_rank_matches_scalar_oracle():
    rng = np.random.RandomState(5)
    B, kk, kp, T, P, S = 24, 6, 6, 40, 8, 16
    pp = rng.randint(0, S, (T, 8, 8)).astype(np.uint8)
    palettes = rng.randint(0, 256, (P, S, 3)).astype(np.uint8)

    # cells = rendered corpus tiles + noise so near-perfect matches exist
    cell_tiles = []
    srcs = []
    for b in range(B):
        t = rng.randint(0, T)
        p = rng.randint(0, P)
        srcs.append((t, p))
        rgb = palettes[p][pp[t]].astype(np.int32)
        rgb = np.clip(rgb + rng.randint(-6, 7, rgb.shape), 0, 255)
        cell_tiles.append(rgb)
    cell_tiles = np.stack(cell_tiles).astype(np.float64)

    feats64 = np.stack([_oracle_features(c) for c in cell_tiles])
    # candidate sets include the true source pair -> decisive optima exist
    cand_idx = rng.randint(0, T, (B, kk)).astype(np.int32)
    cand_pal = rng.randint(0, P, (B, kp)).astype(np.int32)
    for b, (t, p) in enumerate(srcs):
        cand_idx[b, rng.randint(kk)] = t
        cand_pal[b, rng.randint(kp)] = p
    cand_idx = np.sort(cand_idx, axis=1)
    cand_pal = np.sort(cand_pal, axis=1)

    # float64 oracle: strict-< first minimum, tile-major palette-minor
    rf64 = {}
    for t in range(T):
        for p in range(P):
            rf64[(t, p)] = _oracle_features(palettes[p][pp[t]].astype(np.float64))
    want_err = np.zeros(B)
    want_tp = []
    for b in range(B):
        best, bt, bp_ = np.inf, -1, -1
        for i in range(kk):
            for j in range(kp):
                d = feats64[b] - rf64[(cand_idx[b, i], cand_pal[b, j])]
                e = float(d @ d)
                if e < best:
                    best, bt, bp_ = e, cand_idx[b, i], cand_pal[b, j]
        want_err[b] = best
        want_tp.append((bt, bp_))

    # production path
    from tiler_tpu.pipeline.motion import tile_features_raster

    feats = np.asarray(tile_features_raster(jnp.asarray(cell_tiles, jnp.float32)))
    G = R._indicator_dcts(pp, S).astype(jnp.bfloat16)
    pal_yuv = rgb_to_yuv(jnp.asarray(palettes, jnp.float32))
    t_sel, p_sel, _ = R._epu_rank_all(
        jnp.asarray(feats), jnp.asarray(cand_idx), jnp.asarray(cand_pal),
        G, pal_yuv, S, cell_chunk=8,
    )
    e_sel = R._exact_choice_err(
        jnp.asarray(feats), t_sel, p_sel, jnp.asarray(pp), jnp.asarray(palettes)
    )
    t_sel, p_sel, e_sel = np.asarray(t_sel), np.asarray(p_sel), np.asarray(e_sel)

    # the chosen pair's exact error can't beat the oracle (fp32 rounding
    # of ~1e7-scale sums allows ~1 ulp) and must sit within the bf16
    # ranking noise of the optimum
    assert np.all(e_sel >= want_err * (1 - 1e-5) - 1e-3)
    rel = (e_sel - want_err) / np.maximum(want_err, 1.0)
    assert np.mean(rel < 0.02) >= 0.9, f"selections off-optimum: {rel}"
    exact_match = np.mean([(t_sel[b], p_sel[b]) == want_tp[b] for b in range(B)])
    assert exact_match >= 0.7, f"exact pair agreement {exact_match:.2%}"


def test_epu_decisive_case_exact():
    """When one candidate pair renders the cell exactly, it must win."""
    rng = np.random.RandomState(11)
    T, P, S, kk = 12, 4, 16, 4
    pp = rng.randint(0, S, (T, 8, 8)).astype(np.uint8)
    palettes = rng.randint(0, 256, (P, S, 3)).astype(np.uint8)
    from tiler_tpu.pipeline.motion import tile_features_raster

    t0, p0 = 7, 2
    cell = palettes[p0][pp[t0]].astype(np.float32)[None]
    feats = tile_features_raster(jnp.asarray(cell))
    cand_idx = jnp.asarray(np.sort([[t0, 1, 3, 9]]).astype(np.int32))
    cand_pal = jnp.asarray(np.sort([[p0, 0, 1, 3]]).astype(np.int32))
    G = R._indicator_dcts(pp, S).astype(jnp.bfloat16)
    pal_yuv = rgb_to_yuv(jnp.asarray(palettes, jnp.float32))
    t_sel, p_sel, _ = R._epu_rank_all(feats, cand_idx, cand_pal, G, pal_yuv, S, cell_chunk=8)
    assert int(t_sel[0]) == t0 and int(p_sel[0]) == p0


def test_epu_two_stage_near_full_rank():
    """settings.epu_two_stage: stage-1 int8 low-freq G + int16 Q rank,
    stage-2 exact top-M re-rank. Measured at CIF/256: 99.3% winner
    agreement, +0.21% mean exact-err vs the full bf16 rank
    (scripts/ab_epu_lowrank.py, docs/PERF.md). Because stage 2 is exact,
    the chosen pair's error can only exceed the full-rank path's when
    the true winner fell outside the survivors."""
    rng = np.random.RandomState(3)
    B, kk, kp, T, P, S = 64, 8, 8, 64, 16, 16
    pp = rng.randint(0, S, (T, 8, 8)).astype(np.uint8)
    palettes = rng.randint(0, 256, (P, S, 3)).astype(np.uint8)
    cell_tiles = []
    for b in range(B):
        rgb = palettes[rng.randint(P)][pp[rng.randint(T)]].astype(np.int32)
        cell_tiles.append(np.clip(rgb + rng.randint(-6, 7, rgb.shape), 0, 255))
    cell_tiles = np.stack(cell_tiles).astype(np.float32)
    cand_idx = np.sort(rng.randint(0, T, (B, kk)).astype(np.int32), axis=1)
    cand_pal = np.sort(rng.randint(0, P, (B, kp)).astype(np.int32), axis=1)

    from tiler_tpu.pipeline.motion import tile_features_raster

    feats = jnp.asarray(
        np.asarray(tile_features_raster(jnp.asarray(cell_tiles))))
    Gf = R._indicator_dcts(pp, S)
    pal_yuv = rgb_to_yuv(jnp.asarray(palettes, jnp.float32))

    Gb = Gf.astype(jnp.bfloat16)
    Qb = R._tile_quad(Gb, S)
    t0, p0, _ = R._epu_rank_all(feats, jnp.asarray(cand_idx),
                                jnp.asarray(cand_pal), Gb, pal_yuv, S,
                                cell_chunk=16, Q=Qb)
    e0 = np.asarray(R._exact_choice_err(feats, t0, p0, jnp.asarray(pp),
                                        jnp.asarray(palettes)))

    G8lf, g_inv, Q16, q_inv = R._build_two_stage_tables(Gf, S, 48)
    assert G8lf.dtype == jnp.int8 and Q16.dtype == jnp.int16
    t1, p1, e1 = R._epu_rank_two_stage(
        feats, jnp.asarray(cand_idx), jnp.asarray(cand_pal),
        G8lf, g_inv, Q16, q_inv, pal_yuv, jnp.asarray(pp),
        jnp.asarray(palettes), S, dims=48, M=16, cell_chunk=16)
    e1 = np.asarray(e1)

    # the returned err must BE the exact error of the returned pair
    e1_check = np.asarray(R._exact_choice_err(
        feats, t1, p1, jnp.asarray(pp), jnp.asarray(palettes)))
    assert np.allclose(e1, e1_check, rtol=1e-5, atol=1e-2)

    agree = np.mean((np.asarray(t0) == np.asarray(t1))
                    & (np.asarray(p0) == np.asarray(p1)))
    rel = (e1.sum() - e0.sum()) / max(e0.sum(), 1.0)
    assert agree >= 0.85, f"two-stage winner agreement {agree:.2%}"
    assert rel <= 0.02, f"two-stage exact-err delta {rel:+.3%}"


def test_epu_two_stage_end_to_end(tmp_path):
    """epu_two_stage=1 runs the full pipeline, produces a decodable
    stream within 0.5 dB of the default path, and round-trips its flag
    through the stream-embedded settings."""
    from tiler_tpu.config import EncoderSettings
    from tiler_tpu.pipeline.encoder import Encoder
    from tiler_tpu.bitstream.gtm import GTMDecoder, GTMReader

    rng = np.random.RandomState(5)
    base = rng.randint(0, 200, (48, 64, 3)).astype(np.uint8)
    clip = np.stack([np.roll(base, (2 * f, 3 * f), (0, 1))
                     for f in range(4)])

    def run(two_stage):
        s = EncoderSettings(palette_count=8, palette_size=16,
                            motion_predict_radius=4, epu_knn_k=8,
                            kmeans_iters=3, epu_two_stage=two_stage,
                            epu_stage1_m=8,
                            global_tiling_quality_based_tile_count=4.0)
        enc = Encoder(s, log=lambda *a: None)
        p = str(tmp_path / f"ts{int(two_stage)}.gtm")
        enc.run_all(clip, fps=25.0, out_path=p)
        assert len(GTMDecoder(p).decode_frames()) == 4
        if two_stage:
            s2 = EncoderSettings.from_ini(GTMReader.read(p).settings_text)
            assert s2.epu_two_stage is True and s2.epu_stage1_m == 8
        return enc.state.total_psnr

    base_psnr = run(False)
    ts_psnr = run(True)
    assert ts_psnr >= base_psnr - 0.5, (base_psnr, ts_psnr)


def test_epu_fused_fp_bit_identical():
    """The FULL-PRECISION fused table (settings.epu_fused_fp) holds the
    default path's bf16-G/f32-Q rows as int8 bytes in one row — rankings
    must be bit-identical to the default two-gather path (the bitcast
    roundtrip is exact; no quantization anywhere)."""
    import jax

    rng = np.random.RandomState(13)
    B, kk, kp, T, P, S = 32, 8, 6, 60, 12, 16
    pp = rng.randint(0, S, (T, 8, 8)).astype(np.uint8)
    palettes = rng.randint(0, 256, (P, S, 3)).astype(np.uint8)
    feats = rng.randint(-500, 500, (B, 192)).astype(np.float32)
    cand_idx = np.sort(rng.randint(0, T, (B, kk)).astype(np.int32), 1)
    cand_pal = np.sort(rng.randint(0, P, (B, kp)).astype(np.int32), 1)
    pal_yuv = np.asarray(rgb_to_yuv(jnp.asarray(palettes, jnp.float32)))

    Gb = R._indicator_dcts(pp, S).astype(jnp.bfloat16)
    Qf = R._tile_quad(Gb, S)
    t0, p0, e0 = R._epu_rank_all(
        jnp.asarray(feats), jnp.asarray(cand_idx), jnp.asarray(cand_pal),
        Gb, jnp.asarray(pal_yuv), S, cell_chunk=16, Q=Qf)
    GQ = jnp.concatenate([
        jax.lax.bitcast_convert_type(Gb, jnp.int8).reshape(Gb.shape[0], -1),
        jax.lax.bitcast_convert_type(Qf, jnp.int8).reshape(Qf.shape[0], -1),
    ], axis=1)
    t1, p1, e1 = R._epu_rank_all(
        jnp.asarray(feats), jnp.asarray(cand_idx), jnp.asarray(cand_pal),
        GQ, jnp.asarray(pal_yuv), S, cell_chunk=16, Q=None)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))


def test_epu_fused_fp_e2e_pixel_identical(tmp_path):
    """epu_fused_fp=1 must reproduce the DEFAULT encode pixel-for-pixel
    (bit-identical rankings -> identical decisions -> identical streams
    up to the embedded settings text), and round-trip its flag."""
    from tiler_tpu.bitstream.gtm import GTMDecoder, GTMReader
    from tiler_tpu.config import EncoderSettings
    from tiler_tpu.pipeline.encoder import Encoder

    rng = np.random.RandomState(5)
    base = rng.randint(0, 200, (48, 64, 3)).astype(np.uint8)
    clip = np.stack([np.roll(base, (2 * f, 3 * f), (0, 1))
                     for f in range(4)])

    def run(fp):
        s = EncoderSettings(palette_count=8, palette_size=16,
                            motion_predict_radius=4, epu_knn_k=8,
                            kmeans_iters=3, epu_fused_fp=fp,
                            global_tiling_quality_based_tile_count=4.0)
        enc = Encoder(s, log=lambda *a: None)
        p = str(tmp_path / f"fp{int(fp)}.gtm")
        enc.run_all(clip, fps=25.0, out_path=p)
        frames = np.stack(GTMDecoder(p).decode_frames())
        if fp:
            s2 = EncoderSettings.from_ini(GTMReader.read(p).settings_text)
            assert s2.epu_fused_fp is True
        return frames, enc.state.total_psnr

    f0, psnr0 = run(False)
    f1, psnr1 = run(True)
    np.testing.assert_array_equal(f0, f1)
    assert psnr0 == psnr1

"""esReduce semantics: threshold quantile, KF-start PSNR/10 rule, dedup
with summed use counts, use-count-descending order."""
import numpy as np

from tiler_tpu.config import EncoderSettings
from tiler_tpu.models.state import EncodeState, KeyFrameInfo, TileMapSoA
from tiler_tpu.pipeline.reduce import reduce_tiles


def _state(F=3, th=2, tw=2):
    st = EncodeState()
    st.fps = 24.0
    st.tilemap_h, st.tilemap_w = th, tw
    N = th * tw
    rng = np.random.RandomState(0)
    tiles = rng.randint(0, 256, (F, N, 8, 8, 3)).astype(np.uint8)
    st.tiles_canon = tiles
    st.frames_rgb = np.zeros((F, th * 8, tw * 8, 3), np.uint8)  # n_frames source
    st.tilemap = TileMapSoA.zeros(F, N)
    st.keyframes = [KeyFrameInfo(0, 0, F - 1)]
    st.frame_kf = np.zeros(F, np.int32)
    return st


def test_target_psnr_mode_marks_predicted():
    st = _state()
    # all PSNRs above threshold except frame 1 cell 2
    st.tilemap.psnr[:] = 40.0
    st.tilemap.psnr[1, 2] = 10.0
    s = EncoderSettings(global_tiling_use_target_psnr=True, global_tiling_target_psnr=20.0)
    reduce_tiles(st, s)
    # kf-start frame 0: eff = psnr/10 = 4.0 <= 20 -> unpredicted (intra)
    assert not st.tilemap.predicted[0].any()
    # frame 1: only cell 2 (10 <= 20) unpredicted
    assert list(st.tilemap.predicted[1]) == [True, True, False, True]
    # frame 2: all predicted
    assert st.tilemap.predicted[2].all()
    # corpus holds frame-0 cells + frame1 cell2, all unique random tiles
    assert len(st.corpus_rgb) == 5
    assert (st.tilemap.tile_idx[0] >= 0).all()


def test_dedup_merges_and_counts():
    st = _state(F=2)
    # make frame 1 identical to frame 0 -> tiles dedup 2:1
    st.tiles_canon[1] = st.tiles_canon[0]
    # and cells 0,1 of frame 0 identical too
    st.tiles_canon[0, 1] = st.tiles_canon[0, 0]
    st.tiles_canon[1, 1] = st.tiles_canon[0, 0]
    st.tilemap.psnr[:] = 0.0  # nothing predictable -> everything intra
    s = EncoderSettings(global_tiling_use_target_psnr=True, global_tiling_target_psnr=20.0)
    reduce_tiles(st, s)
    assert len(st.corpus_rgb) == 3  # 4 unique contents per frame minus merge
    assert int(st.corpus_use.sum()) == 8
    # most used tile (4 instances) sorted first
    assert st.corpus_use[0] == 4
    assert list(st.corpus_use) == sorted(st.corpus_use, reverse=True)
    # cells with identical content share a tile index
    ti = st.tilemap.tile_idx
    assert ti[0, 0] == ti[0, 1] == ti[1, 0] == ti[1, 1] == 0


def test_tile_budget_quantile():
    st = _state(F=4)
    rng = np.random.RandomState(1)
    st.tilemap.psnr[:] = rng.uniform(0, 50, st.tilemap.psnr.shape)
    s = EncoderSettings(global_tiling_tile_count=6)
    reduce_tiles(st, s)
    # hits the requested budget exactly (unique random tiles -> no merges)
    assert len(st.corpus_rgb) == 6


def test_tie_block_takes_closer_count():
    """A tie block of equal eff values spanning the target must resolve to
    the NEARER of the two achievable step counts (reference closest-count
    objective, utils.pas:1044-1072) — not silently swallow the whole block
    (round-2 regression: 1.93x corpus overshoot on the bench clip)."""
    st = _state(F=8, th=2, tw=2)  # 32 cells, all-unique random tiles
    # eff values: 4 distinct low values, then a 28-cell tie at 30.0
    psnr = np.full((8, 4), 30.0)
    psnr.reshape(-1)[:4] = [5.0, 6.0, 7.0, 8.0]
    st.tilemap.psnr[:] = psnr
    st.keyframes = []  # no kf-start /10 rule in this test
    # target 6: achievable counts are 4 (below tie) or 32 (tie end) -> 4 wins
    s = EncoderSettings(global_tiling_tile_count=6)
    reduce_tiles(st, s)
    assert len(st.corpus_rgb) == 4
    # target 20: |4-20|=16 vs |32-20|=12 -> tie end wins
    s = EncoderSettings(global_tiling_tile_count=20)
    reduce_tiles(st, s)
    assert len(st.corpus_rgb) == 32

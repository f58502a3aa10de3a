"""esLoad semantics: tile extraction, mirror canonicalization flags,
inter-frame correlation, keyframe detection rules."""
import numpy as np
import jax.numpy as jnp

from tiler_tpu.config import EncoderSettings
from tiler_tpu.models.state import EncodeState
from tiler_tpu.ops import tiles as T
from tiler_tpu.pipeline.load import load


def test_mirror_heuristic_brightest_quadrant_topleft():
    t = np.zeros((8, 8, 3), np.float64)
    t[4:, 4:] = 255  # brightest bottom-right
    hm, vm = T.mirror_heuristics(jnp.asarray(t[None]))
    assert bool(hm[0]) and bool(vm[0])
    canon, hm2, vm2 = T.canonicalize(jnp.asarray(t[None]))
    # canonical tile has the bright quadrant top-left
    assert np.asarray(canon)[0, :4, :4].mean() > np.asarray(canon)[0, 4:, 4:].mean()
    # re-applying the heuristic on the canonical tile is a no-op
    hm3, vm3 = T.mirror_heuristics(canon)
    assert not bool(hm3[0]) and not bool(vm3[0])


def test_frame_tiles_roundtrip():
    rng = np.random.RandomState(0)
    f = rng.randint(0, 256, (24, 32, 3)).astype(np.float32)
    t = T.frame_to_tiles(jnp.asarray(f))
    assert t.shape == (3, 4, 8, 8, 3)
    back = T.tiles_to_frame(t)
    assert np.array_equal(np.asarray(back), f)


def test_keyframe_detection_rules():
    # structured scenes (noise frames have near-constant tile means, which
    # makes Pearson over tile-mean vectors meaningless — as in the reference)
    H, W, F = 64, 64, 20
    yy, xx = np.mgrid[0:H, 0:W]
    base = np.stack([yy * 4, xx * 4, (yy + xx) * 2], -1).astype(np.uint8)
    other = base[::-1, ::-1]  # inverted scene
    frames = np.stack([base + (i % 3) for i in range(F)]).astype(np.uint8)
    frames[10:] = other[None] + (np.arange(10) % 2)[:, None, None, None].astype(np.uint8)
    s = EncoderSettings(shot_trans_min_seconds_per_kf=0.1, shot_trans_max_seconds_per_kf=100)
    st = load(EncodeState(), frames, fps=10.0, settings=s)
    starts = [k.start_frame for k in st.keyframes]
    assert 0 in starts
    assert any(9 <= x <= 11 for x in starts[1:]), starts

    # min-seconds suppression: cut too close to the previous keyframe
    s2 = EncoderSettings(shot_trans_min_seconds_per_kf=5.0, shot_trans_max_seconds_per_kf=100)
    st2 = load(EncodeState(), frames, fps=1.0, settings=s2)
    starts2 = [k.start_frame for k in st2.keyframes]
    assert starts2 == [0, 10] or 10 in starts2

    # max-seconds rule forces periodic keyframes on a static clip
    s3 = EncoderSettings(shot_trans_max_seconds_per_kf=0.5, shot_trans_min_seconds_per_kf=0.0)
    static = np.stack([base + (i % 2) for i in range(F)]).astype(np.uint8)
    st3 = load(EncodeState(), static, fps=10.0, settings=s3)
    assert len(st3.keyframes) >= 3


def test_manual_keyframes():
    frames = np.zeros((6, 16, 16, 3), np.uint8)
    st = load(EncodeState(), frames, fps=24.0, settings=EncoderSettings(),
              manual_keyframes=[3])
    assert [k.start_frame for k in st.keyframes] == [0, 3]
    assert st.keyframes[0].end_frame == 2
    assert st.keyframes[1].end_frame == 5


def test_padding_to_tile_grid():
    frames = np.full((2, 10, 13, 3), 200, np.uint8)
    st = load(EncodeState(), frames, fps=24.0, settings=EncoderSettings())
    assert st.width == 16 and st.height == 16
    assert np.asarray(st.frames_rgb)[0, 12, 0, 0] == 0  # zero padding


def test_pipelined_ingest_chunk_jobs_interleave_and_finalize():
    """load(defer=True) must defer the per-piece tile passes into
    run_ingest_chunk jobs (predict_motion interleaves them with its
    motion dispatches), and ensure_ingest must run any remaining jobs
    itself — with results identical to the eager path."""
    rng = np.random.RandomState(5)
    F, H, W = 8, 32, 40
    frames = rng.randint(0, 256, (F, H, W, 3)).astype(np.uint8)
    s = EncoderSettings()

    # eager reference result
    st0 = load(EncodeState(), frames, fps=10.0, settings=s)

    # deferred: multiple pieces and NO tile parts dispatched yet
    st = load(EncodeState(), frames, fps=10.0, settings=s, defer=True)
    if st._ingest_pieces is None:
        return  # piece heuristics made one piece on this geometry
    assert st._ingest_chunk_jobs is not None
    assert st._ingest_pieces[1] == []  # nothing dispatched by load

    # partial interleave (what predict_motion does per piece), then
    # finalize runs the rest; calls are idempotent
    st.run_ingest_chunk(0)
    st.run_ingest_chunk(0)
    n_after_first = len(st._ingest_pieces[1])
    assert n_after_first == 1
    st.ensure_ingest()
    assert st._ingest_chunk_jobs is None
    assert np.array_equal(np.asarray(st.tiles_canon),
                          np.asarray(st0.tiles_canon))
    assert np.array_equal(st.tilemap.hmirror, st0.tilemap.hmirror)
    assert np.allclose(st.correlations, st0.correlations)
    assert [k.start_frame for k in st.keyframes] == [
        k.start_frame for k in st0.keyframes]


def test_pipelined_ingest_eager_env_matches(monkeypatch):
    """TILER_TPU_INGEST_EAGER=1 (the r3 dispatch-order profiling hook)
    must produce identical state."""
    rng = np.random.RandomState(6)
    frames = rng.randint(0, 256, (8, 32, 40, 3)).astype(np.uint8)
    s = EncoderSettings()
    st0 = load(EncodeState(), frames, fps=10.0, settings=s, defer=True)
    st0.ensure_ingest()
    monkeypatch.setenv("TILER_TPU_INGEST_EAGER", "1")
    st1 = load(EncodeState(), frames, fps=10.0, settings=s, defer=True)
    st1.ensure_ingest()
    assert np.array_equal(np.asarray(st0.tiles_canon),
                          np.asarray(st1.tiles_canon))
    assert np.allclose(st0.correlations, st1.correlations)


def test_padding_preserves_memmap_spill(tmp_path):
    """Non-8-multiple dims on a disk-spilled (memmap) frames array must
    pad chunk-wise into another spill memmap, not re-materialize the
    clip in RAM as a plain ndarray (the beyond-RAM videos the spill
    feature exists for; checkpoint sidecars also key on the subclass)."""
    from tiler_tpu.utils.spill import spill_memmap

    F, H, W = 4, 30, 44  # not multiples of 8
    src = spill_memmap((F, H, W, 3))
    rng = np.random.RandomState(2)
    src[:] = rng.randint(0, 256, (F, H, W, 3))
    s = EncoderSettings()
    st = load(EncodeState(), src, fps=10.0, settings=s)
    st.ensure_ingest()
    assert st.tilemap_h == 4 and st.tilemap_w == 6
    # frames either stayed device-side (small clip fits HBM budget) or,
    # if host-resident, must still be memmap-backed
    if isinstance(st.frames_rgb, np.ndarray):
        assert isinstance(st.frames_rgb, np.memmap)
    # padded content matches the eager ndarray path bit for bit
    st2 = load(EncodeState(), np.asarray(src).copy(), fps=10.0, settings=s)
    st2.ensure_ingest()
    assert np.array_equal(np.asarray(st.tiles_canon),
                          np.asarray(st2.tiles_canon))

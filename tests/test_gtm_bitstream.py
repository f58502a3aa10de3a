"""GTM bitstream round-trip and conformance-oracle tests.

The writer must produce files that (a) re-import losslessly through
GTMReader (ReloadGTM parity) and (b) decode pixel-exactly through
GTMDecoder, which replicates gtm.player.js playback semantics. Golden
checks parse the committed reference demo streams (lc=8 LZMA, decoded by
the pure-Python fallback)."""
import os

import numpy as np
import pytest

from tiler_tpu.bitstream import lzma_codec
from tiler_tpu.bitstream.gtm import (
    GTM_COMMANDS,
    FrameCommands,
    GTMDecoder,
    GTMReader,
    GTMWriter,
    parse_header,
)

DEMO = "/root/reference/docs/demo/city_cif.gtm"
DEMO2 = "/root/reference/docs/demo/football_cif.gtm"


def _mk_scene(seed=7):
    rng = np.random.RandomState(seed)
    tw, th = 10, 6
    n = tw * th
    T, P, S = 6, 3, 16
    tiles = rng.randint(0, S, size=(T, 8, 8)).astype(np.uint8)
    use_counts = np.array([9, 7, 4, 2, 1, 1])
    palettes = rng.randint(0, 256, size=(P, S, 3)).astype(np.uint8)

    def frame(**kw):
        base = dict(
            tile_idx=np.zeros(n, np.int64),
            pal_idx=np.zeros(n, np.int64),
            predicted=np.zeros(n, bool),
            pred_x=np.zeros(n, np.int32),
            pred_y=np.zeros(n, np.int32),
            hmirror=np.zeros(n, bool),
            vmirror=np.zeros(n, bool),
        )
        base.update(kw)
        return FrameCommands(**base)

    f0 = frame(
        tile_idx=rng.randint(0, T, n),
        pal_idx=rng.randint(0, P, n),
        hmirror=rng.rand(n) < 0.5,
        vmirror=rng.rand(n) < 0.5,
    )
    # frame 1: a smoothed run of 5 (-> SkipBlock), short offsets, and a
    # long offset (|off|>31) at cell (y=5,x=0) whose source stays in-frame
    pred = np.zeros(n, bool)
    predx = np.zeros(n, np.int32)
    predy = np.zeros(n, np.int32)
    pred[0:5] = True  # smoothed run of 5
    pred[12] = True
    predx[12], predy[12] = 8, -8  # short offsets (cell (1,2): src (16+8, 8-8))
    pred[13] = True
    predx[13], predy[13] = -8, 8
    c = 5 * tw + 0  # cell (5,0): ys=40,xs=0; long offset
    pred[c] = True
    predx[c], predy[c] = 40, -40
    f1 = frame(
        tile_idx=rng.randint(0, T, n),
        pal_idx=rng.randint(0, P, n),
        predicted=pred,
        pred_x=predx,
        pred_y=predy,
        hmirror=rng.rand(n) < 0.5,
    )
    # frame 2: smoothed run of 3 (below min -> individual predicted cells)
    pred2 = np.zeros(n, bool)
    pred2[0:3] = True
    f2 = frame(
        tile_idx=rng.randint(0, T, n),
        pal_idx=rng.randint(0, P, n),
        predicted=pred2,
    )
    return tw, th, tiles, use_counts, palettes, [f0, f1, f2]


def _render_expected(tw, th, tiles, palettes, frames):
    """Independent renderer for expected decoder output (RGBA)."""
    H, W = th * 8, tw * 8
    prev = np.zeros((H, W, 4), np.uint8)
    prev[..., 3] = 255
    out = []
    cur = prev.copy()
    for fr in frames:
        nxt = np.zeros_like(cur)
        nxt[..., 3] = 255
        for ci in range(tw * th):
            y, x = divmod(ci, tw)
            ys, xs = y * 8, x * 8
            if fr.predicted[ci]:
                sy, sx = ys + int(fr.pred_y[ci]), xs + int(fr.pred_x[ci])
                nxt[ys : ys + 8, xs : xs + 8] = cur[sy : sy + 8, sx : sx + 8]
            else:
                t = tiles[int(fr.tile_idx[ci])]
                if fr.hmirror[ci]:
                    t = t[:, ::-1]
                if fr.vmirror[ci]:
                    t = t[::-1, :]
                pal = palettes[int(fr.pal_idx[ci])]
                nxt[ys : ys + 8, xs : xs + 8, :3] = pal[t]
        out.append(nxt)
        cur = nxt
    return out


def test_writer_decoder_pixel_exact(tmp_path):
    tw, th, tiles, uc, palettes, frames = _mk_scene()
    w = GTMWriter(tw, th, fps=25.0, palette_size=16, settings_text="[Test]\nA=1\n")
    path = tmp_path / "t.gtm"
    stats = w.write(path, tiles, uc, palettes, frames, keyframe_end=[False, True, True])
    assert stats.total_bytes == os.path.getsize(path)
    assert len(stats.keyframes) == 2

    dec = GTMDecoder(str(path))
    got = dec.decode_frames()
    expected = _render_expected(tw, th, tiles, palettes, frames)
    assert len(got) == 3
    for i, (g, e) in enumerate(zip(got, expected)):
        assert np.array_equal(g, e), f"frame {i} mismatch"


def test_parallel_kf_compression_byte_identical(tmp_path, monkeypatch):
    """The multi-core per-KF LZMA thread pool must produce the same bytes
    as the serial path. The bench host has one core, so the pool branch
    only ever runs on multi-core machines — force it here."""
    import os as _os

    tw, th, tiles, uc, palettes, frames = _mk_scene(seed=5)
    kf_end = [True, True, True]  # 3 KFs -> 3 streams for the pool

    def emit():
        w = GTMWriter(tw, th, fps=25.0, palette_size=16, settings_text="s")
        p = tmp_path / f"kf{_os.cpu_count()}.gtm"
        w.write(p, tiles, uc, palettes, frames, keyframe_end=kf_end)
        return open(p, "rb").read()

    serial = emit()
    monkeypatch.setattr(_os, "cpu_count", lambda: 4)
    parallel = emit()
    assert serial == parallel
    assert len(GTMDecoder(parallel).decode_frames()) == 3


def test_writer_reader_roundtrip(tmp_path):
    tw, th, tiles, uc, palettes, frames = _mk_scene(seed=11)
    w = GTMWriter(tw, th, fps=30.0, palette_size=16, settings_text="s")
    path = tmp_path / "t.gtm"
    w.write(path, tiles, uc, palettes, frames, keyframe_end=[True, False, True])
    g = GTMReader.read(str(path))
    assert g.width == tw * 8 and g.height == th * 8
    assert abs(g.fps - 30.0) < 0.01
    assert g.settings_text == "s"
    assert g.palette_size == 16
    assert np.array_equal(g.palettes_rgb, palettes)
    assert g.keyframe_end == [True, False, True]
    # non-intra tiles preserved verbatim in the TileSet
    n_reused = int(np.sum(uc > 1))
    assert np.array_equal(g.tiles_pal[:n_reused], tiles[:n_reused])
    for fi, fr in enumerate(frames):
        rf = g.frames[fi]
        assert np.array_equal(rf.predicted, fr.predicted)
        pm = fr.predicted
        assert np.array_equal(rf.pred_x[pm], fr.pred_x[pm])
        assert np.array_equal(rf.pred_y[pm], fr.pred_y[pm])
        em = ~pm
        assert np.array_equal(rf.pal_idx[em], fr.pal_idx[em])
        assert np.array_equal(rf.hmirror[em], fr.hmirror[em])
        assert np.array_equal(rf.vmirror[em], fr.vmirror[em])
        # tile CONTENT matches even when intra slots renumber
        got_tiles = g.tiles_pal[rf.tile_idx[em]]
        want_tiles = tiles[fr.tile_idx[em]]
        assert np.array_equal(got_tiles, want_tiles)


def test_skipblock_rle_boundaries(tmp_path):
    # runs of exactly 3 (no skip), 4 (skip), and full-frame smoothing
    tw, th = 8, 8
    n = tw * th
    tiles = np.zeros((1, 8, 8), np.uint8)
    uc = np.array([n * 2])
    palettes = np.zeros((1, 16, 3), np.uint8)

    def fr(predmask):
        return FrameCommands(
            tile_idx=np.zeros(n, np.int64),
            pal_idx=np.zeros(n, np.int64),
            predicted=predmask,
            pred_x=np.zeros(n, np.int32),
            pred_y=np.zeros(n, np.int32),
            hmirror=np.zeros(n, bool),
            vmirror=np.zeros(n, bool),
        )

    full = np.ones(n, bool)
    f0 = fr(np.zeros(n, bool))
    f1 = fr(full)  # one big skip
    mask = np.zeros(n, bool)
    mask[10:13] = True  # 3 -> individual
    mask[20:24] = True  # 4 -> one skip
    f2 = fr(mask)
    w = GTMWriter(tw, th, 24.0, 16)
    path = tmp_path / "s.gtm"
    w.write(path, tiles, uc, palettes, [f0, f1, f2], [False, False, True])
    g = GTMReader.read(str(path))
    assert np.array_equal(g.frames[1].predicted, full)
    assert np.array_equal(g.frames[2].predicted, mask)
    # decoder agrees
    frames = GTMDecoder(str(path)).decode_frames()
    assert len(frames) == 3
    assert np.array_equal(frames[1], frames[0])


@pytest.mark.skipif(not os.path.exists(DEMO), reason="reference demos not present")
def test_demo_headers_match_baseline():
    h = parse_header(open(DEMO, "rb").read(40 + 28 * 4))
    assert (h["width"], h["height"]) == (352, 288)
    assert h["frame_count"] == 300 and h["kf_count"] == 1
    assert h["avg_bytes_per_sec"] == 319585  # BASELINE.md
    h2 = parse_header(open(DEMO2, "rb").read(40 + 28 * 4))
    assert h2["frame_count"] == 260 and h2["kf_count"] == 3
    assert h2["avg_bytes_per_sec"] == 345663


@pytest.mark.skipif(not os.path.exists(DEMO), reason="reference demos not present")
def test_demo_stream_prologue_decodes():
    """Decode the first few KB of the lc=8 demo stream with the pure-Python
    LZMA fallback and verify the command prologue structure."""
    from tiler_tpu.bitstream import lzma_py

    raw = open(DEMO, "rb").read()
    h = parse_header(raw[: 40 + 28])
    payload, _ = lzma_py.decompress_stream(raw, h["whole_header_size"], max_out=8192)
    # ExtendedCommand(settings)
    word = int.from_bytes(payload[0:2], "little")
    assert word & 15 == GTM_COMMANDS.ExtendedCommand and word >> 4 == 0
    slen = int.from_bytes(payload[2:6], "little")
    settings = payload[6 : 6 + slen].decode("latin1")
    assert "PaletteSize=16" in settings
    p = 6 + slen
    # SetDimensions
    word = int.from_bytes(payload[p : p + 2], "little")
    assert word & 15 == GTM_COMMANDS.SetDimensions
    tw = int.from_bytes(payload[p + 2 : p + 4], "little")
    th = int.from_bytes(payload[p + 4 : p + 6], "little")
    assert (tw, th) == (44, 36)  # 352x288 / 8


def test_lzma_alone_container_shape():
    blob = lzma_codec.compress(b"x" * 1000)
    # props byte self-describing, 8x0xFF unknown-size field (extern.pas:427-435)
    # native codec: lc=8 (reference parity); stdlib fallback clamps to lc=4
    assert blob[0] in ((2 * 5 + 0) * 9 + 8, (2 * 5 + 0) * 9 + 4)
    assert blob[5:13] == b"\xff" * 8
    outs = lzma_codec.split_streams(blob + lzma_codec.compress(b"y" * 10))
    assert outs == [b"x" * 1000, b"y" * 10]

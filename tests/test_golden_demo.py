"""Golden conformance against the committed reference demo streams
(the de-facto conformance suite, SURVEY.md section 4): full lc=8 LZMA
decode, command-stream re-import, pixel decode, and a re-serialization
round-trip through OUR writer that must decode pixel-identically."""
import os

import numpy as np
import pytest

from tiler_tpu import native
from tiler_tpu.bitstream.gtm import GTMDecoder, GTMReader, GTMWriter, parse_header

DEMO = "/root/reference/docs/demo/football_cif.gtm"

pytestmark = pytest.mark.skipif(
    not os.path.exists(DEMO) or not native.available(),
    reason="reference demos or native codec unavailable",
)


@pytest.fixture(scope="module")
def demo():
    g = GTMReader.read(DEMO)
    frames = GTMDecoder(DEMO).decode_frames()
    return g, frames


def test_demo_reimport_structure(demo):
    g, frames = demo
    assert (g.width, g.height) == (352, 288)
    assert len(g.frames) == 260
    assert len(frames) == 260
    assert g.palette_size == 16
    assert g.keyframe_end.count(True) == 3
    assert "PaletteCount" in g.settings_text
    # tilemaps complete: every cell predicted or tiled
    for fr in g.frames[:5]:
        assert np.all(fr.predicted | (fr.tile_idx >= 0))


def test_demo_frames_look_like_video(demo):
    g, frames = demo
    arr = np.stack(frames[:20])[..., :3].astype(np.float64)
    # non-degenerate content, and consecutive frames correlated
    assert arr.std() > 20
    d01 = np.abs(arr[1:] - arr[:-1]).mean()
    assert d01 < 30, "consecutive decoded frames wildly different"


def test_reserialize_roundtrip_pixel_exact(demo):
    """Read the reference-encoded stream, re-emit it with OUR writer
    (+ our lc=8 LZMA encoder), and require pixel-identical playback."""
    g, frames = demo
    # use counts implied by the stream: TileSet tiles are reused (>1),
    # intra slots single-use; reconstruct counts from the tilemaps
    n_tiles = len(g.tiles_pal)
    use = np.zeros(n_tiles, np.int64)
    for fr in g.frames:
        m = fr.tile_idx >= 0
        np.add.at(use, fr.tile_idx[m], 1)
    # preserve the original TileSet/intra split: tiles the reference put in
    # the TileSet keep use>=2 semantics; everything at index >= tile_count
    # was intra (use forced to 1)
    use[: g.tileset_count] = np.maximum(use[: g.tileset_count], 2)
    use[g.tileset_count :] = 1

    import io

    buf = io.BytesIO()
    w = GTMWriter(g.tilemap_w, g.tilemap_h, g.fps, g.palette_size,
                  settings_text=g.settings_text)
    w.write(buf, g.tiles_pal, use, g.palettes_rgb, g.frames, g.keyframe_end)
    ours = buf.getvalue()

    h = parse_header(ours)
    assert h["frame_count"] == 260 and h["kf_count"] == 3

    ours_frames = GTMDecoder(ours).decode_frames()
    assert len(ours_frames) == len(frames)
    for i in (0, 1, 50, 130, 259):
        assert np.array_equal(ours_frames[i], frames[i]), f"frame {i}"
    # full sweep
    for i, (a, b) in enumerate(zip(ours_frames, frames)):
        assert np.array_equal(a, b), f"frame {i}"


def test_native_compression_competitive():
    """Our lc=8 encoder should land in the same ballpark as the reference's
    compressed sizes on the same payload."""
    raw = open(DEMO, "rb").read()
    h = parse_header(raw)
    payload, used = native.lzma_decompress_stream(raw, h["whole_header_size"])
    ref_size = h["keyframes"][0]["compressed_size"]
    ours = native.lzma_compress(payload, lc=8)
    ratio = len(ours) / ref_size
    assert ratio < 1.35, f"our stream {len(ours)} vs reference {ref_size} ({ratio:.2f}x)"


def test_city_demo_full_roundtrip():
    """Second golden stream (city_cif: 300 frames, single keyframe,
    91k-tile TileSet): full decode + re-serialization round-trip."""
    import io

    city = "/root/reference/docs/demo/city_cif.gtm"
    if not os.path.exists(city):
        pytest.skip("no city demo")
    g = GTMReader.read(city)
    frames = GTMDecoder(city).decode_frames()
    assert len(frames) == 300 and len(g.frames) == 300
    n_tiles = len(g.tiles_pal)
    use = np.zeros(n_tiles, np.int64)
    for fr in g.frames:
        m = fr.tile_idx >= 0
        np.add.at(use, fr.tile_idx[m], 1)
    use[: g.tileset_count] = np.maximum(use[: g.tileset_count], 2)
    use[g.tileset_count :] = 1
    buf = io.BytesIO()
    w = GTMWriter(g.tilemap_w, g.tilemap_h, g.fps, g.palette_size,
                  settings_text=g.settings_text)
    stats = w.write(buf, g.tiles_pal, use, g.palettes_rgb, g.frames, g.keyframe_end)
    ours = GTMDecoder(buf.getvalue()).decode_frames()
    for i in (0, 1, 150, 299):
        assert np.array_equal(ours[i], frames[i]), f"frame {i}"
    # our re-encode of the same content should not be much larger than the
    # reference's stream (0.996x LZMA + identical commands)
    ref_size = os.path.getsize(city)
    assert stats.total_bytes < ref_size * 1.02, (stats.total_bytes, ref_size)

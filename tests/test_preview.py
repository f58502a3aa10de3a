"""HTTP preview server: the GUI-replacement inspection surface
(main.pas:15-163 preview pages served over stdlib http.server)."""
import json
import urllib.request

import numpy as np
import pytest

from tiler_tpu.config import EncoderSettings
from tiler_tpu.pipeline.encoder import Encoder
from tiler_tpu.preview import PreviewServer, preview_gtm


def _clip(F=6, H=32, W=40):
    yy, xx = np.mgrid[0:H, 0:W]
    bg = np.stack([(yy * 255 // H), (xx * 255 // W), (xx * 0)], -1)
    frames = []
    for f in range(F):
        img = bg.copy()
        img[4 + f : 12 + f, 6 + f : 14 + f] = [200, 30, 30]
        frames.append(img.astype(np.uint8))
    return np.stack(frames)


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pv") / "out.gtm")
    enc = Encoder(
        EncoderSettings(palette_count=4, palette_size=16,
                        motion_predict_radius=4,
                        global_tiling_quality_based_tile_count=2.0,
                        epu_knn_k=4, kmeans_iters=4),
        log=lambda *a: None,
    )
    enc.run_all(_clip(), fps=25.0, out_path=path)
    srv = PreviewServer(enc.state, port=0)  # ephemeral port
    srv.start_background()
    yield srv, path, enc
    srv.shutdown()


def _get(srv, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{srv.port}{path}", timeout=10
    ) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_info_json(served):
    srv, _, enc = served
    code, ctype, body = _get(srv, "/info.json")
    assert code == 200 and ctype == "application/json"
    info = json.loads(body)
    assert info["frames"] == 6
    assert info["width"] == 40 and info["height"] == 32
    assert info["pages"] == ["input", "output", "tiles", "palettes"]
    assert len(info["psnr"]) == 6 and info["psnr"][0] > 10.0
    assert info["keyframes"][0]["start"] == 0


def test_render_pages_are_pngs(served):
    srv, _, _ = served
    for page in ("input", "output", "tiles", "palettes"):
        code, ctype, body = _get(srv, f"/render/{page}/2.png")
        assert code == 200 and ctype == "image/png", page
        assert body[:8] == b"\x89PNG\r\n\x1a\n", page


def test_output_page_matches_decoder(served):
    """The served output page IS the decoded stream frame."""
    srv, path, _ = served
    from tiler_tpu.bitstream.gtm import GTMDecoder
    from PIL import Image
    import io as _io

    _, _, body = _get(srv, "/render/output/3.png")
    img = np.asarray(Image.open(_io.BytesIO(body)))
    dec = np.stack(GTMDecoder(path).decode_frames())[3][..., :3]
    assert np.array_equal(img, dec)


def test_index_page(served):
    srv, _, _ = served
    code, ctype, body = _get(srv, "/")
    assert code == 200 and b"tiler-tpu preview" in body


def test_preview_from_gtm_reload(served, tmp_path):
    """preview_gtm serves a frame-less reloaded stream (no input page)."""
    _, path, _ = served
    srv2 = preview_gtm(path, port=0)
    srv2.start_background()
    try:
        _, _, body = _get(srv2, "/info.json")
        info = json.loads(body)
        assert info["frames"] == 6
        assert "input" not in info["pages"]
        code, ctype, _ = _get(srv2, "/render/output/5.png")
        assert code == 200 and ctype == "image/png"
    finally:
        srv2.shutdown()


def test_inspect_output_cell(served):
    srv, _, enc = served
    code, _, body = _get(srv, "/inspect.json?page=output&frame=0&x=9&y=17")
    assert code == 200
    d = json.loads(body)
    tm = enc.state.tilemap
    tw = enc.state.tilemap_w
    n = (17 // 8) * tw + (9 // 8)
    assert d["cell"] == n
    assert d["tile"] == int(tm.tile_idx[0, n])
    assert d["palette"] == int(tm.pal_idx[0, n])
    assert d["predicted"] == bool(tm.predicted[0, n])
    if d["tile"] >= 0:
        assert d["tile_uses"] >= 1
    assert "cell_psnr_db" in d


def test_inspect_tiles_and_palettes(served):
    srv, _, enc = served
    code, _, body = _get(srv, "/inspect.json?page=tiles&frame=0&x=8&y=0")
    d = json.loads(body)
    assert code == 200 and d.get("tile") == 1 and "uses" in d
    code, _, body = _get(srv, "/inspect.json?page=palettes&frame=0&x=17&y=9")
    d = json.loads(body)
    assert code == 200 and d["palette"] == 1 and d["color"] == 2
    pal = np.asarray(enc.state.palettes_rgb)[1, 2]
    assert d["rgb"] == "#%02x%02x%02x" % tuple(int(v) for v in pal)


def test_inspect_out_of_range_is_empty(served):
    srv, _, _ = served
    code, _, body = _get(srv, "/inspect.json?page=output&frame=0&x=9999&y=0")
    assert code == 200 and json.loads(body) == {}


def test_index_has_playback_and_hover(served):
    srv, _, _ = served
    code, _, body = _get(srv, "/")
    html = body.decode()
    assert code == 200
    assert "setInterval" in html and "inspect.json" in html

"""End-to-end slice: synthetic clip -> full 8-step pipeline -> .gtm ->
pixel decode (JS-decoder-semantics oracle) -> quality sanity."""
import numpy as np
import pytest

from tiler_tpu.config import EncoderSettings
from tiler_tpu.pipeline.encoder import Encoder
from tiler_tpu.bitstream.gtm import GTMDecoder, GTMReader


def synthetic_clip(F=10, H=48, W=64, seed=3):
    """Moving blocks over a gradient; motion-predictable, palettizable."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    bg = np.stack([
        (yy * 255 // H), (xx * 255 // W), ((yy + xx) * 255 // (H + W))
    ], -1).astype(np.uint8)
    frames = []
    for f in range(F):
        img = bg.copy()
        # moving square
        x0 = (4 + 3 * f) % (W - 16)
        y0 = (6 + 2 * f) % (H - 16)
        img[y0 : y0 + 16, x0 : x0 + 16] = [220, 40, 40]
        img[y0 + 4 : y0 + 12, x0 + 4 : x0 + 12] = [40, 220, 40]
        frames.append(img)
    return np.stack(frames)


def _settings():
    return EncoderSettings(
        palette_count=8,
        palette_size=16,
        motion_predict_radius=8,
        global_tiling_quality_based_tile_count=2.0,
        epu_knn_k=8,
        kmeans_iters=8,
    )


def _psnr_rgb(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255 * 255 / max(mse, 1e-9))


@pytest.fixture(scope="module")
def encoded(tmp_path_factory):
    path = tmp_path_factory.mktemp("e2e") / "out.gtm"
    clip = synthetic_clip()
    enc = Encoder(_settings(), log=lambda *a: None)
    enc.run_all(clip, fps=25.0, out_path=str(path))
    return clip, enc, str(path)


def test_pipeline_produces_playable_stream(encoded):
    clip, enc, path = encoded
    dec = GTMDecoder(path)
    frames = dec.decode_frames()
    assert len(frames) == len(clip)
    assert frames[0].shape == (48, 64, 4)
    # lossy, but should be clearly recognizable
    p = _psnr_rgb(np.stack(frames)[..., :3], clip)
    assert p > 20.0, f"decoded PSNR too low: {p:.2f} dB"


def test_decoded_matches_encoder_reconstruction(encoded):
    """The decoder's output must match the encoder's own reconstruction
    model: re-render from state and compare to the decoded stream."""
    clip, enc, path = encoded
    frames = GTMDecoder(path).decode_frames()
    st = enc.state
    # re-render frame 0 from state (all cells are tile commands on KF start)
    tm = st.tilemap
    pal = st.palettes_rgb
    pp = st.corpus_pal_pixels
    th, tw = st.tilemap_h, st.tilemap_w
    out = np.zeros((st.height, st.width, 3), np.uint8)
    for c in range(st.tilemap_size):
        y, x = divmod(c, tw)
        assert not tm.predicted[0, c]  # keyframe start: no prediction
        t = pp[tm.tile_idx[0, c]]
        if tm.hmirror[0, c]:
            t = t[:, ::-1]
        if tm.vmirror[0, c]:
            t = t[::-1]
        out[y * 8 : y * 8 + 8, x * 8 : x * 8 + 8] = pal[tm.pal_idx[0, c]][t]
    assert np.array_equal(frames[0][..., :3], out)


def test_stream_reimports(encoded):
    clip, enc, path = encoded
    g = GTMReader.read(path)
    assert g.width == 64 and g.height == 48
    assert len(g.frames) == len(clip)
    assert g.palette_size == 16
    assert "PaletteSize=16" in g.settings_text
    assert abs(g.fps - 25.0) < 0.01


def test_psnr_stats_populated(encoded):
    clip, enc, path = encoded
    # PSNR-HVS (weighted-DCT domain, by tile) at these low-quality settings
    assert enc.state.total_psnr > 15.0
    assert len(enc.state.kf_psnr) == len(enc.state.keyframes)
    assert enc.stats.total_bytes > 0


def test_motion_reduces_second_frame_cost(encoded):
    """Most cells of non-keyframe frames should be motion-predicted on this
    trivially predictable clip."""
    clip, enc, path = encoded
    tm = enc.state.tilemap
    pred_frac = tm.predicted[1:].mean()
    assert pred_frac > 0.5, f"only {pred_frac:.0%} predicted"


def test_checkpoint_roundtrip(tmp_path, encoded):
    clip, enc, path = encoded
    ck = tmp_path / "enc.ckpt"
    enc.save_checkpoint(str(ck))
    enc2 = Encoder.load_checkpoint(str(ck), log=lambda *a: None)
    assert enc2.state.n_frames == enc.state.n_frames
    out2 = tmp_path / "again.gtm"
    enc2.save(str(out2))
    assert open(path, "rb").read() == open(str(out2), "rb").read()


def test_reload_gtm_roundtrip(encoded, tmp_path):
    """ReloadGTM parity: re-import an encoded stream into encoder state and
    re-render; must match the decoder. Mismatched video must raise."""
    import pytest
    from tiler_tpu.pipeline.encoder import Encoder, GTMReloadError
    from tiler_tpu import render

    clip, enc, path = encoded
    enc2 = Encoder(_settings(), log=lambda *a: None)
    enc2.reload_gtm(path)
    # n_frames means LOADED SOURCE frames ("video loaded?"); the
    # stream's content frame count is preview.content_frames
    from tiler_tpu.preview import content_frames

    assert enc2.state.n_frames == 0
    assert content_frames(enc2.state) == len(clip)
    assert enc2.state.frames_rgb is None
    # a second reload on the same video-less encoder must not validate
    # against the first stream's dimensions
    enc2.reload_gtm(path)
    assert len(enc2.state.keyframes) >= 1
    out0 = render.render_output(enc2.state, 0)
    frames = GTMDecoder(path).decode_frames()
    assert np.array_equal(out0, frames[0][..., :3])

    enc3 = Encoder(_settings(), log=lambda *a: None)
    enc3.load_frames(clip[:3], fps=25.0)  # wrong frame count
    with pytest.raises(GTMReloadError):
        enc3.reload_gtm(path)


def test_yliluoma_pipeline(tmp_path):
    """e2e with the Yliluoma2 ditherer (DitheringUseThomasKnoll=0 path)."""
    s = _settings()
    s.dithering_use_thomas_knoll = False
    s.dithering_yliluoma2_mixed_colors = 4
    clip = synthetic_clip(F=4)
    enc = Encoder(s, log=lambda *a: None)
    p = tmp_path / "yli.gtm"
    enc.run_all(clip, fps=24.0, out_path=str(p))
    frames = GTMDecoder(str(p)).decode_frames()
    assert len(frames) == 4
    assert _psnr_rgb(np.stack(frames)[..., :3], clip) > 18.0


def test_wavelet_dither_mode(tmp_path):
    """e2e with pvsWavelets dithering features (palettization mode)."""
    s = _settings()
    s.dithering_mode = "wavelets"
    clip = synthetic_clip(F=3)
    enc = Encoder(s, log=lambda *a: None)
    p = tmp_path / "wav.gtm"
    enc.run_all(clip, fps=24.0, out_path=str(p))
    assert len(GTMDecoder(str(p)).decode_frames()) == 3


def test_no_motion_radius_zero(tmp_path):
    """radius 0 disables prediction entirely (PredictMotion early-out,
    tilingencoder.pas:1972; Reconstruct ARadius<0 gate :1437)."""
    s = _settings()
    s.motion_predict_radius = 0
    clip = synthetic_clip(F=3)
    enc = Encoder(s, log=lambda *a: None)
    p = tmp_path / "nomotion.gtm"
    enc.run_all(clip, fps=24.0, out_path=str(p))
    assert not enc.state.tilemap.predicted.any()
    assert len(GTMDecoder(str(p)).decode_frames()) == 3


def test_target_psnr_mode(tmp_path):
    """GlobalTilingUseTargetPSNR drives the threshold directly
    (Reduce, tilingencoder.pas:1915-1918)."""
    s = _settings()
    s.global_tiling_use_target_psnr = True
    s.global_tiling_target_psnr = 30.0
    clip = synthetic_clip(F=4)
    enc = Encoder(s, log=lambda *a: None)
    p = tmp_path / "tpsnr.gtm"
    enc.run_all(clip, fps=24.0, out_path=str(p))
    assert len(GTMDecoder(str(p)).decode_frames()) == 4


def test_host_resident_streaming_mode(tmp_path):
    """Videos beyond the HBM budget keep frames/tiles in host RAM and
    stream per chunk / per keyframe; output must match the device-resident
    encode byte for byte."""
    clip = synthetic_clip(F=6)
    p1 = tmp_path / "dev.gtm"
    enc1 = Encoder(_settings(), log=lambda *a: None)
    enc1.run_all(clip, fps=24.0, out_path=str(p1))

    s2 = _settings()
    s2.hbm_frames_budget = 1  # force host-resident
    p2 = tmp_path / "host.gtm"
    enc2 = Encoder(s2, log=lambda *a: None)
    enc2.run_all(clip, fps=24.0, out_path=str(p2))
    assert open(p1, 'rb').read() == open(p2, 'rb').read()


def test_disk_spill_mode(tmp_path):
    """Videos beyond host_ram_budget spill canonical tiles to an unlinked
    temp-file memmap (utils/spill.py); output must match the in-RAM host
    encode byte for byte, and checkpoints must sidecar the memmap instead
    of materializing it."""
    clip = synthetic_clip(F=6)
    p1 = tmp_path / "ram.gtm"
    s1 = _settings()
    s1.hbm_frames_budget = 1
    enc1 = Encoder(s1, log=lambda *a: None)
    enc1.run_all(clip, fps=24.0, out_path=str(p1))

    s2 = _settings()
    s2.hbm_frames_budget = 1  # host-resident...
    s2.host_ram_budget = 1  # ...and beyond the host budget too
    p2 = tmp_path / "spill.gtm"
    enc2 = Encoder(s2, log=lambda *a: None)
    enc2.run_all(clip, fps=24.0, out_path=str(p2))
    assert isinstance(enc2.state.tiles_canon, np.memmap)
    # the embedded settings text differs (HostRamBudget is an INI field),
    # so compare decoded pixels + stream structure, not raw bytes
    f1 = np.stack(GTMDecoder(str(p1)).decode_frames())
    f2 = np.stack(GTMDecoder(str(p2)).decode_frames())
    assert np.array_equal(f1, f2)
    g1, g2 = GTMReader.read(str(p1)), GTMReader.read(str(p2))
    assert np.array_equal(g1.tiles_pal, g2.tiles_pal)
    assert np.array_equal(g1.palettes_rgb, g2.palettes_rgb)

    # frames arriving memmap-backed (the _FrameSink spill path) must
    # STAY memmaps through load (np.ascontiguousarray strips the
    # subclass — regression: checkpoint would pickle them into RAM)
    from tiler_tpu.io import export, video

    y4m = tmp_path / "clip.y4m"
    export.write_y4m(str(y4m), clip, fps=24.0)
    spilled_frames, _ = video.load_y4m(str(y4m), spill_budget=1)
    assert isinstance(spilled_frames, np.memmap)
    enc_f = Encoder(s2, log=lambda *a: None)
    enc_f.load_frames(spilled_frames, fps=24.0)
    assert isinstance(enc_f.state.frames_rgb, np.memmap)

    # checkpoint: memmap fields go to a sidecar .npy, the live encoder
    # keeps its memmap, and the reload re-maps instead of loading
    ck = tmp_path / "spill.ckpt"
    enc2.save_checkpoint(str(ck))
    assert isinstance(enc2.state.tiles_canon, np.memmap)
    assert (tmp_path / "spill.ckpt.tiles_canon.npy").exists()
    enc3 = Encoder.load_checkpoint(str(ck), log=lambda *a: None)
    assert isinstance(enc3.state.tiles_canon, np.memmap)
    p3 = tmp_path / "resumed.gtm"
    enc3.save(str(p3))
    assert open(p2, "rb").read() == open(p3, "rb").read()


def test_phase_b_research_mode(tmp_path, encoded):
    """Reference-parity phase-B mode: full-radius motion re-search against
    the reconstruction (tilingencoder.pas:1496-1532) instead of the default
    phase-A vector reuse. Both must produce decodable, recognizable streams
    and mostly-predicted non-KF frames on this trivially predictable clip."""
    clip, enc, path = encoded
    s = _settings()
    s.phase_b_motion = "research"
    enc2 = Encoder(s, log=lambda *a: None)
    p = tmp_path / "research.gtm"
    enc2.run_all(clip, fps=25.0, out_path=str(p))
    frames = GTMDecoder(str(p)).decode_frames()
    assert len(frames) == len(clip)
    assert _psnr_rgb(np.stack(frames)[..., :3], clip) > 20.0
    assert enc2.state.tilemap.predicted[1:].mean() > 0.5


def test_single_frame_video(tmp_path):
    """F=1: no motion prediction possible anywhere; still a valid stream."""
    clip = synthetic_clip(F=1)
    enc = Encoder(_settings(), log=lambda *a: None)
    p = tmp_path / "one.gtm"
    enc.run_all(clip, fps=24.0, out_path=str(p))
    frames = GTMDecoder(str(p)).decode_frames()
    assert len(frames) == 1
    assert not enc.state.tilemap.predicted.any()


def test_two_frame_video(tmp_path):
    clip = synthetic_clip(F=2)
    enc = Encoder(_settings(), log=lambda *a: None)
    p = tmp_path / "two.gtm"
    enc.run_all(clip, fps=24.0, out_path=str(p))
    assert len(GTMDecoder(str(p)).decode_frames()) == 2


def test_palette_count_exceeds_corpus(tmp_path):
    s = _settings()
    s.palette_count = 64  # more palettes than distinct tiles
    s.global_tiling_tile_count = 4
    clip = synthetic_clip(F=3)
    enc = Encoder(s, log=lambda *a: None)
    p = tmp_path / "overpal.gtm"
    enc.run_all(clip, fps=24.0, out_path=str(p))
    assert len(GTMDecoder(str(p)).decode_frames()) == 3

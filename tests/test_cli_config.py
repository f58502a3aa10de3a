"""CLI + settings round-trip tests."""
import numpy as np

from tiler_tpu.config import EncoderSettings, equal_quality_tile_count
from tiler_tpu import cli


def test_ini_roundtrip():
    s = EncoderSettings(palette_count=77, motion_predict_radius=9,
                        dithering_mode="spe_dct", scaling=0.5,
                        global_tiling_use_target_psnr=True)
    text = s.to_ini()
    assert "PaletteCount=77" in text
    s2 = EncoderSettings.from_ini(text)
    assert s2.palette_count == 77
    assert s2.motion_predict_radius == 9
    assert s2.dithering_mode == "spe_dct"
    assert s2.scaling == 0.5
    assert s2.global_tiling_use_target_psnr is True


def test_tpu_knobs_roundtrip_ini():
    """Every output-affecting TPU knob lives in the [TPU] INI section so
    a stream reproduces from its embedded settings (VERDICT r03 #6: env
    flags like EPU_G8 made streams non-reproducible)."""
    s = EncoderSettings(knn_backend="ivf", ivf_probes=16,
                        epu_two_stage=True, epu_pal_k=8,
                        kmeans_iters=12, phase_b_motion="research",
                        lzma_mode="fast", int16_features=True,
                        count_predicted_tiles=True)
    text = s.to_ini()
    assert "[TPU]" in text and "KnnBackend=ivf" in text
    s2 = EncoderSettings.from_ini(text)
    assert s2.knn_backend == "ivf"
    assert s2.ivf_probes == 16
    assert s2.epu_two_stage is True
    assert s2.epu_pal_k == 8
    assert s2.kmeans_iters == 12
    assert s2.phase_b_motion == "research"
    assert s2.lzma_mode == "fast"
    assert s2.int16_features is True
    assert s2.count_predicted_tiles is True


def test_stream_embedded_settings_reproduce_config(tmp_path):
    """The settings text embedded in a written stream parses back to the
    encode's own output-affecting configuration."""
    from tiler_tpu.pipeline.encoder import Encoder
    from tiler_tpu.bitstream.gtm import GTMReader

    rng = np.random.RandomState(3)
    clip = rng.randint(0, 255, (3, 24, 32, 3), dtype=np.uint8)
    s = EncoderSettings(palette_count=4, palette_size=8,
                        motion_predict_radius=2, epu_knn_k=4,
                        kmeans_iters=3, epu_two_stage=True,
                        global_tiling_quality_based_tile_count=2.0)
    p = str(tmp_path / "o.gtm")
    Encoder(s, log=lambda *a: None).run_all(clip, fps=25.0, out_path=p)
    text = GTMReader.read(p).settings_text
    assert text, "stream must embed its settings"
    s2 = EncoderSettings.from_ini(text)
    assert s2.epu_two_stage is True
    assert s2.kmeans_iters == 3
    assert s2.epu_knn_k == 4
    assert s2.palette_count == 4


def test_reads_reference_style_ini(tmp_path):
    # key surface parity with the reference encoder's own settings dumps
    ini = """[Load]
InputFileName=in.y4m
OutputFileName=out.gtm
FrameCount=10
Scaling=1
ShotTransCorrelLoThres=0.7

[MotionPredict]
MotionPredictRadius=16

[Dither]
PaletteSize=16
PaletteCount=128
DitheringMode=4
DitheringUseThomasKnoll=1
"""
    p = tmp_path / "s.ini"
    p.write_text(ini)
    s = EncoderSettings.from_ini(str(p))
    assert s.input_file_name == "in.y4m"
    assert s.frame_count == 10
    assert s.motion_predict_radius == 16
    assert s.palette_count == 128
    assert s.dithering_mode == "weighted_spe_dct"  # mode index 4
    assert s.shot_trans_correl_lo_thres == 0.7


def test_derived_tile_count():
    # GlobalTilingTileCount = quality * sqrt(N) * log2(1+N) (utils.pas:1038)
    s = EncoderSettings(global_tiling_quality_based_tile_count=7.0)
    n = 300 * 1584
    assert s.derived_tile_count(n) == round(7.0 * equal_quality_tile_count(n))
    s2 = EncoderSettings(global_tiling_tile_count=1234)
    assert s2.derived_tile_count(n) == 1234


def test_cli_selftest():
    assert cli.main(["selftest"]) == 0


def test_cli_info_on_demo(capsys):
    import os

    demo = "/root/reference/docs/demo/football_cif.gtm"
    if not os.path.exists(demo):
        return
    assert cli.main(["info", demo]) == 0
    out = capsys.readouterr().out
    assert '"frame_count": 260' in out


def test_cli_encode_decode_roundtrip(tmp_path):
    """CLI end-to-end: y4m in -> encode -> decode -> y4m out."""
    import sys
    sys.path.insert(0, "tests")
    from test_e2e import synthetic_clip
    from tiler_tpu.io.export import write_y4m

    clip = synthetic_clip(F=4)
    src = tmp_path / "in.y4m"
    write_y4m(str(src), clip, fps=24.0)
    out = tmp_path / "out.gtm"
    rc = cli.main([
        "encode", "-i", str(src), "-o", str(out),
        "--palette-count", "8", "--quality", "2", "--radius", "8",
    ])
    assert rc == 0 and out.exists()
    rc = cli.main(["decode", str(out), str(tmp_path / "back.y4m")])
    assert rc == 0 and (tmp_path / "back.y4m").exists()
    rc = cli.main(["info", str(out), "--full"])
    assert rc == 0


def test_cli_step_ranges_with_checkpoints(tmp_path):
    """Run the pipeline in two halves through checkpoints (the GUI's
    start/end step combos, main.pas:406-443)."""
    import sys
    sys.path.insert(0, "tests")
    from test_e2e import synthetic_clip
    from tiler_tpu.io.export import write_y4m

    clip = synthetic_clip(F=4)
    src = tmp_path / "in.y4m"
    write_y4m(str(src), clip, fps=24.0)
    out = tmp_path / "out.gtm"
    ck = tmp_path / "half.ckpt"
    rc = cli.main([
        "encode", "-i", str(src), "-o", str(out),
        "--palette-count", "8", "--quality", "2", "--radius", "8",
        "--steps", "load:prepare_palettes", "--checkpoint", str(ck),
    ])
    assert rc == 0 and ck.exists() and not out.exists()
    rc = cli.main([
        "encode", "--resume", str(ck), "--steps", "dither:save",
    ])
    assert rc == 0 and out.exists()
    from tiler_tpu.bitstream.gtm import GTMDecoder

    assert len(GTMDecoder(str(out)).decode_frames()) == 4


def test_mediancut_quantizer_e2e(tmp_path):
    """color_quantizer="mediancut" (dlquant DL1/DL3 role) produces a
    playable stream end to end."""
    import numpy as np
    from tiler_tpu.bitstream.gtm import GTMDecoder
    from tiler_tpu.config import EncoderSettings
    from tiler_tpu.pipeline.encoder import Encoder

    rng = np.random.RandomState(3)
    base = rng.randint(0, 255, (48, 64, 3)).astype(np.uint8)
    clip = np.stack([np.roll(base, (2 * f, f), (0, 1)) for f in range(4)])
    s = EncoderSettings(
        palette_count=4, motion_predict_radius=4, epu_knn_k=4,
        global_tiling_quality_based_tile_count=2.0, kmeans_iters=4,
        color_quantizer="mediancut",
    )
    out = str(tmp_path / "mc.gtm")
    Encoder(s, log=lambda *a: None).run_all(clip, fps=24.0, out_path=out)
    frames = GTMDecoder(out).decode_frames()
    assert len(frames) == 4


def test_int16_features_and_predicted_tileset_modes(tmp_path):
    """int16_features and count_predicted_tiles flags encode playable
    streams; the parity TileSet accounting never shrinks the stream."""
    import numpy as np
    from tiler_tpu.bitstream.gtm import GTMDecoder
    from tiler_tpu.config import EncoderSettings
    from tiler_tpu.pipeline.encoder import Encoder

    rng = np.random.RandomState(9)
    base = rng.randint(0, 255, (48, 64, 3)).astype(np.uint8)
    clip = np.stack([np.roll(base, (f, 2 * f), (0, 1)) for f in range(5)])

    def enc(**kw):
        s = EncoderSettings(
            palette_count=4, motion_predict_radius=4, epu_knn_k=4,
            global_tiling_quality_based_tile_count=2.0, kmeans_iters=4, **kw,
        )
        out = str(tmp_path / f"m{len(kw)}{list(kw)[0] if kw else 'x'}.gtm")
        e = Encoder(s, log=lambda *a: None).run_all(clip, fps=24.0, out_path=out)
        assert len(GTMDecoder(out).decode_frames()) == 5
        return e.stats.total_bytes, len(e.state.corpus_pal_pixels)

    base_bytes, base_tiles = enc(seed=0x42381337)
    int16_bytes, _ = enc(int16_features=True)
    parity_bytes, parity_tiles = enc(count_predicted_tiles=True)
    # the strict invariant: counting never-emitted (predicted) cells'
    # tiles can only ADD tiles to the TileSet. Byte size is only
    # statistically larger (use counts change the reindex sort order,
    # which can shift LZMA output by a few bytes either way).
    assert parity_tiles >= base_tiles
    assert parity_bytes >= base_bytes - 64
    assert abs(int16_bytes - base_bytes) < 0.2 * base_bytes


def test_cli_mesh_auto_single_device_is_noop(monkeypatch):
    """--mesh auto must be a harmless no-op when only one device is
    visible (VERDICT r2 #7): the Encoder then runs the meshless path."""
    import jax

    from tiler_tpu.pipeline.encoder import Encoder

    monkeypatch.setattr(jax, "device_count", lambda *a, **k: 1)
    enc = Encoder(mesh="auto", log=lambda *a: None)
    assert enc.mesh is None


def test_cli_mesh_auto_multi_device_builds_mesh():
    """On the 8-device CPU mesh, --mesh auto wires a real Mesh with the
    corpus axis used by the sharded KNN/kmeans paths."""
    from tiler_tpu.pipeline.encoder import Encoder

    enc = Encoder(mesh="auto", log=lambda *a: None)
    assert enc.mesh is not None and "corpus" in enc.mesh.axis_names


def test_apply_overrides_shared_helper():
    """The A/B scripts' PB_SETTINGS syntax lives in one place
    (EncoderSettings.apply_overrides): type-coerced, chainable, and a
    typo'd field fails loudly instead of silently measuring baseline."""
    import pytest

    from tiler_tpu.config import EncoderSettings

    s = EncoderSettings().apply_overrides("epu_two_stage=1,epu_knn_k=32")
    assert s.epu_two_stage is True and s.epu_knn_k == 32
    assert EncoderSettings().apply_overrides("") is not None  # empty = no-op
    with pytest.raises(AttributeError):
        EncoderSettings().apply_overrides("no_such_field=1")
    # same bool spellings as from_ini, and values may contain '='
    s = EncoderSettings().apply_overrides("epu_two_stage=true")
    assert s.epu_two_stage is True
    s = EncoderSettings().apply_overrides("epu_two_stage=False")
    assert s.epu_two_stage is False
    s = EncoderSettings().apply_overrides("input_file_name=a=b.y4m")
    assert s.input_file_name == "a=b.y4m"

"""IO tests: Y4M write/read round-trip, image sequences, exports,
median-cut quantizer, least-squares util."""
import numpy as np

from tiler_tpu.io import export, video
from tiler_tpu.cluster.mediancut import median_cut
from tiler_tpu.utils.search import least_squares


def test_y4m_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    # moderate saturation: fully saturated colors clip V at +128 offset,
    # exactly like the reference's writer (tilingencoder.pas:2184-2186)
    frames = rng.randint(48, 208, (5, 32, 48, 3)).astype(np.uint8)
    p = tmp_path / "t.y4m"
    export.write_y4m(str(p), frames, fps=25.0)
    back, fps = video.load_y4m(str(p))
    assert abs(fps - 25.0) < 1e-3
    assert back.shape == frames.shape
    diff = np.abs(back.astype(int) - frames.astype(int))
    assert diff.mean() < 1.5 and diff.max() <= 4


def test_image_sequence(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(1)
    for i in range(4):
        Image.fromarray(rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)).save(
            tmp_path / f"f{i:03d}.png"
        )
    frames, fps = video.load_image_sequence(str(tmp_path / "f%03d.png"))
    assert frames.shape == (4, 16, 16, 3)
    assert fps == 24.0


def test_frame_sink_disk_spill(tmp_path):
    """_FrameSink beyond spill_budget backs its buffer with a temp-file
    memmap (utils/spill.py); content and growth must match the RAM path."""
    rng = np.random.RandomState(2)
    frames = [rng.randint(0, 256, (8, 8, 3)).astype(np.uint8) for _ in range(7)]
    ram = video._FrameSink(capacity_hint=2)
    spilled = video._FrameSink(capacity_hint=2, spill_budget=1)
    for f in frames:
        ram.append(f)
        spilled.append(f)
    assert isinstance(spilled.buf, np.memmap)
    assert np.array_equal(np.asarray(ram.array()), np.asarray(spilled.array()))
    assert np.array_equal(np.asarray(spilled.array()), np.stack(frames))


def test_y4m_spill_budget(tmp_path):
    rng = np.random.RandomState(3)
    frames = rng.randint(16, 240, (5, 16, 16, 3)).astype(np.uint8)
    p = tmp_path / "s.y4m"
    export.write_y4m(str(p), frames, fps=24.0)
    ram, _ = video.load_y4m(str(p))
    spill, _ = video.load_y4m(str(p), spill_budget=1)
    assert isinstance(spill, np.memmap)
    assert np.array_equal(np.asarray(ram), np.asarray(spill))


def test_manual_keyframe_sidecars(tmp_path):
    from PIL import Image

    for i in range(4):
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(tmp_path / f"f{i:02d}.png")
    (tmp_path / "f02.kf").write_text("")
    kfs = video.manual_keyframes(str(tmp_path / "f%02d.png"), 0, 4)
    assert kfs == [2]


def test_png_export(tmp_path):
    frames = [np.full((16, 16, 4), 128, np.uint8) for _ in range(2)]
    pal = np.zeros((2, 16, 3), np.uint8)
    export.write_pngs(str(tmp_path / "out.gtm"), frames, pal)
    assert (tmp_path / "out_0000.png").exists()
    assert (tmp_path / "out_0001.png").exists()
    txt = (tmp_path / "out.txt").read_text().splitlines()
    assert len(txt) == 32 and txt[0] == "FF000000"


def test_median_cut():
    rng = np.random.RandomState(2)
    reds = np.array([250, 5, 5]) + rng.randint(-3, 4, (50, 3))
    blues = np.array([5, 5, 250]) + rng.randint(-3, 4, (50, 3))
    pal = median_cut(np.concatenate([reds, blues]), None, 2)
    assert pal.shape == (2, 3)
    hi = pal[:, 0].argmax()
    assert pal[hi][0] > 200 and pal[1 - hi][2] > 200


def test_least_squares():
    a = np.array([[1.0, 0], [0, 2.0], [1, 1]])
    x_true = np.array([3.0, -1.0])
    b = a @ x_true
    assert np.allclose(least_squares(a, b), x_true)


def test_ffmpeg_banner_probe_fallback(tmp_path, monkeypatch):
    """ffprobe-less probing (io/video.py:_probe_banner): a fake ffmpeg
    that emits a realistic -i banner on stderr and rawvideo on stdout
    exercises the full fallback decode path (no real ffmpeg in CI)."""
    import subprocess
    import numpy as np
    from tiler_tpu.io import video as V

    W, H, F = 32, 16, 3
    frames = np.arange(F * H * W * 3, dtype=np.uint8).reshape(F, H, W, 3)
    raw = tmp_path / "raw.bin"
    raw.write_bytes(frames.tobytes())
    fake = tmp_path / "ffmpeg"
    fake.write_text(f"""#!/bin/bash
# fake ffmpeg: probe banner on -i only; rawvideo pipe otherwise
if [ "${{@: -1}}" != "-" ]; then
  cat >&2 <<'BANNER'
Input #0, mov,mp4, from 'clip.mp4':
  Duration: 00:00:00.12, start: 0.000000, bitrate: 1234 kb/s
  Stream #0:0[0x1](und): Video: h264 (High), yuv420p, {W}x{H}, 25 fps, 25 tbr
BANNER
  exit 1
fi
cat {raw}
""")
    fake.chmod(0o755)

    got = V._probe_banner(str(fake), "clip.mp4")
    assert got == (W, H, 25.0, 5)  # 0.12s * 25fps + 2

    monkeypatch.setattr(
        V.shutil, "which",
        lambda name: str(fake) if name == "ffmpeg" else None)
    out, fps = V.load_ffmpeg("clip.mp4", frame_count=F)
    assert fps == 25.0 and out.shape == (F, H, W, 3)
    assert np.array_equal(out, frames)

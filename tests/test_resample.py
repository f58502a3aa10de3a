"""On-device ingest: Lanczos resample + planar YUV conversion
(ops/resample.py, io/video.py PlanarClip, pipeline/load.py device path).

The reference resamples on the host via sws_scale Lanczos
(extern.pas:759-789); the device path must (a) be bit-identical to the
host y4m conversion at scaling=1, and (b) match the host Lanczos filter
to high PSNR when scaling != 1."""
import numpy as np
import pytest

from tiler_tpu.io import video
from tiler_tpu.ops.resample import lanczos_matrix, planar_to_rgb, resize_rgb


def _write_y4m_420(path, y, u, v, fps="25:1"):
    F, H, W = y.shape
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{W} H{H} F{fps} Ip A1:1 C420jpeg\n".encode())
        for i in range(F):
            f.write(b"FRAME\n")
            f.write(y[i].tobytes())
            f.write(u[i].tobytes())
            f.write(v[i].tobytes())


def _rand_planes(F=3, H=48, W=64, seed=7):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 256, (F, H, W), dtype=np.uint8)
    u = rng.randint(0, 256, (F, H // 2, W // 2), dtype=np.uint8)
    v = rng.randint(0, 256, (F, H // 2, W // 2), dtype=np.uint8)
    return y, u, v


def test_lanczos_matrix_identity_and_rows():
    m = lanczos_matrix(64, 64)
    assert np.allclose(m, np.eye(64), atol=1e-12)
    up = lanczos_matrix(36, 90)
    down = lanczos_matrix(90, 36)
    assert np.allclose(up.sum(1), 1.0, atol=1e-6)
    assert np.allclose(down.sum(1), 1.0, atol=1e-6)


def test_planar_conversion_bit_identical_to_host(tmp_path):
    """At scaling=1 the device YUV->RGB must be BIT-identical to
    load_y4m's host conversion (same constants, same rounding)."""
    y, u, v = _rand_planes()
    p = tmp_path / "c420.y4m"
    _write_y4m_420(str(p), y, u, v)
    host, fps = video.load_y4m(str(p))
    clip = video.load_y4m_planar(str(p))
    assert clip.n_frames == 3 and fps == 25.0 and clip.fps == 25.0
    lz = np.zeros((1, 1), np.float32)
    dev = np.asarray(planar_to_rgb(clip.y, clip.u, clip.v, lz, lz,
                                   out_h=48, out_w=64, resize=False))
    np.testing.assert_array_equal(host, dev)


def test_resize_matches_pil_lanczos():
    """Filter difference vs the host PIL Lanczos stays small (PIL
    quantizes coefficients to 8-bit fixed point and rounds the
    intermediate pass; we keep f32 between passes)."""
    from PIL import Image

    rng = np.random.RandomState(3)
    H, W = 72, 88
    yy, xx = np.mgrid[0:H, 0:W]
    img = np.stack([(yy * 255 // H), (xx * 255 // W),
                    ((yy + xx) * 255 // (H + W))], -1).astype(np.uint8)
    img = np.clip(img.astype(np.int32)
                  + rng.randint(-20, 20, img.shape), 0, 255).astype(np.uint8)
    th, tw = 180, 220
    pil = np.asarray(Image.fromarray(img).resize((tw, th), Image.LANCZOS))
    lh = lanczos_matrix(H, th)
    lw = lanczos_matrix(W, tw)
    dev = np.asarray(resize_rgb(img[None], lh, lw, out_h=th, out_w=tw))[0]
    # padded-to-8 output: compare the content region
    dev = dev[:th, :tw]
    mse = np.mean((pil.astype(np.float64) - dev.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0**2 / max(mse, 1e-12))
    assert psnr > 40.0, f"device Lanczos vs PIL only {psnr:.1f} dB"
    # downscale direction too
    th2, tw2 = 40, 48
    pil2 = np.asarray(Image.fromarray(img).resize((tw2, th2), Image.LANCZOS))
    dev2 = np.asarray(resize_rgb(
        img[None], lanczos_matrix(H, th2), lanczos_matrix(W, tw2),
        out_h=th2, out_w=tw2))[0][:th2, :tw2]
    mse2 = np.mean((pil2.astype(np.float64) - dev2.astype(np.float64)) ** 2)
    assert 10 * np.log10(255.0**2 / max(mse2, 1e-12)) > 40.0


def test_load_planar_end_to_end_matches_host(tmp_path):
    """pipeline.load with a PlanarClip reproduces the host path's state
    bit-for-bit at scaling=1 (frames, tiles, flags, correlations)."""
    from tiler_tpu.config import EncoderSettings
    from tiler_tpu.models.state import EncodeState
    from tiler_tpu.pipeline import load as load_mod

    y, u, v = _rand_planes(F=4, H=48, W=64, seed=11)
    p = tmp_path / "c420.y4m"
    _write_y4m_420(str(p), y, u, v)
    host_frames, fps = video.load_y4m(str(p))
    s = EncoderSettings()
    st_host = load_mod.load(EncodeState(), host_frames, fps, s)
    clip = video.load_y4m_planar(str(p))
    st_dev = load_mod.load(EncodeState(), clip, fps, s)
    np.testing.assert_array_equal(np.asarray(st_host.frames_rgb),
                                  np.asarray(st_dev.frames_rgb))
    np.testing.assert_array_equal(np.asarray(st_host.tiles_canon),
                                  np.asarray(st_dev.tiles_canon))
    np.testing.assert_array_equal(st_host.tilemap.hmirror, st_dev.tilemap.hmirror)
    np.testing.assert_allclose(st_host.correlations, st_dev.correlations,
                               rtol=0, atol=1e-6)


def test_load_device_resample_deferred(tmp_path):
    """Deferred (pipelined) ingest with device resample: finalize after
    the fact and check dims/keyframes; content must match the
    non-deferred device path exactly."""
    from tiler_tpu.config import EncoderSettings
    from tiler_tpu.models.state import EncodeState
    from tiler_tpu.pipeline import load as load_mod

    y, u, v = _rand_planes(F=6, H=24, W=32, seed=5)
    p = tmp_path / "c.y4m"
    _write_y4m_420(str(p), y, u, v)
    clip = video.load_y4m_planar(str(p))
    s = EncoderSettings()
    rt = (48, 64)
    st1 = load_mod.load(EncodeState(), clip, 25.0, s, resample_to=rt)
    st2 = load_mod.load(EncodeState(), video.load_y4m_planar(str(p)), 25.0,
                        s, defer=True, resample_to=rt)
    st2.ensure_ingest()
    assert st2.width == 64 and st2.height == 48
    assert len(st2.keyframes) >= 1
    np.testing.assert_array_equal(np.asarray(st1.frames_rgb),
                                  np.asarray(st2.frames_rgb))


def test_encoder_load_video_device_resample(tmp_path):
    """Encoder.load_video picks the planar path for y4m and resamples on
    device at settings.scaling; device_resample=0 falls back to host."""
    from tiler_tpu.config import EncoderSettings
    from tiler_tpu.pipeline.encoder import Encoder

    # structured content (gradient + mild noise): full-range random noise
    # at 24x32 is an adversarial worst case for FILTER-IMPLEMENTATION
    # differences (edge taps + PIL's uint8 intermediate rounding dominate)
    # and measures ~36 dB; the documented metric is on image-like content
    rng = np.random.RandomState(9)
    yy, xx = np.mgrid[0:24, 0:32]
    base = ((yy * 8 + xx * 4) % 256).astype(np.int32)
    y = np.stack([np.clip(base + rng.randint(-10, 10, base.shape), 0, 255)
                  for _ in range(2)]).astype(np.uint8)
    u = np.full((2, 12, 16), 120, np.uint8)
    v = np.full((2, 12, 16), 136, np.uint8)
    p = tmp_path / "in.y4m"
    _write_y4m_420(str(p), y, u, v)
    s = EncoderSettings(input_file_name=str(p), scaling=2.0)
    enc = Encoder(s, log=lambda *a: None).load_video()
    enc.state.ensure_ingest()
    assert (enc.state.height, enc.state.width) == (48, 64)
    s2 = EncoderSettings(input_file_name=str(p), scaling=2.0,
                         device_resample=False)
    enc2 = Encoder(s2, log=lambda *a: None).load_video()
    enc2.state.ensure_ingest()
    assert (enc2.state.height, enc2.state.width) == (48, 64)
    # the two filters differ in rounding detail only
    a = np.asarray(enc.state.frames_rgb, np.float64)
    b = np.asarray(enc2.state.frames_rgb, np.float64)
    mse = np.mean((a - b) ** 2)
    assert 10 * np.log10(255.0**2 / max(mse, 1e-12)) > 40.0


def test_load_video_planar_dispatch(tmp_path):
    from PIL import Image

    img = np.zeros((16, 16, 3), np.uint8)
    Image.fromarray(img).save(tmp_path / "f0000.png")
    assert video.load_video_planar(str(tmp_path / "f%04d.png")) is None


def test_removed_ini_key_warns():
    from tiler_tpu.config import EncoderSettings

    ini = EncoderSettings().to_ini() + "\n[TPU]\nEpuInt8Tables=1\n"
    with pytest.warns(UserWarning, match="EpuInt8Tables"):
        EncoderSettings.from_ini(ini)

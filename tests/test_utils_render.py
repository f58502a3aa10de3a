"""Tests for scalar optimizers, telemetry, and preview rendering."""
import numpy as np

from tiler_tpu.utils import golden_ratio_search, powell_minimize, StepTimer


def test_golden_ratio_search_monotone():
    f = lambda x: x * x  # monotone on [0, inf)
    x = golden_ratio_search(f, 0.0, 100.0, objective=49.0, eps_y=0.1)
    assert abs(x - 7.0) < 0.1


def test_powell_quadratic():
    target = np.array([1.5, -2.0, 0.5])
    f = lambda x: float(np.sum((x - target) ** 2)) + 3.0
    x, fx = powell_minimize(f, [0.0, 0.0, 0.0])
    assert np.allclose(x, target, atol=1e-3)
    assert abs(fx - 3.0) < 1e-6


def test_powell_rosenbrock_2d():
    f = lambda x: float((1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2)
    x, fx = powell_minimize(f, [-1.0, 1.0], maxiter=400)
    assert fx < 1e-4, (x, fx)


def test_step_timer():
    logs = []
    t = StepTimer(log=logs.append)
    with t.step("a"):
        pass
    with t.step("b"):
        pass
    assert set(t.timings) == {"a", "b"}
    assert "total" in t.report()
    assert len(logs) == 2


def test_render_pages():
    # build a tiny post-encode state via the encoder
    from tests.test_e2e import synthetic_clip, _settings
    from tiler_tpu.pipeline.encoder import Encoder
    from tiler_tpu import render

    enc = Encoder(_settings(), log=lambda *a: None)
    enc.run_all(synthetic_clip(F=4), fps=24.0, out_path="/tmp/render_test.gtm")
    st = enc.state
    inp = render.render_input(st, 0)
    assert inp.shape == (48, 64, 3)
    out0 = render.render_output(st, 0)
    assert out0.shape == (48, 64, 3)
    # render_output must agree with the bitstream decoder
    from tiler_tpu.bitstream.gtm import GTMDecoder

    dec = GTMDecoder("/tmp/render_test.gtm").decode_frames()
    assert np.array_equal(out0, dec[0][..., :3])
    out3 = render.render_output(st, 3)
    assert np.array_equal(out3, dec[3][..., :3])
    tiles = render.render_tiles(st)
    assert tiles.ndim == 3 and tiles.shape[2] == 3
    pals = render.render_palettes(st)
    assert pals.shape == (8 * 8, 16 * 8, 3)
    assert render.frame_psnr(st, 0) > 0

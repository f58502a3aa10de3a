"""Conformance against the UNCHANGED reference JS decoder.

BASELINE.md requires our streams be "bit-playable by the unchanged
gtm.player.js". These tests execute the reference files verbatim
(/root/reference/decoders/htmljs/*.js — player, js-lzma, worker glue)
under the jsvm interpreter with a browser-surface shim, and require
pixel-exact agreement with our own GTMDecoder.

A shared misreading between our writer and our replica decoder would be
invisible to replica-only tests (see gtm.player.js:472-479 intra-slot
wraparound, :398 palette-size timing) — running the real JS closes that
hole.
"""
import os

import numpy as np
import pytest

from tiler_tpu.bitstream.gtm import GTMDecoder
from tiler_tpu.config import EncoderSettings
from tiler_tpu.pipeline.encoder import Encoder

REFERENCE_HTMLJS = "/root/reference/decoders/htmljs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_HTMLJS), reason="reference decoder not present"
)


def test_jsvm_semantics():
    """Micro-check of the interpreter's JS semantics (int32 wrap, switch
    fallthrough, prototypes, typed-array clamping, try/catch, % sign)."""
    from tiler_tpu.conformance.jsvm import Interpreter

    I = Interpreter()
    I.eval_script(
        """
var x = 0;
for (var i = 0; i < 10; i++) { x += i; }
function fib(n){ return n < 2 ? n : fib(n-1)+fib(n-2); }
var F = function Named(a){ this.v = a; };
F.prototype.get = function(){ return this.v * 2; };
var o = new F(21);
var arr = [1,2,3]; arr.push(4);
var t = new Uint8Array(4); t[0] = 300;
var s = '';
switch (3) { case 1: s += 'a'; case 3: s += 'b'; case 4: s += 'c'; break; default: s += 'z'; }
var tr; try { throw Error('boom'); } catch (e) { tr = e.message; }
console.log(x, fib(10), o.get(), arr.length, t[0], s, -7 % 3,
            (0x80000000 | 0), 0xffffffff >>> 0, ~~(25 / 9), tr);
"""
    )
    assert I.console[0][1] == "45 55 42 4 44 bc -1 -2147483648 4294967295 2 boom"


def _encode_small(tmp_path, use_tk=True, pal_count=8):
    rng = np.random.RandomState(7)
    F, H, W = 6, 64, 80
    base = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
    clip = np.stack([np.roll(base, (2 * f, 3 * f), (0, 1)) for f in range(F)])
    s = EncoderSettings(
        palette_count=pal_count,
        palette_size=16,
        motion_predict_radius=8,
        global_tiling_quality_based_tile_count=2.0,
        epu_knn_k=8,
        kmeans_iters=8,
        dithering_use_thomas_knoll=use_tk,
    )
    out = str(tmp_path / "conf.gtm")
    enc = Encoder(s, log=lambda *a: None)
    enc.run_all(clip, fps=25.0, out_path=out)
    return out, F


def test_real_player_decodes_our_stream_pixel_exact(tmp_path):
    from tiler_tpu.conformance import decode_with_reference_player

    path, F = _encode_small(tmp_path)
    rgb, alpha, console = decode_with_reference_player(path, F)
    ours = np.stack(GTMDecoder(path).decode_frames())
    assert rgb.shape == ours[..., :3].shape
    assert np.array_equal(rgb, ours[..., :3]), "reference JS decode differs from GTMDecoder"
    assert (alpha == 255).all()
    # the player logged the embedded settings block (ExtendedCommand 0)
    assert any("PaletteCount" in m for _, m in console)


def test_real_player_yliluoma_stream(tmp_path):
    from tiler_tpu.conformance import decode_with_reference_player

    path, F = _encode_small(tmp_path, use_tk=False)
    rgb, _, _ = decode_with_reference_player(path, F)
    ours = np.stack(GTMDecoder(path).decode_frames())
    assert np.array_equal(rgb, ours[..., :3])


@pytest.mark.skipif(
    not os.environ.get("TILER_SLOW_CONFORMANCE"),
    reason="interpreted js-lzma unpack of the full demo keyframe takes minutes; "
    "set TILER_SLOW_CONFORMANCE=1 to run",
)
def test_real_player_decodes_reference_demo():
    """The committed reference demo stream through the real JS player vs
    our decoder (first frames)."""
    from tiler_tpu.conformance import decode_with_reference_player

    demo = "/root/reference/docs/demo/city_cif.gtm"
    n = 4
    rgb, _, _ = decode_with_reference_player(demo, n)
    ours = np.stack(GTMDecoder(demo).decode_frames(max_frames=n))
    assert np.array_equal(rgb, ours[:n, ..., :3])

"""Malformed-input robustness: truncated or bit-flipped GTM streams must
fail FAST with the typed GTMFormatError — never hang, never allocate
gigabytes, never leak struct.error/IndexError/KeyError. (The reference
raises typed stream errors on re-import, tilingencoder.pas:112, :5030;
its native LZMA decoder is bounds-checked the same way.)

Found by fuzzing: a bit flip in a stream's size field used to send the
native-LZMA wrapper into a multi-GB grow-and-retry loop (corrupt and
buffer-too-small shared one error code), and parse errors escaped as raw
IndexError/struct.error."""
import time

import numpy as np
import pytest

from tiler_tpu.bitstream.gtm import GTMDecoder, GTMFormatError, GTMReader
from tiler_tpu.bitstream import lzma_codec


@pytest.fixture(scope="module")
def stream(tmp_path_factory):
    from tests.test_e2e import synthetic_clip, _settings
    from tiler_tpu.pipeline.encoder import Encoder

    p = tmp_path_factory.mktemp("robust") / "s.gtm"
    enc = Encoder(_settings(), log=lambda *a: None)
    enc.run_all(synthetic_clip(F=4), fps=24.0, out_path=str(p))
    return open(p, "rb").read()


def _cases(data):
    for cut in (0, 1, 7, 12, 40, 100, len(data) // 2, len(data) - 1):
        yield f"trunc{cut}", data[:cut]
    rng = np.random.RandomState(0)
    for _ in range(60):
        b = bytearray(data)
        i = rng.randint(len(b))
        b[i] ^= 1 << rng.randint(8)
        yield f"flip@{i}", bytes(b)


def test_corrupt_streams_fail_fast_and_typed(stream):
    t0 = time.time()
    for name, blob in _cases(stream):
        try:
            GTMReader.read(blob)
            GTMDecoder(blob).decode_frames()
        except GTMFormatError:
            pass  # the one acceptable failure
        # any other exception type propagates and fails the test
    # ~70 corrupt decodes must be quick: the old corrupt-as-growable
    # LZMA path spent seconds per case zero-filling giant buffers
    assert time.time() - t0 < 30.0


def test_format_error_is_value_error(stream):
    assert issubclass(GTMFormatError, ValueError)
    with pytest.raises(GTMFormatError):
        GTMReader.read(b"definitely not a gtm file....")


def test_corrupt_lzma_rejected_without_growth(stream):
    """A mid-stream flip in LZMA data must raise promptly (native codec:
    distinct corrupt vs needs-more-space return codes)."""
    hdr = stream[:4]
    assert hdr == b"GTMv"
    import struct

    whole = struct.unpack("<I", stream[8:12])[0]
    body = bytearray(stream)
    body[whole + len(body[whole:]) // 2] ^= 0xFF
    t0 = time.time()
    with pytest.raises(ValueError):
        lzma_codec.split_streams(bytes(body[whole:]))
    assert time.time() - t0 < 5.0


def test_huge_declared_dimensions_rejected():
    """A crafted SetDimensions declaring a 65535x65535 tilemap must be
    rejected by the allocation-byte guard, not attempted (tiles4 alone
    would be terabytes)."""
    import struct

    from tiler_tpu.bitstream.gtm import GTM_COMMANDS
    from tiler_tpu.bitstream import lzma_codec

    payload = struct.pack(
        "<HHHIIH",
        GTM_COMMANDS.SetDimensions,  # cmd word, data=0
        0xFFFF,  # width in tiles
        0xFFFF,  # height in tiles
        40_000_000,  # frame length ns
        12,  # declared tile count (innocuous)
        GTM_COMMANDS.FrameEnd | (1 << 4),
    )
    blob = lzma_codec.compress(payload)
    t0 = time.time()
    with pytest.raises(GTMFormatError):
        GTMDecoder(blob).decode_frames()
    with pytest.raises(GTMFormatError):
        GTMReader.read(blob)
    assert time.time() - t0 < 5.0


def test_valid_stream_still_decodes(stream):
    g = GTMReader.read(stream)
    assert len(g.frames) == 4
    assert len(GTMDecoder(stream).decode_frames()) == 4

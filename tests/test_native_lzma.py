"""Native LZMA codec: fuzz round-trips (optimal + greedy) cross-checked
against the pure-Python decoder and liblzma interop."""
import lzma as stdlzma
import os

import numpy as np
import pytest

from tiler_tpu import native
from tiler_tpu.bitstream import lzma_py

pytestmark = pytest.mark.skipif(not native.available(), reason="no native codec")


def _payloads():
    rng = np.random.RandomState(0xC0DEC)
    yield b""
    yield b"\x00" * 5000
    yield bytes(rng.randint(0, 256, 3000, dtype=np.uint8))
    # GTM-like: 16-bit words with repeating structure
    words = rng.randint(0, 16, 4000, dtype=np.uint16) << 4 | 2
    yield words.tobytes() + words.tobytes()
    yield (b"tile" * 700) + bytes(rng.randint(0, 4, 2000, dtype=np.uint8))


@pytest.mark.parametrize("depth", [-48, 64])
def test_fuzz_roundtrip(depth):
    for data in _payloads():
        enc = native.lzma_compress(data, lc=8, depth=depth)
        d1, u1 = native.lzma_decompress_stream(enc)
        assert d1 == data and u1 == len(enc)
        d2, u2 = lzma_py.decompress_stream(enc, 0)
        assert d2 == data and u2 == len(enc)


def test_various_props():
    data = b"property bytes " * 200
    for lc, lp, pb in [(0, 0, 0), (3, 0, 2), (8, 0, 2), (4, 2, 1), (0, 4, 4)]:
        enc = native.lzma_compress(data, lc=lc, lp=lp, pb=pb)
        assert enc[0] == (pb * 5 + lp) * 9 + lc
        d, _ = native.lzma_decompress_stream(enc)
        assert d == data


def test_decodes_liblzma_output():
    data = os.urandom(500) + b"abc" * 1000
    comp = stdlzma.LZMACompressor(
        format=stdlzma.FORMAT_ALONE,
        filters=[{"id": stdlzma.FILTER_LZMA1, "preset": 6, "lc": 3, "lp": 0, "pb": 2}],
    )
    blob = comp.compress(data) + comp.flush()
    d, used = native.lzma_decompress_stream(blob)
    assert d == data and used == len(blob)


def test_liblzma_decodes_our_lc3_output():
    data = b"interop check " * 300
    enc = native.lzma_compress(data, lc=3, lp=0, pb=2)
    dec = stdlzma.LZMADecompressor(format=stdlzma.FORMAT_ALONE)
    assert dec.decompress(enc) == data


def test_truncated_stream_fails_cleanly():
    enc = native.lzma_compress(b"x" * 10000, lc=8)
    with pytest.raises(ValueError):
        native.lzma_decompress_stream(enc[: len(enc) // 2], max_out=1 << 24)


def test_extreme_expansion_ratio_decodes():
    """Valid LZMA ratios are unbounded (constant payloads hit 7000x+);
    the decoder must keep growing its buffer on the retryable code and
    never reject a valid stream for expanding 'too much'."""
    data = b"\x00" * (2 << 20)
    enc = native.lzma_compress(data, lc=8)
    assert len(data) / len(enc) > 4096  # the bug's old false ceiling
    d, used = native.lzma_decompress_stream(enc)
    assert d == data and used == len(enc)


def test_corrupt_stream_fails_without_growth():
    """A corrupt stream must raise promptly (distinct -1 return code),
    not grow-and-retry to max_out."""
    import time

    enc0 = native.lzma_compress(b"payload " * 5000, lc=8)
    t0 = time.time()
    raised = 0
    for pos in range(20, len(enc0) - 1, max(1, len(enc0) // 64)):
        enc = bytearray(enc0)
        enc[pos] ^= 0xFF
        try:
            native.lzma_decompress_stream(bytes(enc))
        except ValueError:
            raised += 1
    # LZMA has no checksum, so SOME flips decode as garbage — but none
    # may spiral into the old grow-to-2GB retry loop
    assert time.time() - t0 < 5.0
    assert raised > 0


def test_optimal_beats_greedy_on_structured():
    data = open("/root/repo/SURVEY.md", "rb").read()
    opt = native.lzma_compress(data, lc=8, depth=-48)
    greedy = native.lzma_compress(data, lc=8, depth=64)
    assert len(opt) < len(greedy)


def test_thread_count_is_byte_invariant():
    """The finder-ahead 2-thread optimal parse must emit EXACTLY the
    bytes of the single-thread parse: the finder's skip rule is a pure
    function of the input (finder-local, no DP feedback), so thread
    count can never change the stream. Guards the SPSC ring against
    ordering bugs that would silently alter output on multi-core
    hosts (the driver bench host is single-core; CI may not be)."""
    rng = np.random.RandomState(7)
    chunks = []
    for _ in range(40):  # structured + noise mix, ~600KB (over the
        w = rng.randint(0, 16, 6000, dtype=np.uint16)  # auto-thread floor)
        chunks.append(w.tobytes() * 2)
        chunks.append(bytes(rng.randint(0, 256, 2000, dtype=np.uint8)))
    data = b"".join(chunks)
    one = native.lzma_compress(data, lc=8, depth=-2, threads=1)
    two = native.lzma_compress(data, lc=8, depth=-2, threads=2)
    auto = native.lzma_compress(data, lc=8, depth=-2, threads=0)
    assert one == two == auto
    dec, used = native.lzma_decompress_stream(two)
    assert dec == data and used == len(two)

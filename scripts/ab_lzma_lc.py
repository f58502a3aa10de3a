#!/usr/bin/env python
"""A/B: LZMA literal-context bits (lc) vs compressed size + speed.

The GTM LZMA properties byte is in-stream (lzma_codec.py:7), so lc is a
free encoder-side variable — the unchanged JS player decodes any value.
The reference encodes lc=8 (extern.pas:427): 256 literal contexts x 768
probabilities = 576 KB of literal state, which the optimal parse must
also PRICE (table refreshes scale with the context count). Lower lc
shrinks those tables 2^k-fold; on a 1-core host the cache/refresh
saving may outweigh the ratio loss. This measures both on the
reference's own demo keyframe payloads (real content, no encode), per
(lc, lp) x parse mode.

Host-only (no JAX). Usage: python scripts/ab_lzma_lc.py [paths...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tiler_tpu.bitstream import lzma_codec


def payloads_of(path):
    """Decompressed per-keyframe payloads of a .gtm file."""
    with open(path, "rb") as f:
        buf = f.read()
    off = 0
    if buf[:4] == b"GTMv":  # skip the uncompressed header (gtm.py:570)
        from tiler_tpu.bitstream.gtm import parse_header
        off = parse_header(buf)["whole_header_size"]
    return lzma_codec.split_streams(buf[off:])


def main(paths):
    for path in paths:
        pls = payloads_of(path)
        total = sum(len(p) for p in pls)
        print(f"\n== {path}: {len(pls)} streams, {total/1e6:.2f} MB "
              f"decompressed ==")
        base = {}
        for mode in ("optimal", "fast"):
            for lc, lp in ((8, 1), (8, 0), (6, 1), (5, 1), (4, 1), (3, 1),
                           (2, 1), (1, 1), (0, 1), (0, 2)):
                t0 = time.time()
                csize = 0
                for p in pls:
                    csize += len(lzma_codec.compress(p, lc=lc, lp=lp,
                                                     mode=mode))
                dt = time.time() - t0
                key = (mode,)
                if key not in base:
                    base[key] = csize
                print(f"  {mode:8s} lc={lc} lp={lp}  {csize:9d} B "
                      f"{csize/base[key]-1:+7.3%}  {dt:6.2f}s "
                      f"({total/dt/1e6:5.1f} MB/s)", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["/root/reference/docs/demo/city_cif.gtm",
                          "/root/reference/docs/demo/football_cif.gtm"])

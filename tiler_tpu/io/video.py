"""Host-side video ingest.

The reference links ffmpeg 5.1 via ~28k lines of generated Pascal bindings
(extern.pas:744-904). Here ingest is pluggable by source type:
  - printf-style image sequences (PNG/BMP/...; the reference's non-video
    path, tilingencoder.pas:1789-1817) via PIL
  - .y4m YUV4MPEG2 files (C444/C420 variants) with a pure-numpy parser
  - anything else through the `ffmpeg` binary when present (rawvideo pipe)

Scaling follows the reference semantics: output dimensions scaled by
`Scaling` before tile extraction (FFMPEG_Open dst sizes, extern.pas:
759-789). Manual keyframes come from sidecar .kf files
(FindKeyFrames, tilingencoder.pas:3381-3385).
"""
from __future__ import annotations

import os
import re
import shutil
import subprocess
from typing import List, Optional, Tuple

import numpy as np


def _scale_frame(f: np.ndarray, scaling: float) -> np.ndarray:
    if scaling == 1.0:
        return f
    from PIL import Image

    h, w = f.shape[:2]
    nw, nh = max(1, round(w * scaling)), max(1, round(h * scaling))
    return np.asarray(Image.fromarray(f).resize((nw, nh), Image.LANCZOS))


def load_y4m(path: str, start_frame: int = 0, frame_count: Optional[int] = None,
             scaling: float = 1.0) -> Tuple[np.ndarray, float]:
    """Parse YUV4MPEG2; returns (frames [F,H,W,3] uint8 RGB, fps)."""
    with open(path, "rb") as f:
        header = f.readline().decode("ascii").strip()
        if not header.startswith("YUV4MPEG2"):
            raise ValueError("not a y4m file")
        W = H = 0
        fps = 24.0
        cs = "420"
        for tok in header.split()[1:]:
            if tok[0] == "W":
                W = int(tok[1:])
            elif tok[0] == "H":
                H = int(tok[1:])
            elif tok[0] == "F":
                n, d = tok[1:].split(":")
                fps = float(n) / float(d)
            elif tok[0] == "C":
                cs = tok[1:]
        if cs.startswith("444"):
            planes = [(H, W), (H, W), (H, W)]
        elif cs.startswith("420"):
            planes = [(H, W), (H // 2, W // 2), (H // 2, W // 2)]
        elif cs.startswith("422"):
            planes = [(H, W), (H, W // 2), (H, W // 2)]
        else:
            raise ValueError(f"unsupported y4m colorspace {cs}")
        fsz = sum(h * w for h, w in planes)
        frames = []
        idx = 0
        while True:
            line = f.readline()
            if not line:
                break
            if not line.startswith(b"FRAME"):
                raise ValueError("bad y4m frame header")
            raw = f.read(fsz)
            if len(raw) < fsz:
                break
            if idx >= start_frame and (frame_count is None or len(frames) < frame_count):
                off = 0
                ps = []
                for h, w in planes:
                    ps.append(np.frombuffer(raw, np.uint8, h * w, off).reshape(h, w))
                    off += h * w
                y, u, v = ps
                if u.shape != y.shape:  # upsample chroma (nearest)
                    u = u.repeat(y.shape[0] // u.shape[0], 0).repeat(y.shape[1] // u.shape[1], 1)
                    v = v.repeat(y.shape[0] // v.shape[0], 0).repeat(y.shape[1] // v.shape[1], 1)
                yf = y.astype(np.float32)
                uf = u.astype(np.float32) - 128.0
                vf = v.astype(np.float32) - 128.0
                # BT.601 full-range (matches the reference's YUVToRGB)
                r = yf + 1.13983 * vf
                g = yf - 0.39465 * uf - 0.58060 * vf
                b = yf + 2.03211 * uf
                rgb = np.clip(np.round(np.stack([r, g, b], -1)), 0, 255).astype(np.uint8)
                frames.append(_scale_frame(rgb, scaling))
            idx += 1
            if frame_count is not None and len(frames) >= frame_count:
                break
    return np.stack(frames), fps


def load_image_sequence(pattern: str, start_frame: int = 0,
                        frame_count: Optional[int] = None,
                        scaling: float = 1.0) -> Tuple[np.ndarray, float]:
    """printf-style pattern (e.g. frame%04d.png); fps fixed at 24
    (tilingencoder.pas:1790)."""
    from PIL import Image

    frames = []
    i = start_frame
    while frame_count is None or len(frames) < frame_count:
        p = pattern % i
        if not os.path.exists(p):
            break
        img = np.asarray(Image.open(p).convert("RGB"))
        frames.append(_scale_frame(img, scaling))
        i += 1
    if not frames:
        raise FileNotFoundError(f"no frames match {pattern}")
    return np.stack(frames), 24.0


def load_ffmpeg(path: str, start_frame: int = 0, frame_count: Optional[int] = None,
                scaling: float = 1.0) -> Tuple[np.ndarray, float]:
    """Decode via the ffmpeg binary (rawvideo pipe)."""
    ffmpeg = shutil.which("ffmpeg")
    ffprobe = shutil.which("ffprobe")
    if ffmpeg is None:
        raise RuntimeError("ffmpeg binary not available")
    W = H = 0
    fps = 24.0
    if ffprobe:
        out = subprocess.run(
            [ffprobe, "-v", "quiet", "-select_streams", "v:0", "-show_entries",
             "stream=width,height,r_frame_rate", "-of", "csv=p=0", path],
            capture_output=True, text=True, check=True,
        ).stdout.strip().split(",")
        W, H = int(out[0]), int(out[1])
        n, d = out[2].split("/")
        fps = float(n) / float(d)
    vf = []
    if scaling != 1.0:
        W, H = max(1, round(W * scaling)), max(1, round(H * scaling))
        vf = ["-vf", f"scale={W}:{H}:flags=lanczos"]
    cmd = [ffmpeg, "-v", "quiet", "-i", path, *vf, "-f", "rawvideo", "-pix_fmt", "rgb24", "-"]
    raw = subprocess.run(cmd, capture_output=True, check=True).stdout
    frames = np.frombuffer(raw, np.uint8).reshape(-1, H, W, 3)
    frames = frames[start_frame:]
    if frame_count is not None:
        frames = frames[:frame_count]
    return frames.copy(), fps


def load_video(path: str, start_frame: int = 0, frame_count: Optional[int] = None,
               scaling: float = 1.0) -> Tuple[np.ndarray, float]:
    if re.search(r"%0?\d*d", path):
        return load_image_sequence(path, start_frame, frame_count, scaling)
    if path.lower().endswith(".y4m"):
        return load_y4m(path, start_frame, frame_count, scaling)
    if path.lower().endswith(".gtm"):
        from ..bitstream.gtm import GTMDecoder

        dec = GTMDecoder(path)
        frames = np.stack([f[..., :3] for f in dec.decode_frames()])
        return frames, 24.0
    return load_ffmpeg(path, start_frame, frame_count, scaling)


def manual_keyframes(path: str, start_frame: int, n_frames: int) -> Optional[List[int]]:
    """Sidecar .kf files mark manual keyframes for image sequences
    (tilingencoder.pas:3381-3385); None = automatic detection."""
    if not re.search(r"%0?\d*d", path):
        return None
    base = re.sub(r"\.[^.]+$", ".kf", path)
    found = [i for i in range(n_frames) if os.path.exists(base % (i + start_frame))]
    return found if found else None

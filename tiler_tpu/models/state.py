"""Encoder state: explicit, serializable artifacts between stages.

The reference keeps everything live in a TTilingEncoder instance (frames
zlib-compressed in RAM, tilemaps mutated in place). Here each stage reads
and writes plain arrays on a state object, so any stage's output can be
checkpointed to disk and resumed — the rebuild's answer to the GUI's
step-range re-runs (SURVEY.md section 5, checkpoint/resume).

Tilemap layout is struct-of-arrays [F, N] (N = tilemap_h * tilemap_w,
raster order), replacing TTileMapItem records (tilingencoder.pas:178-206).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np


@dataclass
class KeyFrameInfo:
    index: int
    start_frame: int
    end_frame: int
    reason: str = "manual"  # TKeyFrameReason (tilingencoder.pas:19)

    @property
    def frame_count(self):
        return self.end_frame - self.start_frame + 1


@dataclass
class TileMapSoA:
    """[F, N] arrays; defaults match InitFrames (tilingencoder.pas:2661-2687)."""

    tile_idx: np.ndarray  # int64, -1 = none
    pal_idx: np.ndarray  # int32, -1 = none
    pred_x: np.ndarray  # int16
    pred_y: np.ndarray  # int16
    predicted: np.ndarray  # bool
    hmirror: np.ndarray  # bool  (from load heuristics)
    vmirror: np.ndarray  # bool
    psnr: np.ndarray  # float32

    @classmethod
    def zeros(cls, f: int, n: int) -> "TileMapSoA":
        return cls(
            tile_idx=np.full((f, n), -1, np.int64),
            pal_idx=np.full((f, n), -1, np.int32),
            pred_x=np.zeros((f, n), np.int16),
            pred_y=np.zeros((f, n), np.int16),
            predicted=np.zeros((f, n), bool),
            hmirror=np.zeros((f, n), bool),
            vmirror=np.zeros((f, n), bool),
            psnr=np.zeros((f, n), np.float32),
        )


@dataclass
class EncodeState:
    """Pipeline state (host arrays; stages move slices to device)."""

    # load
    fps: float = 24.0
    tilemap_w: int = 0
    tilemap_h: int = 0
    frames_rgb: Optional[np.ndarray] = None  # [F, H, W, 3] uint8 (original)
    tiles_canon: Optional[np.ndarray] = None  # [F, N, 8, 8, 3] uint8 canonical spin
    correlations: Optional[np.ndarray] = None  # [F] float (with previous frame)
    keyframes: List[KeyFrameInfo] = field(default_factory=list)
    frame_kf: Optional[np.ndarray] = None  # [F] int32: keyframe index per frame
    tilemap: Optional[TileMapSoA] = None

    # reduce (global corpus; canonical orientation)
    corpus_rgb: Optional[np.ndarray] = None  # [T, 8, 8, 3] uint8
    corpus_use: Optional[np.ndarray] = None  # [T] int64
    corpus_pal_initial: Optional[np.ndarray] = None  # [T] int32

    # palettes
    palettes_rgb: Optional[np.ndarray] = None  # [P, S, 3] uint8
    palettes_valid: Optional[np.ndarray] = None  # [P, S] bool (False = null color)

    # dither
    corpus_pal_pixels: Optional[np.ndarray] = None  # [T, 8, 8] uint8

    # reconstruct
    kf_psnr: Optional[np.ndarray] = None  # per keyframe mean tile PSNR-HVS
    total_psnr: float = 0.0

    # deferred ingest finalization (load with defer=True): pulls the
    # packed mirror flags + correlations and runs keyframe detection.
    # Deferring lets predict_motion DISPATCH its device work first, so
    # the small load pull and the host-side keyframe loop overlap the
    # motion compute already queued on the chip. Not serialized — the
    # encoder finalizes before checkpointing.
    _finalize_ingest: Optional[object] = field(default=None, repr=False)

    # pipelined ingest (load with defer=True, device-resident): the
    # per-piece device arrays (frame_pieces, tile_pieces) BEFORE the
    # frames_rgb/tiles_canon concats. predict_motion consumes pieces
    # directly, so its per-piece programs start as soon as each piece's
    # h2d lands — the remaining transfers stream underneath (the
    # reference's bounded-lookahead decode pipeline,
    # tilingencoder.pas:1323-1326). ensure_ingest() materializes the
    # concats for every later stage.
    _ingest_pieces: Optional[tuple] = field(default=None, repr=False)

    # per-piece tile-pass dispatch jobs (pipelined ingest): the device
    # executes programs in DISPATCH order, so if load enqueued every
    # piece's tile pass itself, predict_motion's first program would sit
    # behind the last piece's pass — which waits on the final h2d bytes
    # (measured r4: only ~0.3 s of the 0.78 s load step hid under
    # compute). Instead predict_motion calls run_ingest_chunk(p) right
    # after dispatching piece p's motion program, interleaving passes
    # with motion so compute streams while later pieces transfer.
    _ingest_chunk_jobs: Optional[list] = field(default=None, repr=False)
    _ingest_chunk_next: int = field(default=0, repr=False)

    def run_ingest_chunk(self, p: int):
        """Dispatch tile-pass jobs up to and including piece p (in order,
        idempotent — jobs already dispatched are skipped)."""
        jobs = self._ingest_chunk_jobs
        if jobs is None:
            return
        while self._ingest_chunk_next < len(jobs) and self._ingest_chunk_next <= p:
            nxt = self._ingest_chunk_next
            # advance BEFORE invoking: a job that throws after run_chunk
            # has appended parts must not be re-run by a retrying caller
            # (it would double-append that piece's tiles/flags/corr)
            self._ingest_chunk_next = nxt + 1
            jobs[nxt]()
        if self._ingest_chunk_next >= len(jobs):
            self._ingest_chunk_jobs = None

    # prefetched per-cell tile hashes [2, F*N] (device array with its host
    # copy already streaming): dispatched by predict_motion so Reduce's
    # pull hides behind the motion programs
    _hashes_prefetch: Optional[object] = field(default=None, repr=False)

    # prefetched per-corpus-tile palette-pixel hashes [2, T]: dispatched
    # by dither so Reindex's pull hides behind reconstruct
    _pal_hashes_prefetch: Optional[object] = field(default=None, repr=False)

    def ensure_ingest(self):
        """Run the deferred load finalization exactly once (idempotent)."""
        fin = self._finalize_ingest
        if fin is not None:
            self._finalize_ingest = None
            fin()

    @property
    def n_frames(self) -> int:
        # NOTE: counts LOADED SOURCE frames only — callers use
        # n_frames == 0 as "no video loaded" (run_all's auto-load,
        # reload_gtm's stream-vs-video validation). A frame-less
        # reloaded state reports 0 here; preview derives its frame
        # count from the tilemap instead (preview.content_frames).
        if self.frames_rgb is None:
            if self._ingest_pieces is not None:
                return sum(int(p.shape[0]) for p in self._ingest_pieces[0])
            return 0
        return len(self.frames_rgb)

    @property
    def tilemap_size(self) -> int:
        return self.tilemap_w * self.tilemap_h

    @property
    def width(self) -> int:
        return self.tilemap_w * 8

    @property
    def height(self) -> int:
        return self.tilemap_h * 8

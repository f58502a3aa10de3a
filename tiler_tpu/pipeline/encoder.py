"""Encoder facade: the 8-step pipeline driver (TTilingEncoder.Run parity,
tilingencoder.pas:5529-5554) with step timing/progress telemetry
(ProgressRedraw, :3904-3979) and per-stage checkpointing."""
from __future__ import annotations

import os
import pickle
import time
from typing import Optional

import numpy as np

from ..config import EncoderSettings
from ..models.state import EncodeState
from ..utils.progress import trace_step
from . import dither as dither_mod
from . import load as load_mod
from . import palettes as palettes_mod
from . import predict as predict_mod
from . import reconstruct as reconstruct_mod
from . import reduce as reduce_mod
from . import reindex as reindex_mod
from . import save as save_mod

STEPS = (
    "load",
    "predict_motion",
    "reduce",
    "prepare_palettes",
    "dither",
    "reconstruct",
    "reindex",
    "save",
)


class GTMReloadError(Exception):
    """Stream/video mismatch on re-import (ETilingEncoderGTMReloadError,
    tilingencoder.pas:112, raised :5030)."""


class _SpilledRef:
    """Checkpoint placeholder for a disk-spilled (memmap) state field;
    names the sidecar .npy written next to the pickle."""

    def __init__(self, name: str):
        self.name = name


class Encoder:
    """Drives an EncodeState through the pipeline steps."""

    def __init__(self, settings: Optional[EncoderSettings] = None, log=print,
                 mesh=None):
        """mesh: optional jax.sharding.Mesh with a "corpus" axis — shards
        the KNN dataset over chips (ICI collectives); auto-created when
        multiple devices are visible."""
        self.settings = settings or EncoderSettings()
        self.state = EncodeState()
        self.log = log or (lambda *_: None)
        self.timings = {}
        self.stats = None
        if mesh == "auto":
            import jax

            from ..parallel import make_mesh

            mesh = make_mesh() if jax.device_count() > 1 else None
        self.mesh = mesh

    # --- ingest -----------------------------------------------------------
    def load_frames(self, frames_rgb, fps: float = 24.0,
                    manual_keyframes=None, resample_to=None):
        """frames_rgb: [F,H,W,3] uint8 RGB or an io.video.PlanarClip;
        resample_to=(H,W) resamples ON DEVICE (ops/resample.py)."""
        t0 = time.monotonic()
        # defer=True: the host pulls + keyframe detection stay in a
        # finalize closure that predict_motion runs AFTER dispatching its
        # device work (ingest/compute overlap); every step below calls
        # ensure_ingest() first so stepwise runs stay correct
        self.state = load_mod.load(
            EncodeState(), frames_rgb, fps, self.settings,
            manual_keyframes=manual_keyframes, defer=True,
            resample_to=resample_to,
        )
        self._stamp("load", t0)
        self.log(f"{self.state.n_frames} frames, {self.state.width}x{self.state.height} @ {fps:.3f} fps")
        return self

    def load_video(self, path: Optional[str] = None):
        from ..io import video

        s = self.settings
        path = path or s.input_file_name
        count = s.frame_count or None
        if s.device_resample:
            # TPU-first ingest: ship raw source-res planes for planar
            # sources; resample/convert on chip. Falls back per source
            # type (image sequences / .gtm / non-4:2:0 video are RGB).
            clip = video.load_video_planar(
                path, s.start_frame, count, int(s.host_ram_budget))
            if clip is not None:
                rt = None
                if s.scaling != 1.0:
                    rt = (max(1, round(clip.src_h * s.scaling)),
                          max(1, round(clip.src_w * s.scaling)))
                manual = video.manual_keyframes(
                    path, s.start_frame, clip.n_frames)
                return self.load_frames(clip, clip.fps,
                                        manual_keyframes=manual,
                                        resample_to=rt)
            if s.scaling != 1.0:
                # RGB source: still ship source-res and Lanczos on device
                frames, fps = video.load_video(
                    path, start_frame=s.start_frame, frame_count=count,
                    scaling=1.0, spill_budget=int(s.host_ram_budget))
                rt = (max(1, round(frames.shape[1] * s.scaling)),
                      max(1, round(frames.shape[2] * s.scaling)))
                manual = video.manual_keyframes(
                    path, s.start_frame, len(frames))
                return self.load_frames(frames, fps, manual_keyframes=manual,
                                        resample_to=rt)
        frames, fps = video.load_video(
            path,
            start_frame=s.start_frame,
            frame_count=count,
            scaling=s.scaling,
            spill_budget=int(s.host_ram_budget),
        )
        manual = video.manual_keyframes(path, s.start_frame, len(frames))
        return self.load_frames(frames, fps, manual_keyframes=manual)

    # --- steps ------------------------------------------------------------
    def predict_motion(self):
        t0 = time.monotonic()
        with trace_step("predict_motion"):
            predict_mod.predict_motion(self.state, self.settings, mesh=self.mesh)
        self._stamp("predict_motion", t0)
        self.log(f"{len(self.state.keyframes)} keyframes")
        return self

    def reduce(self):
        t0 = time.monotonic()
        self.state.ensure_ingest()
        with trace_step("reduce"):
            reduce_mod.reduce_tiles(self.state, self.settings)
        self._stamp("reduce", t0)
        self.log(f"corpus: {len(self.state.corpus_rgb)} tiles")
        return self

    def prepare_palettes(self):
        t0 = time.monotonic()
        self.state.ensure_ingest()
        with trace_step("prepare_palettes"):
            palettes_mod.prepare_palettes(self.state, self.settings, mesh=self.mesh)
        self._stamp("prepare_palettes", t0)
        return self

    def dither(self):
        t0 = time.monotonic()
        self.state.ensure_ingest()
        with trace_step("dither"):
            dither_mod.dither(self.state, self.settings)
        self._stamp("dither", t0)
        return self

    def reconstruct(self):
        t0 = time.monotonic()
        self.state.ensure_ingest()
        with trace_step("reconstruct"):
            reconstruct_mod.reconstruct(self.state, self.settings, mesh=self.mesh)
        self._stamp("reconstruct", t0)
        for kf in self.state.keyframes:
            self.log(f"KF {kf.start_frame:6d} PSNR-HVS: {self.state.kf_psnr[kf.index]:10.6f} (by tile)")
        self.log(f"All {self.state.n_frames:6d} PSNR-HVS: {self.state.total_psnr:10.6f} (by tile)")
        return self

    def reindex(self):
        t0 = time.monotonic()
        self.state.ensure_ingest()
        with trace_step("reindex"):
            reindex_mod.reindex(self.state, self.settings)
        self._stamp("reindex", t0)
        self.log(f"reindex: {len(self.state.corpus_pal_pixels)} final tiles")
        return self

    def save(self, path: Optional[str] = None):
        t0 = time.monotonic()
        self.state.ensure_ingest()
        self.stats = save_mod.save(self.state, self.settings, path or self.settings.output_file_name)
        self._stamp("save", t0)
        s = self.stats
        kbps = s.total_bytes / 1024.0 * 8.0 / max(1, s.frame_count) * self.state.fps
        self.log(f"written {s.total_bytes} bytes ({kbps:.2f} kbps)")
        return self

    def run_all(self, frames_rgb=None, fps: float = 24.0, out_path=None):
        if frames_rgb is not None:
            self.load_frames(frames_rgb, fps)
        elif self.state.n_frames == 0:
            self.load_video()
        return (
            self.predict_motion()
            .reduce()
            .prepare_palettes()
            .dither()
            .reconstruct()
            .reindex()
            .save(out_path)
        )

    def reload_gtm(self, path: str):
        """Re-import an encoded .gtm into encoder state for inspection
        (ReloadGTM, tilingencoder.pas:2059-2074; validation :5022-5030).
        Raises GTMReloadError when the stream doesn't match loaded video."""
        from ..bitstream.gtm import GTMReader
        from ..models.state import KeyFrameInfo, TileMapSoA

        g = GTMReader.read(path)
        if self.state.n_frames:
            problems = []
            if len(g.frames) != self.state.n_frames:
                problems.append(f"GTM FrameCount = {len(g.frames)}; FrameCount = {self.state.n_frames}")
            if g.width != self.state.width:
                problems.append(f"GTM ScreenWidth = {g.width}; ScreenWidth = {self.state.width}")
            if g.height != self.state.height:
                problems.append(f"GTM ScreenHeight = {g.height}; ScreenHeight = {self.state.height}")
            if problems:
                raise GTMReloadError("Mismatch between GTM and loaded video!\n" + "\n".join(problems))
        st = self.state
        st.tilemap_w, st.tilemap_h = g.tilemap_w, g.tilemap_h
        st.fps = g.fps or st.fps
        F, N = len(g.frames), g.tilemap_w * g.tilemap_h
        tm = TileMapSoA.zeros(F, N)
        for f, fr in enumerate(g.frames):
            tm.tile_idx[f] = fr.tile_idx
            tm.pal_idx[f] = fr.pal_idx
            tm.predicted[f] = fr.predicted
            tm.pred_x[f] = fr.pred_x
            tm.pred_y[f] = fr.pred_y
            tm.hmirror[f] = fr.hmirror
            tm.vmirror[f] = fr.vmirror
        st.tilemap = tm
        st.corpus_pal_pixels = g.tiles_pal
        st.corpus_use = np.zeros(len(g.tiles_pal), np.int64)
        used = tm.tile_idx[tm.tile_idx >= 0]
        np.add.at(st.corpus_use, used, 1)
        st.corpus_pal_initial = np.zeros(len(g.tiles_pal), np.int32)
        st.palettes_rgb = g.palettes_rgb
        st.palettes_valid = None if g.palettes_rgb is None else np.ones(g.palettes_rgb.shape[:2], bool)
        st.keyframes = []
        start = 0
        for k, is_end in enumerate([i for i, e in enumerate(g.keyframe_end) if e]):
            st.keyframes.append(KeyFrameInfo(k, start, is_end))
            start = is_end + 1
        st.frame_kf = np.zeros(F, np.int32)
        for kf in st.keyframes:
            st.frame_kf[kf.start_frame : kf.end_frame + 1] = kf.index
        return self

    # --- checkpoint/resume --------------------------------------------------
    def save_checkpoint(self, path: str):
        import dataclasses

        import jax

        self.state.ensure_ingest()  # the finalize closure isn't picklable
        st = self.state
        st._hashes_prefetch = None  # transient stage-overlap caches
        st._pal_hashes_prefetch = None
        restore = {}
        for fld in dataclasses.fields(st):
            v = getattr(st, fld.name)
            if isinstance(v, jax.Array):
                setattr(st, fld.name, np.asarray(v))
            elif isinstance(v, np.memmap):
                # disk-spilled array (host_ram_budget): pickling would
                # materialize it in RAM (ndarray reduces via tobytes);
                # np.save streams memmap pages -> sidecar .npy that
                # load_checkpoint re-maps instead of loading
                side = f"{path}.{fld.name}.npy"
                np.save(side, v)
                restore[fld.name] = v
                setattr(st, fld.name, _SpilledRef(os.path.basename(side)))
        try:
            with open(path, "wb") as f:
                pickle.dump({"state": st, "settings": self.settings}, f)
        finally:  # the live encoder keeps its memmaps usable
            for k, v in restore.items():
                setattr(st, k, v)

    @classmethod
    def load_checkpoint(cls, path: str, log=print) -> "Encoder":
        import dataclasses

        with open(path, "rb") as f:
            d = pickle.load(f)
        enc = cls(d["settings"], log=log)
        enc.state = d["state"]
        for fld in dataclasses.fields(enc.state):
            v = getattr(enc.state, fld.name)
            if isinstance(v, _SpilledRef):
                side = os.path.join(os.path.dirname(path) or ".", v.name)
                setattr(enc.state, fld.name, np.load(side, mmap_mode="r"))
        return enc

    def _stamp(self, step: str, t0: float):
        if os.environ.get("TILER_TPU_SYNC_STEPS"):
            # true per-step breakdown: drain async device work before
            # stamping (steps otherwise overlap via JAX async dispatch,
            # crediting device-resident outputs to the consuming step)
            import jax

            arrs = []
            for v in vars(self.state).values():
                if isinstance(v, jax.Array):
                    arrs.append(v)
                elif isinstance(v, (list, tuple)):  # _ingest_pieces
                    arrs.extend(x for x in jax.tree_util.tree_leaves(v)
                                if isinstance(x, jax.Array))
            jax.block_until_ready(arrs)
            # axon lazy-queue rule: block_until_ready does NOT flush
            # queued h2d transfers — a step whose output is a freshly
            # transferred array can "complete" instantly and bill the
            # cost to the consuming step. End the drain in an actual
            # value read over every live array (one tiny d2h pull).
            if arrs:
                import jax.numpy as jnp

                tot = None
                for v in arrs:
                    s = v.sum().astype(jnp.float32)
                    tot = s if tot is None else tot + s
                float(tot)
        dt = time.monotonic() - t0
        self.timings[step] = dt
        self.log(f"[{step}] {dt:.3f}s")

"""esLoad: frame ingest, tile extraction, mirror canonicalization,
inter-frame correlation, keyframe detection.

Replaces the per-frame worker-thread pipeline (TFrame.LoadFromImage /
AsyncLoadFromImage, tilingencoder.pas:1293-1427) with batched device ops:
tile scatter is a reshape, the mirror heuristic and per-tile mean-LAB
vectors are one batched pass, and the sequential Pearson-correlation chain
becomes one vectorized correlation over consecutive frame pairs.

Ingest/compute overlap (the reference's bounded-lookahead decode pipeline,
tilingencoder.pas:1323-1326): frames go up in PIECES whose h2d transfers
are all dispatched up front — they stream on the transfer path while the
tile pass of earlier pieces runs — and the only host pulls (bit-packed
mirror flags + correlations, ~N/4 bytes per frame) are DEFERRED into a
finalize closure that the motion step runs after dispatching its own
device work, so the pull and the keyframe loop hide under queued compute.
"""
from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EncoderSettings
from ..models.state import EncodeState, KeyFrameInfo, TileMapSoA
from ..ops.color import rgb_to_lab
from ..ops.metrics import pearson
from ..ops.tiles import canonicalize, pad_frame

TILE_W = 8


@jax.jit
def _load_chunk(frames):
    """frames [B, H, W, 3] uint8 -> (tiles_canon uint8 [B, N, 8, 8, 3],
    flags uint8 [B, N] = hmirror | vmirror<<1, corr f32 [B]).

    mean_lab is computed on the ORIGINAL orientation (PrepareInterFrameData
    runs before the mirror pass, tilingencoder.pas:1379 vs :1393). The
    Pearson chain runs ON DEVICE and only the [B] correlations + the
    bit-packed mirror flags cross to the host, in ONE deferred transfer
    (tunnel round trips dominate small pulls)."""
    B, H, W, _ = frames.shape
    t = frames.reshape(B, H // TILE_W, TILE_W, W // TILE_W, TILE_W, 3)
    t = t.transpose(0, 1, 3, 2, 4, 5).reshape(B, -1, TILE_W, TILE_W, 3)
    tf = t.astype(jnp.float32)
    mean_lab = jnp.mean(rgb_to_lab(tf), axis=(2, 3))  # [B, N, 3]
    canon, hm, vm = canonicalize(tf)
    lab_flat = mean_lab.reshape(B, -1)
    corr = jnp.ones(B, jnp.float32)
    if B > 1:
        corr = corr.at[1:].set(pearson(lab_flat[:-1], lab_flat[1:], axis=-1))
    flags = hm.astype(jnp.uint8) | (vm.astype(jnp.uint8) << 1)
    return canon.astype(jnp.uint8), flags, corr


def _detect_keyframes(F, corr, fps, settings, manual_keyframes):
    """FindKeyFrames parity (tilingencoder.pas:3361-3433)."""
    kf_flags = np.zeros(F, bool)
    if manual_keyframes is not None:
        kf_flags[0] = True
        for i in manual_keyframes:
            if 0 <= i < F:
                kf_flags[i] = True
        reasons = {i: "manual" for i in range(F) if kf_flags[i]}
    else:
        reasons = {}
        last_kf = -(2**30)
        min_len = settings.shot_trans_min_seconds_per_kf * fps
        max_len = settings.shot_trans_max_seconds_per_kf * fps
        for i in range(F):
            reason = None
            if i == 0:
                reason = "manual"
            elif corr[i] < settings.shot_trans_correl_lo_thres:
                reason = "decorrelation"
            elif (i - last_kf) >= max_len:
                reason = "length"
            if reason is not None and (i - last_kf) < min_len:
                reason = None
            if reason is not None:
                kf_flags[i] = True
                reasons[i] = reason
                last_kf = i
    return kf_flags, reasons


def load(state: EncodeState, frames_rgb, fps: float,
         settings: EncoderSettings,
         manual_keyframes: Optional[List[int]] = None,
         defer: bool = False,
         resample_to: Optional[tuple] = None) -> EncodeState:
    """Populate load-stage state from raw frames [F, H, W, 3] uint8, OR
    an io.video.PlanarClip (raw YUV planes), optionally resampling to
    resample_to=(H, W) ON DEVICE (ops/resample.py).

    Large arrays (frames, canonical tiles) stay DEVICE-resident — the
    host keeps only mirror flags, correlations and keyframe metadata
    (host<->device bandwidth is the scarce resource; SURVEY.md maps the
    reference's zlib in-RAM frame compression to HBM residency). Device
    ingest pushes that further: only SOURCE-resolution pixels cross h2d
    (raw 4:2:0 planes when the source is planar), and chroma upsample +
    YUV->RGB + the Lanczos `Scaling` resize run on chip — the reference
    does all of this on the host because it has no device
    (extern.pas:759-789).

    defer=True leaves the host pulls + keyframe detection in
    state._finalize_ingest (see module docstring); every downstream
    consumer of keyframes/flags calls state.ensure_ingest() first.
    """
    from ..io.video import PlanarClip

    planar = isinstance(frames_rgb, PlanarClip)
    device_ingest = planar or resample_to is not None
    if device_ingest:
        if planar:
            Fd, sh, sw = frames_rgb.y.shape
        else:
            Fd, sh, sw = frames_rgb.shape[:3]
        th, tw = resample_to if resample_to is not None else (sh, sw)
        if not planar and (th, tw) == (sh, sw):
            device_ingest = False  # no conversion and no resize: the
            # plain host-RGB path below is the same thing
        Hp = -(-th // TILE_W) * TILE_W
        Wp = -(-tw // TILE_W) * TILE_W
        Nn = (Hp // TILE_W) * (Wp // TILE_W)
        if Fd * Hp * Wp * 3 + Fd * Nn * 192 > getattr(
                settings, "hbm_frames_budget", 8e9):
            # device ingest needs HBM-resident target frames (the
            # host-streaming/spill modes exist precisely because frames
            # DON'T fit HBM) — materialize on host and fall through to
            # the host path below
            src = frames_rgb.to_rgb_host(1.0) if planar else frames_rgb
            if (th, tw) != (sh, sw):
                from PIL import Image

                src = np.stack([np.asarray(
                    Image.fromarray(np.asarray(f)).resize(
                        (tw, th), Image.LANCZOS)) for f in src])
            frames_rgb = src
            device_ingest = False

    if not device_ingest:
        if not frames_rgb.flags["C_CONTIGUOUS"]:
            # only copy when actually needed: np.ascontiguousarray strips
            # the np.memmap subclass, which would silently re-materialize a
            # disk-spilled frames array in RAM (and break the checkpoint
            # sidecar's isinstance(np.memmap) detection)
            frames_rgb = np.ascontiguousarray(frames_rgb)
        if frames_rgb.shape[1] % TILE_W or frames_rgb.shape[2] % TILE_W:
            if isinstance(frames_rgb, np.memmap):
                # disk-spilled ingest (_FrameSink with spill_budget): padding
                # via np.stack would re-materialize the whole beyond-RAM clip
                # in memory AND strip the memmap subclass the checkpoint
                # sidecar detection relies on — pad chunk-by-chunk into a
                # fresh spill memmap instead (bounded RAM, stays on disk)
                from ..utils.spill import spill_memmap

                Fm = frames_rgb.shape[0]
                h0, w0 = frames_rgb.shape[1], frames_rgb.shape[2]
                hp = -(-h0 // TILE_W) * TILE_W
                wp = -(-w0 // TILE_W) * TILE_W
                dest = spill_memmap((Fm, hp, wp, 3), dtype=frames_rgb.dtype)
                step = max(1, int(256e6 / max(1, hp * wp * 3)))
                for i in range(0, Fm, step):
                    j = min(Fm, i + step)
                    dest[i:j] = np.stack(
                        [pad_frame(f) for f in frames_rgb[i:j]])
                frames_rgb = dest
            else:
                frames_rgb = np.stack([pad_frame(f) for f in frames_rgb])
        F, H, W, _ = frames_rgb.shape
    else:
        F, H, W = Fd, Hp, Wp
    state.fps = float(fps)
    state.tilemap_h = H // TILE_W
    state.tilemap_w = W // TILE_W
    N = state.tilemap_size

    # videos beyond the HBM budget stream from host RAM instead (the
    # reference's zlib in-RAM memory folding, tilingencoder.pas:1081-1152;
    # stages slice and transfer per chunk / per keyframe)
    total_bytes = F * H * W * 3 + F * N * 192
    device_resident = device_ingest or total_bytes <= getattr(
        settings, "hbm_frames_budget", 8e9)

    # …and beyond the HOST budget, the canonical tiles spill to a disk
    # memmap (frames usually already arrive memmap-backed from the
    # _FrameSink spill; consumers slice both in bounded chunks either way)
    ram_budget = getattr(settings, "host_ram_budget", 0.0)
    spill = not device_resident and 0 < ram_budget < total_bytes
    if spill:
        from ..utils.spill import spill_memmap

        tiles_dest = spill_memmap((F, N, TILE_W, TILE_W, 3))

    # piece size: bounds the fp32 tile-pass transients (~6 frame-sized
    # fp32 arrays) to ~2 GB AND keeps several h2d transfers in flight so
    # the tile pass of piece i overlaps the transfer of piece i+1
    per_frame_transient = H * W * 3 * 4 * 6
    piece = max(1, min(F, int(2e9 / per_frame_transient), max(4, F // 4)))

    # jnp.asarray (NOT device_put-to-a-device): the transfer dispatches
    # immediately either way, but an explicit device pin would COMMIT the
    # array and poison later multi-device (mesh) programs that need to
    # re-shard it
    starts = list(range(0, F, piece))
    if device_ingest:
        # put() ships only SOURCE-resolution bytes and queues the
        # conversion program behind them; the returned piece is the
        # converted uint8 RGB at padded target resolution, so everything
        # downstream (tile pass, motion, pieces list) is unchanged
        from ..ops.resample import lanczos_matrix, planar_to_rgb, resize_rgb

        need_resize = (th, tw) != (sh, sw)
        lh = jnp.asarray(lanczos_matrix(sh, th) if need_resize
                         else np.zeros((1, 1), np.float32))
        lw = jnp.asarray(lanczos_matrix(sw, tw) if need_resize
                         else np.zeros((1, 1), np.float32))
        if planar:
            clip = frames_rgb

            def put(i):
                s = slice(starts[i], starts[i] + piece)
                return planar_to_rgb(
                    jnp.asarray(clip.y[s]), jnp.asarray(clip.u[s]),
                    jnp.asarray(clip.v[s]), lh, lw,
                    out_h=th, out_w=tw, resize=need_resize)
        else:
            src_rgb = frames_rgb

            def put(i):
                s = slice(starts[i], starts[i] + piece)
                return resize_rgb(jnp.asarray(src_rgb[s]), lh, lw,
                                  out_h=th, out_w=tw)
    else:
        put = lambda i: jnp.asarray(frames_rgb[starts[i] : starts[i] + piece])
    if device_resident:
        # all transfers dispatched up front; they stream while compute runs
        pieces = [put(i) for i in range(len(starts))]
        get = pieces.__getitem__
    else:
        # host-RAM streaming: only a 1-piece lookahead lives on device
        # (the whole video would blow the HBM budget this mode exists for)
        window = {0: put(0)}

        def get(i):
            if i + 1 < len(starts):
                window[i + 1] = put(i + 1)
            return window.pop(i)

    # pipelined ingest: with defer=True the frame/tile concats stay OUT of
    # the dispatch stream, exposing per-piece arrays so predict_motion's
    # programs can start on piece 0 while pieces 1..n still stream over
    # h2d (a concat is one op needing ALL pieces — a hard barrier that
    # measured as the whole load step serializing in front of motion).
    # Pieces need >= 2 leading frames for the frame-0-predicts-frame-1
    # special case to stay within piece 0.
    pipelined = (
        defer and device_resident and len(starts) > 1 and piece >= 2
    )
    tiles_parts, flag_parts, corr_parts = [], [], []
    ctx = {"tail": None}

    def run_chunk(pi):
        p = get(pi)
        # 1-frame overlap keeps the on-device Pearson chain exact across
        # piece boundaries (tilingencoder.pas:1385-1388, :2201)
        tail = ctx["tail"]
        inp = p if tail is None else jnp.concatenate([tail, p])
        skip = 0 if tail is None else 1
        tc, fl, c = _load_chunk(inp)
        if spill:  # write-through per piece: no parts list + no 2x concat
            tiles_dest[starts[pi] : starts[pi] + (tc.shape[0] - skip)] = (
                np.asarray(tc[skip:]))
        else:
            tiles_parts.append(
                tc[skip:] if device_resident else np.asarray(tc[skip:]))
        flag_parts.append(fl[skip:])
        corr_parts.append(c[skip:])
        ctx["tail"] = p[-1:]
        if pipelined and pi == len(starts) - 1:
            # last piece's pass just dispatched: concat the (tiny)
            # flag/corr parts now and start their host copies, so they
            # stream behind the queued motion programs and _finalize's
            # pull doesn't pay a fresh tunnel round-trip after the whole
            # queue drains (the non-pipelined path prefetches below)
            fd = (flag_parts[0] if len(flag_parts) == 1
                  else jnp.concatenate(flag_parts))
            cd = (corr_parts[0] if len(corr_parts) == 1
                  else jnp.concatenate(corr_parts))
            try:
                fd.copy_to_host_async()
                cd.copy_to_host_async()
            except Exception:
                pass
            ctx["flags_corr"] = (fd, cd)

    if pipelined:
        # dispatch NO tile pass here: the device executes programs in
        # dispatch order, so enqueueing every pass now would park
        # predict_motion's first program behind the last piece's pass,
        # which waits on the final h2d bytes (measured r4: only ~0.3 s of
        # the 0.78 s load step hid under compute). predict_motion calls
        # state.run_ingest_chunk(p) after dispatching piece p's motion,
        # interleaving passes with motion while later pieces transfer.
        state.frames_rgb = None
        state.tiles_canon = None
        state._ingest_pieces = (pieces, tiles_parts)
        state._ingest_chunk_jobs = [
            (lambda pi=pi: run_chunk(pi)) for pi in range(len(starts))]
        state._ingest_chunk_next = 0
        if os.environ.get("TILER_TPU_INGEST_EAGER"):
            # profiling hook: dispatch every tile pass here (the r3
            # ordering) so within-window A/Bs can isolate the interleave
            # (window-to-window tunnel variance swamps cross-window
            # comparisons); not a config surface
            state.run_ingest_chunk(len(starts) - 1)
    else:
        for pi in range(len(starts)):
            run_chunk(pi)
        if device_resident:
            state.frames_rgb = (
                pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces))
        else:
            state.frames_rgb = frames_rgb
    cat = jnp.concatenate if device_resident else np.concatenate
    if spill:
        state.tiles_canon = tiles_dest
    elif not pipelined:
        state.tiles_canon = tiles_parts[0] if len(tiles_parts) == 1 else cat(tiles_parts)
    if not pipelined:
        flags_dev = flag_parts[0] if len(flag_parts) == 1 else jnp.concatenate(flag_parts)
        corr_dev = corr_parts[0] if len(corr_parts) == 1 else jnp.concatenate(corr_parts)
        # start the (tiny) host copies now: they stream behind the queued
        # tile-pass programs and are already local when _finalize runs
        try:
            flags_dev.copy_to_host_async()
            corr_dev.copy_to_host_async()
        except Exception:
            pass

    tm = TileMapSoA.zeros(F, N)
    state.tilemap = tm

    def _finalize():
        if state._ingest_pieces is not None:
            # dispatch any tile passes predict_motion didn't get to
            # (stepwise runs, checkpointing, the mesh motion path)
            state.run_ingest_chunk(len(starts) - 1)
            fp, tp = state._ingest_pieces
            state._ingest_pieces = None
            # concatenate frames and tiles SEQUENTIALLY, dropping each
            # piece list before the next concat: holding both pieces and
            # both concats at once transiently doubles the resident
            # footprint near the HBM frames budget
            state.frames_rgb = fp[0] if len(fp) == 1 else jnp.concatenate(fp)
            del fp
            state.tiles_canon = tp[0] if len(tp) == 1 else jnp.concatenate(tp)
            del tp
        if pipelined:
            fd, cd = ctx["flags_corr"]  # prefetched by the last chunk job
        else:
            fd, cd = flags_dev, corr_dev
        flags = np.asarray(fd)  # one small pull (N/4 bytes/frame)
        corr = np.asarray(cd).copy()
        if F > 0:
            corr[0] = 1.0
        tm.hmirror = (flags & 1) != 0
        tm.vmirror = (flags & 2) != 0
        state.correlations = corr

        kf_flags, reasons = _detect_keyframes(
            F, corr, fps, settings, manual_keyframes)
        kf_idx = np.cumsum(kf_flags) - 1
        state.frame_kf = kf_idx.astype(np.int32)
        state.keyframes = []
        kf_starts = np.flatnonzero(kf_flags)
        for k, s in enumerate(kf_starts):
            e = (kf_starts[k + 1] - 1) if k + 1 < len(kf_starts) else F - 1
            state.keyframes.append(
                KeyFrameInfo(k, int(s), int(e), reasons.get(int(s), "manual")))

    if defer:
        state._finalize_ingest = _finalize
    else:
        _finalize()
    return state

"""esLoad: frame ingest, tile extraction, mirror canonicalization,
inter-frame correlation, keyframe detection.

Replaces the per-frame worker-thread pipeline (TFrame.LoadFromImage /
AsyncLoadFromImage, tilingencoder.pas:1293-1427) with batched device ops:
tile scatter is a reshape, the mirror heuristic and per-tile mean-LAB
vectors are one batched pass, and the sequential Pearson-correlation chain
becomes one vectorized correlation over consecutive frame pairs.
"""
from __future__ import annotations

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
    """frames [B, H, W, 3] uint8 -> (tiles_canon uint8, packed f32 [B, N, 4]
    = (hmir, vmir, correlation broadcast, spare)).

    mean_lab is computed on the ORIGINAL orientation (PrepareInterFrameData
    runs before the mirror pass, tilingencoder.pas:1379 vs :1393). The
    Pearson chain runs ON DEVICE and only [B] correlations + the mirror
    flags cross to the host in ONE packed transfer (tunnel round trips
    dominate small pulls)."""
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
    packed = jnp.stack(
        [hm.astype(jnp.float32), vm.astype(jnp.float32)], axis=-1
    )  # [B, N, 2]
    return canon.astype(jnp.uint8), packed, corr


def load(state: EncodeState, frames_rgb: np.ndarray, fps: float,
         settings: EncoderSettings, chunk: int = 32,
         manual_keyframes: Optional[List[int]] = None) -> EncodeState:
    """Populate load-stage state from raw frames [F, H, W, 3] uint8.

    Large arrays (frames, canonical tiles) stay DEVICE-resident — the
    host keeps only mirror flags, correlations and keyframe metadata
    (host<->device bandwidth is the scarce resource; SURVEY.md maps the
    reference's zlib in-RAM frame compression to HBM residency).
    """
    frames_rgb = np.ascontiguousarray(frames_rgb)
    if frames_rgb.shape[1] % TILE_W or frames_rgb.shape[2] % TILE_W:
        frames_rgb = np.stack([pad_frame(f) for f in frames_rgb])
    F, H, W, _ = frames_rgb.shape
    state.fps = float(fps)
    state.tilemap_h = H // TILE_W
    state.tilemap_w = W // TILE_W
    N = state.tilemap_size

    # videos beyond the HBM budget stream from host RAM instead (the
    # reference's zlib in-RAM memory folding, tilingencoder.pas:1081-1152;
    # stages slice and transfer per chunk / per keyframe)
    total_bytes = frames_rgb.nbytes + F * N * 192
    device_resident = total_bytes <= getattr(settings, "hbm_frames_budget", 8e9)
    if device_resident:
        state.frames_rgb = jnp.asarray(frames_rgb)  # one h2d
    else:
        state.frames_rgb = frames_rgb

    tiles_parts = []
    hm = np.empty((F, N), bool)
    vm = np.empty((F, N), bool)
    # inter-frame Pearson correlation (tilingencoder.pas:1385-1388, :2201)
    # computed on device inside _load_chunk; chunks overlap by one frame so
    # the chain stays exact across chunk boundaries
    corr = np.ones(F, np.float32)
    if device_resident:
        # one dispatch when the fp32 transients fit: _load_chunk stages
        # ~6 frame-sized fp32 arrays (tf/lab/canon + fusion slack), so an
        # unbounded chunk near the 8e9 frame budget could blow HBM —
        # bound the transients to ~2 GB and let the packed per-chunk pull
        # amortize the tunnel latency beyond that
        per_frame_transient = frames_rgb.shape[1] * frames_rgb.shape[2] * 3 * 4 * 6
        chunk = max(1, min(F, int(2e9 / per_frame_transient)))
    for i in range(0, F, chunk):
        lo = max(0, i - 1)  # 1-frame overlap for the correlation chain
        tc, packed, c = _load_chunk(jnp.asarray(state.frames_rgb[lo : i + chunk]))
        skip = i - lo
        packed_h = np.asarray(packed[skip:])  # one transfer per chunk
        tc = tc[skip:]
        tiles_parts.append(tc if device_resident else np.asarray(tc))
        hm[i : i + chunk] = packed_h[..., 0] != 0.0
        vm[i : i + chunk] = packed_h[..., 1] != 0.0
        corr[i : i + chunk] = np.asarray(c)[skip:]
    if F > 0:
        corr[0] = 1.0

    cat = jnp.concatenate if device_resident else np.concatenate
    state.tiles_canon = tiles_parts[0] if len(tiles_parts) == 1 else cat(tiles_parts)
    tm = TileMapSoA.zeros(F, N)
    tm.hmirror = hm
    tm.vmirror = vm
    state.tilemap = tm
    state.correlations = corr

    # keyframe detection (FindKeyFrames, tilingencoder.pas:3361-3433)
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

    kf_idx = np.cumsum(kf_flags) - 1
    state.frame_kf = kf_idx.astype(np.int32)
    state.keyframes = []
    starts = np.flatnonzero(kf_flags)
    for k, s in enumerate(starts):
        e = (starts[k + 1] - 1) if k + 1 < len(starts) else F - 1
        state.keyframes.append(KeyFrameInfo(k, int(s), int(e), reasons.get(int(s), "manual")))
    return state

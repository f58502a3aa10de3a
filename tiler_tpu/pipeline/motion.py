"""Motion prediction: windowed weighted-DCT L2 search, batched on device.

Replaces the reference's per-tile double loop over (2R)^2 candidate offsets
with SSE distance kernels (TFrame.PredictMotion, tilingencoder.pas:1154-1290):

  1. The weighted-DCT of EVERY 8x8 window of the reference frame is one
     grouped convolution (192 filters = DCT basis x PSNR-HVS weights) —
     MXU work, no per-window loop.
  2. Candidate distances use |t - w|^2 = |t|^2 - 2 t.w + |w|^2 ; offsets
     split o = 8q + s into block shifts and phases, and the cross terms
     come REVERSED: each field block runs one matmul against its 2Qx2Q
     neighboring tiles, so the (large) window field is read exactly once
     per frame and all slicing is static — no gathers on the hot path.
  3. A Manhattan-distance penalty toward the zero offset breaks ties in
     favor of compressible motion vectors (reference :1232-1235).

Search window parity: for radius R the reference scans offsets
[dy-R, dy+R-1] x [dx-R, dx+R-1] clipped to the frame (:1209-1214 after the
Dec(ARadius) at :1265); out-of-frame windows are masked with +inf here.

Deviation from the reference: window features stay float32 instead of the
reference's int16 rounding (tilingencoder.pas:3126) — distances differ by
well under the quantization noise, selection may differ on near-ties.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.color import rgb_to_yuv
from ..ops.dct import DCT_MAT, DCT_WEIGHTS

TILE_W = 8
K = 192


@functools.lru_cache(maxsize=None)
def _window_filters():
    """[8, 8, 1, 192] HWIO grouped-conv filters: for input channel c (group),
    output channel c*64 + v*8+u is the weighted DCT basis function."""
    D = DCT_MAT  # [u, x]
    f = np.einsum("vy,ux->vuyx", D, D)  # [v, u, y, x]
    w = DCT_WEIGHTS  # [c, v, u]
    filt = np.einsum("cvu,vuyx->yxcvu", w, f)  # [y, x, c, v, u]
    return filt.reshape(8, 8, 3, 64).astype(np.float32)


def window_dct_field(frame_rgb):
    """Weighted-DCT features of every 8x8 window. frame_rgb [H, W, 3] float.

    Returns [H-7, W-7, 192] float32 (channel blocks of 64 in (v,u) raster
    order — NOT zigzagged; L2 distances are permutation-invariant).
    """
    yuv = rgb_to_yuv(frame_rgb.astype(jnp.float32))
    # grouped conv (feature_group_count=3): input channel c produces output
    # channels [c*64, (c+1)*64) — the (v,u) raster DCT block of that channel.
    filt = jnp.asarray(_window_filters()).reshape(8, 8, 1, 192)
    out = jax.lax.conv_general_dilated(
        yuv[None],  # [1, H, W, 3]
        filt,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=3,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0]  # [H-7, W-7, 192]


def _window_field_bf16(frame_rgb, dims: int = K):
    """Ranking-precision window field: same conv in bfloat16 (7x faster on
    the MXU than the fp32-HIGHEST variant; the winner's error is
    recomputed exactly from pixels afterwards).

    dims < 192 keeps only the per-channel low-frequency DCT block (the
    r x r corner, r = sqrt(dims/3)) — the same prescreening idea as the
    reference's own 8-coefficient early reject (QuickTestEuclideanDCTPtr,
    utils.pas:761-780); see _motion_core for how the winner stays exact.

    NOT a convolution: XLA's grouped 8x8/192-channel conv measured ~25 ms
    per 720p frame on v5e (vs a ~2 ms bandwidth floor). The separable DCT
    as two 8-term shifted elementwise sums fuses into two VPU passes."""
    yuv = rgb_to_yuv(frame_rgb.astype(jnp.float32))
    H, W = yuv.shape[0], yuv.shape[1]
    r = 8 if dims == K else _lowfreq_side(dims)
    D = np.asarray(DCT_MAT, np.float64)[:r]  # [r(u/v), 8(x/y)]
    w = np.asarray(DCT_WEIGHTS, np.float64)[:, :r, :r]  # [c, v, u]
    # pass A (x contraction): A[h, w', c, u] = sum_x D[u,x] yuv[h, w'+x, c]
    A = sum(
        yuv[:, x : x + W - 7, :, None] * jnp.asarray(D[:, x], jnp.float32)
        for x in range(8)
    )  # [H, W-7, 3, r] f32 — the unweighted partial sums are O(1e3) while
    # high-frequency outputs are O(1), so a bf16 intermediate here loses
    # them entirely (measured 15% relative error); only the FINAL weighted
    # feature is safe to round
    # pass B (y contraction + PSNR-HVS weights):
    # F[h', w', c, v, u] = w[c,v,u] * sum_y D[v,y] A[h'+y, w', c, u]
    F = sum(
        A[y : y + H - 7, :, :, None, :]
        * jnp.asarray(D[:, y], jnp.float32)[:, None]
        for y in range(8)
    )
    F = F * jnp.asarray(w, jnp.float32)
    return F.astype(jnp.bfloat16).reshape(H - 7, W - 7, dims)


def _window_field_blocks(frame_rgb, mu, P: int, mh: int, mw: int, dims: int):
    """Centered window-DCT field DIRECTLY in the padded block layout:
    Fblk[m, n, s=(sy,sx), k] bf16 and its norms N2blk[m, n, 64] f32 with
    +inf at out-of-frame windows.

    Equivalent to _window_field_bf16 -> center -> pad -> blockify -> norm,
    but the separate layout passes (measured ~17 ms/720p-frame of pure
    HBM shuffling) disappear: the pixel frame is pre-padded by P, pass A
    contracts x, and pass B's stride-8 slices emit each (sy, sx) phase
    straight into its block position — the stack IS the blocked layout."""
    yuv = rgb_to_yuv(frame_rgb.astype(jnp.float32))
    H, W = yuv.shape[0], yuv.shape[1]
    HP, WP = mh * TILE_W, mw * TILE_W
    yuvp = jnp.pad(yuv, ((P, HP + 7 - H - P), (P, WP + 7 - W - P), (0, 0)))
    r = 8 if dims == K else _lowfreq_side(dims)
    D = np.asarray(DCT_MAT, np.float64)[:r]  # [r, 8]
    w = np.asarray(DCT_WEIGHTS, np.float64)[:, :r, :r]  # [c, v, u]
    # pass A (x contraction): A[h, n, sx, c, u]
    A = sum(
        yuvp[:, x : x + WP, :, None] * jnp.asarray(D[:, x], jnp.float32)
        for x in range(8)
    ).reshape(HP + 7, mw, TILE_W, 3, r)
    # pass B (y contraction): stride-8 slices collapse the row index to m
    Dj = jnp.asarray(D, jnp.float32)
    mats = []
    for sy in range(TILE_W):
        F_sy = sum(
            A[sy + y : sy + y + HP : TILE_W][..., None, :] * Dj[:, y][:, None]
            for y in range(8)
        )  # [mh, mw, 8sx, 3, r(v), r(u)]
        mats.append(F_sy)
    Fblk = jnp.stack(mats, axis=2)  # [mh, mw, 8sy, 8sx, 3, r, r]
    Fblk = Fblk * jnp.asarray(w, jnp.float32) - mu.reshape(3, r, r)
    Fblk = Fblk.astype(jnp.bfloat16).reshape(mh, mw, 64, dims)
    n2 = jnp.sum(
        Fblk.astype(jnp.float32) * Fblk.astype(jnp.float32), axis=-1
    )  # [mh, mw, 64]
    # windows whose top-left field position falls outside [0, H-7) x
    # [0, W-7) never existed; +inf norms mask them out of the search
    fy = (jnp.arange(mh) * TILE_W)[:, None] + jnp.arange(TILE_W)[None, :] - P
    fx = (jnp.arange(mw) * TILE_W)[:, None] + jnp.arange(TILE_W)[None, :] - P
    vy = (fy >= 0) & (fy <= H - TILE_W)  # [mh, 8sy]
    vx = (fx >= 0) & (fx <= W - TILE_W)  # [mw, 8sx]
    valid = (vy[:, None, :, None] & vx[None, :, None, :]).reshape(mh, mw, 64)
    N2blk = jnp.where(valid, n2, jnp.inf)
    return Fblk, N2blk


def _window_field_blocks_im2row(frame_rgb, mu, P: int, mh: int, mw: int,
                                dims: int):
    """_window_field_blocks computed as ONE MXU contraction: im2row every
    window's 64 pixels (64 shifted slices + a ones row — contiguous
    copies at ~bandwidth), multiply against the weighted 2D-DCT basis
    with the -mu centering folded into the ones row, cast bf16, then the
    Pallas blockify relayout (kernels/blockify.py — K stays on lanes, so
    the permute is sublane-only VMEM movement).

    Replaces the pass-A/pass-B shifted elementwise accumulations, which
    the r5 roofline measured at ~20-25 ms/720p frame against a ~2 ms
    bandwidth floor (the ~900 MB f32 accumulator re-materializes per
    term; every XLA reformulation in scripts/ab_field.py stayed 19-35
    ms). Values match _window_field_blocks to f32-contraction-order
    rounding (HIGH-precision matmul vs the VPU f32 add chain) — ranking
    only; the motion winner's error is recomputed exactly either way."""
    from ..kernels.blockify import blockify_field

    yuv = rgb_to_yuv(frame_rgb.astype(jnp.float32))
    H, W = yuv.shape[0], yuv.shape[1]
    HP, WP = mh * TILE_W, mw * TILE_W
    yuvp = jnp.pad(yuv, ((P, HP + 7 - H - P), (P, WP + 7 - W - P), (0, 0)))
    r = 8 if dims == K else _lowfreq_side(dims)
    # weighted basis with the centering folded in: row 64 is all-ones on
    # the X side and -mu on the basis side
    D = np.asarray(DCT_MAT, np.float64)
    basis = np.einsum("vy,ux->yxvu", D, D).reshape(64, 8, 8)[:, :r, :r]
    w = np.asarray(DCT_WEIGHTS, np.float64)[:, :r, :r]  # [c, v, u]
    Bw = np.einsum("xvu,cvu->cxvu", basis, w).reshape(3, 64, r * r)
    # -mu (a traced per-frame value) rides the ones row of X
    B3 = jnp.concatenate(
        [jnp.asarray(Bw, jnp.float32), -mu.reshape(3, r * r)[:, None, :]],
        axis=1,
    )  # [3, 65, r*r]
    X = jnp.stack(
        [yuvp[y : y + HP, x : x + WP] for y in range(8) for x in range(8)]
        + [jnp.ones((HP, WP, 3), jnp.float32)],
        axis=-2,
    )  # [HP, WP, 65, 3]
    F = jnp.einsum("hwxc,cxk->hwck", X, B3,
                   precision=jax.lax.Precision.HIGH)
    Fblk = blockify_field(
        F.reshape(HP, WP, dims).astype(jnp.bfloat16))  # [mh, mw, 64, dims]
    n2 = jnp.sum(Fblk.astype(jnp.float32) * Fblk.astype(jnp.float32), axis=-1)
    fy = (jnp.arange(mh) * TILE_W)[:, None] + jnp.arange(TILE_W)[None, :] - P
    fx = (jnp.arange(mw) * TILE_W)[:, None] + jnp.arange(TILE_W)[None, :] - P
    vy = (fy >= 0) & (fy <= H - TILE_W)
    vx = (fx >= 0) & (fx <= W - TILE_W)
    valid = (vy[:, None, :, None] & vx[None, :, None, :]).reshape(mh, mw, 64)
    return Fblk, jnp.where(valid, n2, jnp.inf)


def _lowfreq_side(dims: int) -> int:
    r = int(round((dims / 3) ** 0.5))
    if 3 * r * r != dims:
        raise ValueError(f"motion rank dims must be 3*r^2, got {dims}")
    return r


def _lowfreq_tiles(T, dims: int):
    """Subset tile features [..., 192] (c,v,u raster) to the per-channel
    low-frequency r x r block -> [..., dims]. Static strided slices."""
    r = _lowfreq_side(dims)
    return T.reshape(*T.shape[:-1], 3, 8, 8)[..., :r, :r].reshape(
        *T.shape[:-1], dims
    )


@functools.lru_cache(maxsize=None)
def _dct_basis64():
    """[(y,x), (v,u)] 2D-DCT basis, accumulated in float64."""
    D = np.asarray(DCT_MAT, np.float64)
    return np.einsum("vy,ux->vuyx", D, D).reshape(64, 64).T.astype(np.float32)


def tile_features_raster(tiles_rgb):
    """Weighted-DCT YUV features in (c, v, u) raster layout (no zigzag);
    tiles_rgb [..., 8, 8, 3] -> [..., 192].

    One [*, 64] x [64, 64] basis matmul (HIGH precision, ~fp32 mantissa)
    instead of two 8-dim HIGHEST contractions: 8-wide dots pad the MXU
    tile 16x in both K and N (<1% utilization) and HIGHEST doubles the
    bf16 pass count again — measured 31.6 ms -> ~2 ms for one 720p
    frame's 14400 tiles."""
    yuv = rgb_to_yuv(tiles_rgb.astype(jnp.float32))
    lead = yuv.shape[:-3]
    x = jnp.moveaxis(yuv, -1, -3).reshape(*lead, 3, 64)
    z = jnp.matmul(x, jnp.asarray(_dct_basis64()),
                   precision=jax.lax.Precision.HIGH)  # [..., 3, (v,u)]
    w = jnp.asarray(DCT_WEIGHTS, jnp.float32).reshape(3, 64)
    return (z * w).reshape(*lead, K)


def make_penalty(radius: int, P: int) -> np.ndarray:
    """pen[s=(sy,sx), q=(qy,qx)] = |oy| + |ox| with +inf outside the
    [-R, R-1] search square (reference tilingencoder.pas:1209-1214,
    :1232-1235). NQ = 2*P/8 block offsets per axis."""
    NQ = 2 * (P // TILE_W)
    s = np.arange(TILE_W)
    q = np.arange(NQ) * TILE_W - P
    o = q[:, None] + s[None, :]  # oy[qy, sy]
    val = (o >= -radius) & (o <= radius - 1)
    pen1 = np.where(val, np.abs(o).astype(np.float32), np.inf)  # [qy, sy]
    pen = (
        pen1[:, None, :, None] + pen1[None, :, None, :]
    )  # [qy, qx, sy, sx]
    return (
        pen.transpose(2, 3, 0, 1).reshape(64, NQ * NQ).astype(np.float32)
    )  # [s, q]


@functools.partial(jax.jit,
                   static_argnames=("radius", "int16", "rank_dims", "field_impl"))
def motion_search_batch(cur_rgb, prev_rgb, radius: int, int16: bool = False,
                        rank_dims: int = K, field_impl: str = "passes"):
    """Batched motion search over leading frame axis [B, H, W, 3].

    lax.map (scan) instead of vmap: the rank core is a Pallas kernel and
    per-frame sequencing also bounds the transient field memory."""
    return jax.lax.map(
        lambda ab: _motion_core(ab[0], ab[1], radius, int16, rank_dims,
                                field_impl=field_impl),
        (cur_rgb, prev_rgb),
    )


@functools.partial(jax.jit,
                   static_argnames=("radius", "int16", "rank_dims", "field_impl"))
def motion_search(cur_rgb, prev_rgb, radius: int, int16: bool = False,
                  rank_dims: int = K, field_impl: str = "passes"):
    return _motion_core(cur_rgb, prev_rgb, radius, int16, rank_dims,
                        field_impl=field_impl)


def _motion_core(cur_rgb, prev_rgb, radius: int, int16: bool = False,
                 rank_dims: int = K, return_windows: bool = False,
                 field_impl: str = "passes"):
    """Full-frame motion search of cur against prev.

    cur_rgb/prev_rgb: [H, W, 3] float or uint8 (H, W multiples of 8).
    Returns (pred_y, pred_x) int32 [Th, Tw] and err float32 [Th, Tw]
    (squared weighted-DCT L2 + Manhattan tie penalty, reference :1228-1244);
    with return_windows also the winner's window pixels [Th*Tw, 8, 8, 3]
    f32 (already gathered for the exact error — phase B reuses them as
    the prediction render instead of a per-pixel patch gather).

    rank_dims < 192 ranks candidates on the per-channel low-frequency DCT
    block only (PSNR-HVS weights already concentrate the energy there; the
    reference's own asm prescreens with its first 8 coefficients) — 4x less
    field traffic at dims=48. The winner's error is ALWAYS recomputed
    exactly from pixels in full 192-dim fp32, so only near-tie vector
    choices can differ; the reported err is exact either way.
    """
    H, W = cur_rgb.shape[0], cur_rgb.shape[1]
    th, tw = H // TILE_W, W // TILE_W
    R = int(radius)
    # blocks per side, rounded up to a power of two: the rank kernel's
    # grouped output stores need (2Q)^2 divisible by 8 (or <= 8); the
    # penalty table masks the exact [-R, R-1] square regardless
    Q = 1
    while Q * TILE_W < R:
        Q *= 2
    P = Q * TILE_W

    KR = int(rank_dims)
    # tile features of current frame (natural orientation = raw frame)
    cur = cur_rgb.astype(jnp.float32).reshape(th, TILE_W, tw, TILE_W, 3).swapaxes(1, 2)
    T = tile_features_raster(cur)  # [th, tw, 192]
    if int16:  # SmallInt feature semantics (tilingencoder.pas:3126)
        T = jnp.round(T)
    Tr = T if KR == K else _lowfreq_tiles(T, KR)

    # center both sides by the mean tile feature: |T - W|^2 is invariant,
    # but the DC energy leaves the cross terms/norms, so the bf16 einsum
    # output (rounded at 0.4% of |D|) stops quantizing candidate gaps away
    mu = jnp.mean(Tr.reshape(-1, KR), axis=0)
    Tc = Tr - mu
    T2 = jnp.sum(Tc * Tc, axis=-1)  # [th, tw]

    # geometry: field index = tile_pixel_pos + offset + P
    mh = -(-(H - 7 + 2 * P) // TILE_W)
    mw = -(-(W - 7 + 2 * P) // TILE_W)
    NQ = 2 * Q
    pen_np = make_penalty(R, P)  # [64(s), NQ^2(q)] +inf masked
    Tb = Tc.astype(jnp.bfloat16)
    tpad = jnp.pad(Tb, ((NQ - 1, mh - th), (NQ - 1, mw - tw), (0, 0)))

    # window field of previous frame, centered, already in block layout —
    # bf16: ranking only (the winner's error is recomputed exactly below)
    if field_impl == "im2row":
        Fblk_mn, N2blk_mn = _window_field_blocks_im2row(
            prev_rgb, mu, P, mh, mw, KR)
    else:
        Fblk_mn, N2blk_mn = _window_field_blocks(prev_rgb, mu, P, mh, mw, KR)

    # XLA hybrid rank. (A fused Pallas rank kernel was built and measured
    # in round 2 but lost to this path: Mosaic cannot lower its batched
    # contraction to the MXU — batch dims must share positions and the
    # per-position rhs layout is unbuildable in VMEM — so it ran VPU-bound;
    # removed in round 3, see git history for the experiment.) Measured
    # constraints on v5e that shape this code:
    # fp32-OUTPUT batched einsum is ~125x slower than bf16-output
    # (1.8s vs 14ms/frame), and wide fp32 argmin is ~13x slower than
    # bf16. So: bf16 einsum, and the error tensor keeps the per-tile
    # |T|^2 term so its values sit near the TRUE squared distance —
    # bf16's 0.4% RELATIVE rounding then barely perturbs ranking
    # (dropping T2 re-centers values at +-1e7 and quantizes candidate
    # gaps away). The winner's error is recomputed exactly below.
    Fblk = Fblk_mn  # [mh, mw, 64, KR], already blocked by the field pass
    N2blk = N2blk_mn  # [mh, mw, 64]
    # Halo-blocked rank contraction (ROADMAP #2): the naive form stacks
    # all NQ^2 shifted copies of tpad ([mh, mw, NQ^2, KR] ~ 0.4 GB/720p
    # frame at R=32) as the einsum's rhs. Instead, lax.map over row
    # blocks: each step slices a (BM + NQ - 1)-row halo of tpad once and
    # builds only its own [BM, mw, NQ^2, KR] shift stack (~33 MB
    # transient at BM=8), with an identical per-position [64s, KR] x
    # [KR, NQ^2 q] MXU contraction — same arithmetic, same results,
    # peak memory down ~12x. (The Pallas version of this halo kernel is
    # a measured dead end: Mosaic cannot lower the batched contraction,
    # see PERF.md round-3 dead ends.)
    # TILER_TPU_MOTION_BM: rows per block (perf-only knob, identical
    # output); 0 falls back to the unblocked full-stack formulation so
    # the chip playbook can A/B the halo path.
    BM = int(os.environ.get("TILER_TPU_MOTION_BM", "8"))
    if BM <= 0:
        neigh = jnp.stack(
            [
                tpad[NQ - 1 - qy : NQ - 1 - qy + mh,
                     NQ - 1 - qx : NQ - 1 - qx + mw]
                for qy in range(NQ)
                for qx in range(NQ)
            ],
            axis=2,
        )  # [mh, mw, NQ^2, KR] — materializes ~0.4 GB at 720p/R=32
        D = jnp.einsum(
            "mnsk,mnqk->mnqs", Fblk, neigh,
            preferred_element_type=jnp.bfloat16,
        )
        return _rank_merge(D, T, T2, N2blk, pen_np, th, tw, NQ, P,
                           prev_rgb, int16, return_windows)
    nblk = -(-mh // BM)
    mhp = nblk * BM
    tpad_h = jnp.pad(tpad, ((0, mhp - mh), (0, 0), (0, 0)))
    Fblk_h = jnp.pad(Fblk, ((0, mhp - mh), (0, 0), (0, 0), (0, 0)))

    def _rank_block(i):
        halo = jax.lax.dynamic_slice(
            tpad_h, (i * BM, 0, 0), (BM + NQ - 1, mw + NQ - 1, KR)
        )
        nb = jnp.stack(
            [
                halo[NQ - 1 - qy : NQ - 1 - qy + BM,
                     NQ - 1 - qx : NQ - 1 - qx + mw]
                for qy in range(NQ)
                for qx in range(NQ)
            ],
            axis=2,
        )  # [BM, mw, NQ^2, KR]
        fb = jax.lax.dynamic_slice(
            Fblk_h, (i * BM, 0, 0, 0), (BM, mw, 64, KR)
        )
        return jnp.einsum(
            "mnsk,mnqk->mnqs", fb, nb, preferred_element_type=jnp.bfloat16
        )

    D = jax.lax.map(_rank_block, jnp.arange(nblk)).reshape(
        mhp, mw, NQ * NQ, 64
    )[:mh]  # [mh, mw, NQ^2(q), 64(s)] — q-major: per-q slices keep s contiguous
    return _rank_merge(D, T, T2, N2blk, pen_np, th, tw, NQ, P,
                       prev_rgb, int16, return_windows)


def _rank_merge(D, T, T2, N2blk, pen_np, th, tw, NQ, P, prev_rgb,
                int16, return_windows):
    """Per-q (min, argmin) merge of the rank tensor D, then the exact
    fp32 winner recompute. Shared by the halo-blocked and unblocked
    rank formulations (identical inputs -> identical outputs)."""
    H, W = prev_rgb.shape[0], prev_rgb.shape[1]
    # per-q (min, argmin) then a tiny [th, tw, NQ^2] merge: same
    # lexicographic (q-major, s-minor) tie winner as the flattened
    # argmin, without materializing the [th, tw, 4096] error tensor
    mins = []
    args = []
    for qy in range(NQ):
        for qx in range(NQ):
            qi = qy * NQ + qx
            e = (
                T2[:, :, None]
                - 2.0 * D[qy : qy + th, qx : qx + tw, qi].astype(jnp.float32)
                + N2blk[qy : qy + th, qx : qx + tw]
                + jnp.asarray(pen_np[:, qi])
            ).astype(jnp.bfloat16)
            mins.append(jnp.min(e, axis=-1))
            args.append(jnp.argmin(e, axis=-1))
    minq = jnp.stack(mins, axis=2)  # [th, tw, NQ^2]
    argq = jnp.stack(args, axis=2)
    bestq = jnp.argmin(minq, axis=-1).astype(jnp.int32)
    bests = jnp.take_along_axis(argq, bestq[..., None], axis=2)[..., 0]
    bests = bests.astype(jnp.int32)
    best_oy = ((bestq // NQ) * TILE_W - P + bests // TILE_W).astype(jnp.int32)
    best_ox = ((bestq % NQ) * TILE_W - P + bests % TILE_W).astype(jnp.int32)

    # The bf16 norm expansion only ranks: recompute the winner's error
    # exactly from pixels in fp32. Patch gathers are pathological on TPU
    # (~15us per 8x8x3 window); an im2row of the previous frame (8 static
    # shifted slices) turns this into contiguous row gathers — 13x faster.
    wy = jnp.arange(th, dtype=jnp.int32)[:, None] * TILE_W + best_oy  # [th, tw]
    wx = jnp.arange(tw, dtype=jnp.int32)[None, :] * TILE_W + best_ox
    wyc = jnp.clip(wy, 0, H - TILE_W).reshape(-1)
    wxc = jnp.clip(wx, 0, W - TILE_W).reshape(-1)
    prevf = prev_rgb.astype(jnp.float32)
    R1 = jnp.stack(
        [prevf[:, dx : dx + W - 7] for dx in range(TILE_W)], axis=2
    )  # [H, W-7, 8(dx), 3]
    win = R1[wyc[:, None] + jnp.arange(TILE_W)[None, :], wxc[:, None]]  # [n,8,8,3]
    Wv = tile_features_raster(win)  # [th*tw, 192] fp32
    if int16:
        Wv = jnp.round(Wv)
    diff = T.reshape(-1, K) - Wv
    exact = jnp.sum(diff * diff, axis=-1).reshape(th, tw)
    exact = exact + jnp.abs(best_oy).astype(jnp.float32) + jnp.abs(best_ox).astype(jnp.float32)
    if return_windows:
        return best_oy, best_ox, exact, win
    return best_oy, best_ox, exact

"""Fused Pallas motion-rank kernel: the hot half of the motion search.

Role of the reference's hand-written SSE3 distance loops
(utils.pas:559-780, :874-1035 driven by TFrame.PredictMotion,
tilingencoder.pas:1184-1248): for every tile, rank all (2R)^2 candidate
offsets by weighted-DCT L2.

The XLA formulation materializes a (2Q)^2-way neighbor stack (~400 MB at
R=32/720p), a [mh, mw, 64, (2Q)^2] cross tensor, a [th, tw, 4096] error
tensor, and runs a 4096-wide fp32 argmin — measured ~80-90 ms each per
720p frame on v5e. This kernel fuses all of it: one grid cell per row of
field blocks; per block offset q the cross terms, err = N2 - 2*cross +
penalty, and the min/argmin over the 64 window phases all happen in VMEM,
with the per-q tile-feature row double-buffer-DMA'd under the compute.
Outputs are the per-(offset, field block) best-phase value/index —
[NQ^2, mh, mw]; the tiny per-tile reduction over offsets runs in XLA.

Layout rules learned from Mosaic (TPU v5e, 2026-08 libtpu):
  - tiled memrefs cannot be sliced (even as DMA endpoints) at sub-tile
    offsets, so the NQ column shifts are pre-materialized in HBM and the
    q index is a LEADING (untiled) dimension everywhere it is dynamic;
  - a DMA endpoint's lane dimension must be a multiple of 128 (or the
    slice must cover the physical dim), so tile columns (mw) sit on the
    lane axis padded to 128-multiples, and K=192 sits on sublanes;
  - middle-axis broadcasts/inserts don't lower, so features are
    phase-major and every broadcast adds leading or trailing unit dims.

Ranking is fp32 (bf16 inputs, fp32 arithmetic/min), so selection matches
the fp32 XLA path at a fraction of the traffic; the k-reduction runs on
the VPU in s-chunks (Mosaic's batched matmul cannot express a
per-position rhs without a relayout).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_W = 8
K = 192
SCHUNK = 8  # phases per VPU slab: bounds the f32 product temps (VMEM)


def _make_rank_kernel(NQ: int, MW: int):
    NQ2 = NQ * NQ

    def kernel(fblk_hbm, tpadx_hbm, n2_ref, pen_ref, minv_ref, args_ref,
               fblk, tbuf, fsem, tsem):
        """fblk_hbm [mh, 64(s), K, MW] bf16 (HBM); tpadx_hbm
        [NQ(qx), mh+NQ-1, K, MW] bf16 (HBM); n2_ref [1, 64, MW] f32;
        pen_ref [NQ2, 64, 1] f32; outputs [1, NQ2, MW] views per cell.

        The q loop is fully unrolled: output rows are written in groups
        of 8 q's so every sublane store offset is 8-aligned."""
        m = pl.program_id(0)

        def t_dma(slot, q):
            qy = q // NQ
            qx = q % NQ
            return pltpu.make_async_copy(
                tpadx_hbm.at[qx, pl.ds(m + (NQ - 1 - qy), 1), :, :],
                tbuf.at[slot],
                tsem.at[slot],
            )

        fdma = pltpu.make_async_copy(fblk_hbm.at[pl.ds(m, 1)], fblk, fsem)
        fdma.start()
        t_dma(0, 0).start()
        fdma.wait()

        fb = fblk[0]  # [64, K, MW] bf16
        n2 = n2_ref[0]  # [64, MW] f32
        sidx = jax.lax.broadcasted_iota(jnp.int32, (64, MW), 0)

        GROUP = min(8, NQ2)
        jidx = jax.lax.broadcasted_iota(jnp.int32, (GROUP, MW), 0)

        def qstep(g, j, mbuf, abuf):
            q = g * GROUP + j
            slot = j % 2  # (g*GROUP + j) % 2 == j % 2 (GROUP even)

            @pl.when(q + 1 < NQ2)
            def _():
                t_dma(1 - slot, q + 1).start()

            t_dma(slot, q).wait()
            t = tbuf[slot, 0].astype(jnp.float32)  # [K, MW]
            chunks = []
            for sc in range(64 // SCHUNK):
                fchunk = fb[sc * SCHUNK : (sc + 1) * SCHUNK].astype(jnp.float32)
                cross = jnp.sum(fchunk * t[None], axis=1)  # [SCHUNK, MW]
                chunks.append(n2[sc * SCHUNK : (sc + 1) * SCHUNK] - 2.0 * cross)
            pen_q = pen_ref[pl.ds(q, 1)].reshape(64, 1).astype(jnp.float32)
            err = jnp.concatenate(chunks, 0) + pen_q
            mn = jnp.min(err, axis=0, keepdims=True)  # [1, MW]
            am = jnp.min(
                jnp.where(err == mn, sidx, 64), axis=0, keepdims=True
            )  # first min in phase raster order (reference scan order)
            # value-level row insert (dynamic sublane memref stores are
            # unsupported): select row j via an iota mask
            mask = jidx == j
            mbuf = jnp.where(mask, jnp.broadcast_to(mn, (GROUP, MW)), mbuf)
            abuf = jnp.where(mask, jnp.broadcast_to(am, (GROUP, MW)), abuf)
            return mbuf, abuf

        def gbody(g, _):
            def jbody(j, bufs):
                return qstep(g, j, *bufs)

            mbuf, abuf = jax.lax.fori_loop(
                0,
                GROUP,
                jbody,
                (
                    jnp.zeros((GROUP, MW), jnp.float32),
                    jnp.zeros((GROUP, MW), jnp.int32),
                ),
            )
            off = pl.multiple_of(g * GROUP, GROUP)
            minv_ref[0, pl.ds(off, GROUP), :] = mbuf
            args_ref[0, pl.ds(off, GROUP), :] = abuf
            return 0

        jax.lax.fori_loop(0, NQ2 // GROUP, gbody, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def motion_rank(fblk, tpad, n2blk, pen, interpret: bool = False):
    """fblk [mh, 64(s), K, mw] bf16; tpad [mh+NQ-1, K, >=mw+NQ-1] bf16;
    n2blk [mh, 64(s), mw] f32 (+inf on invalid windows);
    pen [64(s), NQ^2(q)] f32 (+inf on out-of-radius offsets).
    Returns (minv [mh, NQ^2, mw] f32, args [mh, NQ^2, mw] i32)."""
    mh, mw = fblk.shape[0], fblk.shape[3]
    NQ2 = pen.shape[1]
    NQ = int(round(NQ2 ** 0.5))
    mwp = -(-mw // 128) * 128  # lane dim: DMA endpoints need 128-multiples
    if mwp != mw:
        fblk = jnp.pad(fblk, ((0, 0), (0, 0), (0, 0), (0, mwp - mw)))
        n2blk = jnp.pad(n2blk, ((0, 0), (0, 0), (0, mwp - mw)),
                        constant_values=jnp.inf)
    if tpad.shape[2] < mwp + NQ - 1:
        tpad = jnp.pad(tpad, ((0, 0), (0, 0), (0, mwp + NQ - 1 - tpad.shape[2])))
    # pre-shifted column views (sub-tile offsets are inexpressible on
    # Mosaic's tiled memrefs): tpadx[qx][r, k, n] = tpad[r, k, n + NQ-1-qx]
    tpadx = jnp.stack(
        [tpad[:, :, NQ - 1 - qx : NQ - 1 - qx + mwp] for qx in range(NQ)], axis=0
    )
    pen3 = pen.T[:, :, None].astype(jnp.bfloat16)  # [NQ2, 64, 1] (exact: ints + inf)

    minv, args = pl.pallas_call(
        _make_rank_kernel(NQ, mwp),
        grid=(mh,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # fblk: manual DMA
            pl.BlockSpec(memory_space=pltpu.ANY),  # tpadx: manual DMA
            pl.BlockSpec((1, 64, mwp), lambda m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NQ2, 64, 1), lambda m: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, NQ2, mwp), lambda m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NQ2, mwp), lambda m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mh, NQ2, mwp), jnp.float32),
            jax.ShapeDtypeStruct((mh, NQ2, mwp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, 64, K, mwp), jnp.bfloat16),  # fblk row
            pltpu.VMEM((2, 1, K, mwp), jnp.bfloat16),  # t double buffer
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(fblk, tpadx, n2blk, pen3)
    return minv[:, :, :mw], args[:, :, :mw]


def motion_rank_xla(fblk, tpad, n2blk, pen):
    """Same contraction/reduction in plain XLA — CPU/test fallback with
    identical semantics. Re-reads the field once per block offset, so it
    is only suitable for the small frames the test suite uses."""
    mh, mw = fblk.shape[0], fblk.shape[3]
    NQ2 = pen.shape[1]
    NQ = int(round(NQ2 ** 0.5))
    minvs = []
    argss = []
    for qy in range(NQ):
        for qx in range(NQ):
            t = tpad[NQ - 1 - qy : NQ - 1 - qy + mh, :, NQ - 1 - qx : NQ - 1 - qx + mw]
            cross = jnp.einsum(
                "mskn,mkn->msn", fblk, t, preferred_element_type=jnp.float32
            )
            err = n2blk - 2.0 * cross + pen[None, :, None, qy * NQ + qx]
            minvs.append(jnp.min(err, axis=1))
            argss.append(jnp.argmin(err, axis=1).astype(jnp.int32))
    return jnp.stack(minvs, axis=1), jnp.stack(argss, axis=1)


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

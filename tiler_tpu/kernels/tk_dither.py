"""Pallas TPU kernel: Thomas Knoll mixing-plan construction.

The TK ditherer runs a 64-step error-feedback loop per pixel, each step
scanning the pixel's palette (DeviseBestMixingPlanThomasKnoll,
tilingencoder.pas:2565-2620). The XLA lax.scan formulation re-reads a
[pixels, S, 3] palette expansion from HBM on every step (64x traffic).
This kernel pins each block's palette in VMEM/registers and keeps the
entire 64-step loop on-chip: pixels are pre-sorted by palette so each
grid block serves ONE palette, delivered via scalar prefetch.

Layout:
  - pixels [4, Mpad] int32 channel-major (r, g, b, bayer-rank), Mpad a
    multiple of the block size; blocks padded per palette.
  - pal_table [P, S, 8] int32: r, g, b, luma/1000? no — luma (full
    integer scale), valid flag, padding.
  - per-block palette ids [nblk] int32 (scalar prefetch).
Outputs lists+lumas [nblk, 64, BLK]; the luma-rank selection happens
outside (argsort over 64 is cheap relative to the loop).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 1024
STEPS = 64
RED_MUL, GREEN_MUL, BLUE_MUL, LUMA_DIV = 299, 587, 114, 1000
RGB_W = 13
BIG = 2**30  # python int: jnp scalars would be captured consts in the kernel


def _trunc_div(a, b: int):
    return jnp.sign(a) * (jnp.abs(a) // b)


def _kernel(S: int, pal_ids_ref, pix_ref, pal_ref, lists_ref, lums_ref):
    pid = pl.program_id(0)
    pal = pal_ids_ref[pid]

    # hoist the block's palette into scalars (loop-invariant registers)
    CR = [pal_ref[pal, s, 0] for s in range(S)]
    CG = [pal_ref[pal, s, 1] for s in range(S)]
    CB = [pal_ref[pal, s, 2] for s in range(S)]
    CL = [pal_ref[pal, s, 3] for s in range(S)]
    CV = [pal_ref[pal, s, 4] for s in range(S)]

    sr = pix_ref[0, :]
    sg = pix_ref[1, :]
    sb = pix_ref[2, :]

    def step(c, carry):
        er, eg, eb = carry
        tr = sr + _trunc_div(er * 9, 100)
        tg = sg + _trunc_div(eg * 9, 100)
        tb = sb + _trunc_div(eb * 9, 100)
        lum_t = tr * RED_MUL + tg * GREEN_MUL + tb * BLUE_MUL

        best_pen = jnp.full_like(sr, BIG)
        best_idx = jnp.zeros_like(sr)
        best_r = jnp.zeros_like(sr)
        best_g = jnp.zeros_like(sr)
        best_b = jnp.zeros_like(sr)
        best_lum = jnp.zeros_like(sr)
        for s in range(S):
            dr, dg, db = tr - CR[s], tg - CG[s], tb - CB[s]
            ld = _trunc_div(lum_t - CL[s], LUMA_DIV)
            pen = (dr * dr + dg * dg + db * db) * RGB_W + ld * ld * 32
            pen = jnp.where(CV[s] > 0, pen, BIG)
            upd = pen < best_pen
            best_pen = jnp.where(upd, pen, best_pen)
            best_idx = jnp.where(upd, s, best_idx)
            best_r = jnp.where(upd, CR[s], best_r)
            best_g = jnp.where(upd, CG[s], best_g)
            best_b = jnp.where(upd, CB[s], best_b)
            best_lum = jnp.where(upd, CL[s], best_lum)

        lists_ref[0, c, :] = best_idx
        lums_ref[0, c, :] = best_lum
        return sr - best_r + er, sg - best_g + eg, sb - best_b + eb

    zero = jnp.zeros_like(sr)
    jax.lax.fori_loop(0, STEPS, step, (zero, zero, zero), unroll=False)


@functools.partial(jax.jit, static_argnames=("S", "interpret"))
def tk_plan_lists(pix4, block_pal, pal_table, S: int, interpret: bool = False):
    """pix4 [4, Mpad] int32 (Mpad % BLK == 0, channel-major, sorted by
    palette); block_pal [Mpad//BLK] int32; pal_table [P, S, 8] int32
    (r,g,b,luma,valid,...). Returns (lists, lums) [Mpad, 64] int32."""
    mpad = pix4.shape[1]
    nblk = mpad // BLK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((4, BLK), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(pal_table.shape, lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, STEPS, BLK), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, STEPS, BLK), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )

    def kern(pal_ids_ref, pix_ref, pal_ref, lists_ref, lums_ref):
        _kernel(S, pal_ids_ref, pix_ref, pal_ref, lists_ref, lums_ref)

    lists, lums = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((nblk, STEPS, BLK), jnp.int32),
            jax.ShapeDtypeStruct((nblk, STEPS, BLK), jnp.int32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(block_pal, pix4, pal_table)
    lists = lists.transpose(0, 2, 1).reshape(mpad, STEPS)
    lums = lums.transpose(0, 2, 1).reshape(mpad, STEPS)
    return lists, lums


def tk_dither_pallas(tiles_rgb_u8, pal_initial, pal_rgb, pal_valid, bayer,
                     interpret: bool = False):
    """Full TK dither via the Pallas kernel.

    tiles_rgb_u8 [T,8,8,3] uint8 (device); pal_initial [T] int32;
    pal_rgb [P,S,3] int; pal_valid [P,S] bool; bayer [T,8,8] int32
    (already mirrored per tile). Returns [T,8,8] uint8 palette indexes.
    """
    T = tiles_rgb_u8.shape[0]
    P, S = pal_rgb.shape[0], pal_rgb.shape[1]
    M = T * 64
    pix = tiles_rgb_u8.reshape(M, 3).astype(jnp.int32)
    ppx = jnp.repeat(jnp.asarray(pal_initial, jnp.int32), 64)
    mapv = jnp.asarray(bayer, jnp.int32).reshape(M)

    # sort pixels by palette; pad each palette's run to a BLK multiple
    order = jnp.argsort(ppx, stable=True)
    counts = jnp.bincount(ppx, length=P)
    padded = -(-counts // BLK) * BLK
    padded_starts = jnp.concatenate([jnp.zeros(1, padded.dtype), jnp.cumsum(padded)[:-1]])
    sorted_starts = jnp.concatenate([jnp.zeros(1, counts.dtype), jnp.cumsum(counts)[:-1]])
    # Mpad is data-dependent; static worst case: each palette wastes < BLK
    mpad = int(-(-M // BLK) * BLK) + (P - 1) * BLK
    pos = jnp.arange(mpad)
    q = jnp.clip(jnp.searchsorted(padded_starts, pos, side="right") - 1, 0, P - 1)
    off = pos - padded_starts[q]
    valid_pos = (off >= 0) & (off < counts[q])
    src = jnp.where(valid_pos, sorted_starts[q] + jnp.clip(off, 0, jnp.maximum(counts[q] - 1, 0)), 0)
    gather = order[src]

    pix4 = jnp.zeros((4, mpad), jnp.int32)
    pix4 = pix4.at[:3].set(jnp.where(valid_pos[None], pix[gather].T, 0))
    block_pal = q[::BLK].astype(jnp.int32)

    lum = (
        pal_rgb[..., 0] * RED_MUL + pal_rgb[..., 1] * GREEN_MUL + pal_rgb[..., 2] * BLUE_MUL
    )
    table = jnp.zeros((P, S, 8), jnp.int32)
    table = table.at[..., 0:3].set(jnp.asarray(pal_rgb, jnp.int32))
    table = table.at[..., 3].set(lum.astype(jnp.int32))
    table = table.at[..., 4].set(jnp.asarray(pal_valid, jnp.int32))

    lists, lums = tk_plan_lists(pix4, block_pal, table, S, interpret=interpret)

    # luma-rank selection at the pixel's Bayer value, then unsort
    ordr = jnp.argsort(lums, axis=1, stable=True)
    slists = jnp.take_along_axis(lists, ordr, axis=1)
    mapv_sorted = mapv[gather]
    sel_sorted = jnp.take_along_axis(slists, mapv_sorted[:, None], axis=1)[:, 0]
    # scatter back; padding slots write to a trash slot M
    tgt = jnp.where(valid_pos, gather, M)
    out = jnp.zeros(M + 1, jnp.int32).at[tgt].set(sel_sorted)[:M]
    return out.reshape(T, 8, 8).astype(jnp.uint8)

"""Pallas TPU kernel: Thomas Knoll dithering, fully fused.

The TK ditherer runs a 64-step error-feedback loop per pixel, each step
scanning the pixel's palette (DeviseBestMixingPlanThomasKnoll,
tilingencoder.pas:2565-2620), then picks the Bayer-rank element of the
luma-sorted 64-entry list (DitherTile, :2705-2709). The XLA formulation
re-reads a [pixels, S, 3] palette expansion from HBM on every step and
argsorts a [pixels, 64] array; this kernel keeps everything on-chip:

  - pixels are pre-sorted by palette so each grid block serves ONE
    palette (scalar prefetch), hoisted into registers for all 64 steps;
  - the candidate list lives in VMEM scratch;
  - the luma-rank selection happens in-kernel via rank counting
    (strictly-less + equal-with-lower-index, i.e. a stable sort's rank),
    so the only HBM output is the selected palette index per pixel.

Layout: pixels [4, Mpad] int32 channel-major (r, g, b, bayer-rank),
Mpad a multiple of BLK, runs padded per palette; pal_table [P, S, 8]
int32 (r, g, b, luma, valid, pad...).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Block width in pixels = 128 lanes x (BLK/128) sublanes. Wider blocks
# amortize grid/loop overheads but pad MORE (every palette's tile run
# pads to BLK/64 tiles; at P=1024 the average padding is P*BLK/128
# tiles), so the sweet spot needs an on-chip A/B: TILER_TPU_TK_BLK in
# {1024, 2048, 4096}.
import os as _os

BLK = int(_os.environ.get("TILER_TPU_TK_BLK", "1024"))
assert BLK % 128 == 0 and BLK >= 128
STEPS = 64
RED_MUL, GREEN_MUL, BLUE_MUL, LUMA_DIV = 299, 587, 114, 1000
RGB_W = 13
BIG = 2**30  # python int: jnp scalars would be captured consts in the kernel


def _trunc_div(a, b: int):
    return jnp.sign(a) * (jnp.abs(a) // b)


def _make_kernel(S: int):
    def kern(pal_ids_ref, pix_ref, pal_ref, sel_ref, lists_scr, keys_scr):
        pid = pl.program_id(0)
        pal = pal_ids_ref[pid]

        # hoist the block's palette into scalars (loop-invariant registers)
        CR = [pal_ref[pal, s, 0] for s in range(S)]
        CG = [pal_ref[pal, s, 1] for s in range(S)]
        CB = [pal_ref[pal, s, 2] for s in range(S)]
        CL = [pal_ref[pal, s, 3] for s in range(S)]
        CV = [pal_ref[pal, s, 4] for s in range(S)]

        sr = pix_ref[0, 0]  # [BLK//128, 128]
        sg = pix_ref[1, 0]
        sb = pix_ref[2, 0]
        mapv = pix_ref[3, 0]

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

            lists_scr[c] = best_idx
            # stable-sort key: luma in the high bits, step index below
            # (lumas are palette lumas <= 255000, so key < 2^24 and all
            # 64 keys are DISTINCT — ties resolve by step order exactly
            # like the reference's stable luma sort)
            keys_scr[c] = best_lum * STEPS + c
            return sr - best_r + er, sg - best_g + eg, sb - best_b + eb

        zero = jnp.zeros_like(sr)
        jax.lax.fori_loop(0, STEPS, step, (zero, zero, zero), unroll=False)

        # in-kernel luma-rank selection: the map_value-th entry of the
        # stable luma sort == the key of rank map_value. Binary search on
        # the 24-bit key value (24 x 64 compare+add) replaces the O(64^2)
        # pairwise rank count — greedily grow the largest lo with
        # count(keys < lo) <= map_value; distinct keys make that lo the
        # rank-map_value key itself.
        def bit_step(b, lo):
            mid = lo + jnp.left_shift(1, 23 - b)
            cnt = jnp.zeros_like(sr)
            for c in range(STEPS):
                cnt = cnt + (keys_scr[c] < mid).astype(jnp.int32)
            return jnp.where(cnt <= mapv, mid, lo)

        lo = jax.lax.fori_loop(0, 24, bit_step, jnp.zeros_like(sr))

        sel = jnp.zeros_like(sr)
        for c in range(STEPS):
            sel = jnp.where(keys_scr[c] == lo, lists_scr[c], sel)
        sel_ref[0] = sel

    return kern


@functools.partial(jax.jit, static_argnames=("S", "interpret"))
def tk_select(pix4, block_pal, pal_table, S: int, interpret: bool = False):
    """pix4 [4, Mpad] int32 (r,g,b,bayer; sorted by palette, Mpad % BLK == 0);
    block_pal [Mpad//BLK] int32; pal_table [P, S, 8] int32.
    Returns selected palette slot per pixel [Mpad] int32."""
    mpad = pix4.shape[1]
    nblk = mpad // BLK
    R = BLK // 128  # sublane rows per block
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((4, 1, R, 128), lambda i, *_: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(pal_table.shape, lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((STEPS, R, 128), jnp.int32),
            pltpu.VMEM((STEPS, R, 128), jnp.int32),
        ],
    )
    sel = pl.pallas_call(
        _make_kernel(S),
        out_shape=jax.ShapeDtypeStruct((nblk, R, 128), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(block_pal, pix4.reshape(4, nblk, R, 128), pal_table)
    return sel.reshape(mpad)


def tk_dither_pallas(tiles_rgb_u8, pal_initial, pal_rgb, pal_valid, bayer,
                     interpret: bool = False):
    """Full TK dither via the Pallas kernel.

    tiles_rgb_u8 [T,8,8,3] uint8 (device); pal_initial [T] int32;
    pal_rgb [P,S,3] int; pal_valid [P,S] bool; bayer [T,8,8] int32
    (already mirrored per tile). Returns [T,8,8] uint8 palette indexes.

    All sort/placement bookkeeping runs at TILE granularity (a block is
    exactly BLK/64 tiles): the previous pixel-granularity placement
    (searchsorted + gathers + scatters over ~8M pixels) cost ~1s at
    P=1024 — ~5x the kernel itself. Tile-level it is [T]-sized index
    math plus two contiguous row gathers.
    """
    T = tiles_rgb_u8.shape[0]
    P, S = pal_rgb.shape[0], pal_rgb.shape[1]
    TPB = BLK // 64  # tiles per kernel block
    pal_initial = jnp.asarray(pal_initial, jnp.int32)

    # tile destinations: palettes sorted, each palette's tile run padded
    # to a block multiple so every block serves exactly one palette
    order_t = jnp.argsort(pal_initial, stable=True)  # [T]
    counts = jnp.bincount(pal_initial, length=P)
    padded = -(-counts // TPB) * TPB
    padded_starts = jnp.concatenate([jnp.zeros(1, padded.dtype), jnp.cumsum(padded)[:-1]])
    sorted_starts = jnp.concatenate([jnp.zeros(1, counts.dtype), jnp.cumsum(counts)[:-1]])
    spx = pal_initial[order_t]  # sorted palette ids [T]
    dst_t = padded_starts[spx] + (jnp.arange(T) - sorted_starts[spx])

    # static padded size, bucketed (256-block classes) to bound compiles
    nblk_needed = (-(-T // TPB)) + (P - 1)  # worst case: every run padded
    nblk = -(-nblk_needed // 256) * 256
    tpad_n = nblk * TPB

    # inverse placement: src tile for each padded slot (T = zero trash)
    src_t = jnp.full(tpad_n, T, jnp.int32).at[dst_t].set(order_t.astype(jnp.int32))
    valid_t = src_t < T
    tiles_g = jnp.concatenate(
        [tiles_rgb_u8.reshape(T, 192), jnp.zeros((1, 192), tiles_rgb_u8.dtype)]
    )[src_t]  # [tpad_n, 192] row gather
    bayer_g = jnp.concatenate(
        [jnp.asarray(bayer, jnp.int32).reshape(T, 64), jnp.zeros((1, 64), jnp.int32)]
    )[src_t]

    pix4 = jnp.stack(
        [
            tiles_g.reshape(tpad_n, 64, 3)[:, :, 0].reshape(-1).astype(jnp.int32),
            tiles_g.reshape(tpad_n, 64, 3)[:, :, 1].reshape(-1).astype(jnp.int32),
            tiles_g.reshape(tpad_n, 64, 3)[:, :, 2].reshape(-1).astype(jnp.int32),
            bayer_g.reshape(-1),
        ],
        axis=0,
    )  # [4, tpad_n*64]

    # block palette: palette of the run each block belongs to (padding
    # blocks resolve to some valid palette; their output is discarded)
    block_starts = jnp.arange(nblk) * TPB
    q_b = jnp.clip(
        jnp.searchsorted(padded_starts, block_starts, side="right") - 1, 0, P - 1
    ).astype(jnp.int32)

    lum = (
        pal_rgb[..., 0] * RED_MUL + pal_rgb[..., 1] * GREEN_MUL + pal_rgb[..., 2] * BLUE_MUL
    )
    table = jnp.zeros((P, S, 8), jnp.int32)
    table = table.at[..., 0:3].set(jnp.asarray(pal_rgb, jnp.int32))
    table = table.at[..., 3].set(lum.astype(jnp.int32))
    table = table.at[..., 4].set(jnp.asarray(pal_valid, jnp.int32))

    sel_sorted = tk_select(pix4, q_b, table, S, interpret=interpret)

    # un-permute: dst_t[i] is where SORTED tile i landed; index by tile id
    dst_by_tile = jnp.zeros(T, jnp.int32).at[order_t].set(dst_t.astype(jnp.int32))
    out = sel_sorted.reshape(tpad_n, 64)[dst_by_tile]  # [T, 64]
    return out.reshape(T, 8, 8).astype(jnp.uint8)

"""esDither: ordered dithering of every corpus tile through its palette.

Replaces the per-pixel assembly loops (DitherTile, tilingencoder.pas:
2688-2725; Thomas Knoll plan :2565-2620; Yliluoma2 plan :2339-2563;
ColorCompare :2323-2337) with batched integer JAX ops:

  - Thomas Knoll: the 64-step error-feedback loop is a lax.scan over steps,
    batched over every (tile, pixel); the luma sort becomes an argsort.
  - Yliluoma2: the mixing-plan construction loop (at most MixedColors
    rounds, each testing palette-color x repeat-count candidates) runs as a
    bounded fori with masked candidate tables.
  - Mirror semantics: the reference un-mirrors each tile to its natural
    orientation so the Bayer matrix lines up with screen position
    (:2694-2696). Equivalently we dither the canonical pixels against a
    per-tile MIRRORED Bayer map — no pixel shuffling.

Integer parity: ColorCompare uses Int64 with truncating division
(lumadiff = (luma1-luma2) div 1000); error feedback uses (e*9) div 100
with Pascal trunc-toward-zero division. Both are replicated exactly in
int32 (ranges proven to fit).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EncoderSettings
from ..models.state import EncodeState

RED_MUL, GREEN_MUL, BLUE_MUL, LUMA_DIV = 299, 587, 114, 1000
RGB_W = 13  # cRGBw (utils.pas:29)

# cDitheringMap (utils.pas:47-56)
BAYER8 = np.array(
    [
        0, 48, 12, 60, 3, 51, 15, 63,
        32, 16, 44, 28, 35, 19, 47, 31,
        8, 56, 4, 52, 11, 59, 7, 55,
        40, 24, 36, 20, 43, 27, 39, 23,
        2, 50, 14, 62, 1, 49, 13, 61,
        34, 18, 46, 30, 33, 17, 45, 29,
        10, 58, 6, 54, 9, 57, 5, 53,
        42, 26, 38, 22, 41, 25, 37, 21,
    ],
    dtype=np.int32,
).reshape(8, 8)


def _trunc_div(a, b):
    """Pascal `div`: integer division truncating toward zero."""
    return jnp.sign(a) * (jnp.abs(a) // b)


def color_compare(r1, g1, b1, r2, g2, b2):
    """ColorCompare (tilingencoder.pas:2323-2337); int32 inputs, int32 out."""
    luma1 = r1 * RED_MUL + g1 * GREEN_MUL + b1 * BLUE_MUL
    luma2 = r2 * RED_MUL + g2 * GREEN_MUL + b2 * BLUE_MUL
    lumadiff = _trunc_div(luma1 - luma2, LUMA_DIV)
    dr, dg, db = r1 - r2, g1 - g2, b1 - b2
    return (dr * dr + dg * dg + db * db) * RGB_W + (lumadiff * lumadiff) * 32


@functools.partial(jax.jit, static_argnames=("S",))
def thomas_knoll_lists(pix_rgb, pal_rgb, pal_valid, S: int):
    """Thomas Knoll 64-entry mixing lists, luma-sorted.

    pix_rgb: [B, 3] int32; pal_rgb: [B, S, 3] int32 (per-pixel palette);
    pal_valid: [B, S] bool. Returns sorted candidate lists [B, 64] int32
    of palette slot indexes (already mapped through Remap semantics: the
    reference's Remap re-inserts null-color gaps; here invalid colors are
    simply masked out of selection, keeping original slot indexes).
    """
    B = pix_rgb.shape[0]
    s = pix_rgb  # [B, 3]
    lum_pal = (
        pal_rgb[..., 0] * RED_MUL + pal_rgb[..., 1] * GREEN_MUL + pal_rgb[..., 2] * BLUE_MUL
    )  # [B, S]
    inval = ~pal_valid

    def step(e, _):
        t = s + _trunc_div(e * 9, 100)  # [B, 3]
        pen = color_compare(
            t[:, None, 0], t[:, None, 1], t[:, None, 2],
            pal_rgb[..., 0], pal_rgb[..., 1], pal_rgb[..., 2],
        )
        pen = jnp.where(inval, jnp.int32(2**30), pen)
        chosen = jnp.argmin(pen, axis=1)  # first min (reference strict <)
        ch_rgb = jnp.take_along_axis(pal_rgb, chosen[:, None, None], axis=1)[:, 0]
        e = e + s - ch_rgb
        return e, chosen

    _, lists = jax.lax.scan(step, jnp.zeros_like(s), None, length=64)
    lists = lists.T  # [B, 64]
    lum = jnp.take_along_axis(lum_pal, lists, axis=1)
    order = jnp.argsort(lum, axis=1, stable=True)
    return jnp.take_along_axis(lists, order, axis=1)


@functools.partial(jax.jit, static_argnames=("S", "mixed"))
def yliluoma2_lists(pix_rgb, pal_rgb, pal_valid, S: int, mixed: int):
    """Yliluoma2 mixing plans (DeviseBestMixingPlanYliluoma,
    tilingencoder.pas:2339-2563). Replicates the ASM_DBMP x64 path the
    reference actually runs (:2368-2483): 4-component (r,g,b,luma)
    distance with weights (13,13,13,32) and reciprocal rounding
    mixed = (sum * (65536 div t)) >> 16 via the FVecInv table
    (tilingencoder.pas:1697-1699).

    Returns (lists [B, 2*mixed] luma-sorted slot indexes, count [B])."""
    B = pix_rgb.shape[0]
    cap = 2 * mixed
    r, g, b = pix_rgb[:, 0], pix_rgb[:, 1], pix_rgb[:, 2]
    lum_pal = (
        pal_rgb[..., 0] * RED_MUL + pal_rgb[..., 1] * GREEN_MUL + pal_rgb[..., 2] * BLUE_MUL
    )
    target4 = jnp.stack([r, g, b, _trunc_div(r * RED_MUL + g * GREEN_MUL + b * BLUE_MUL, LUMA_DIV)], axis=1)
    pal4 = jnp.concatenate([pal_rgb, (lum_pal // LUMA_DIV)[..., None]], axis=2)  # [B,S,4]
    inval = ~pal_valid
    tt = jnp.arange(1, cap + 1, dtype=jnp.int32)  # candidate totals t
    inv_t = (1 << 16) // tt  # FVecInv semantics
    w4 = jnp.array([RGB_W, RGB_W, RGB_W, 32], jnp.int32)

    def round_fn(carry):
        plan_count, so_far, lists = carry
        max_test = jnp.maximum(1, plan_count)
        # after k = t - plan_count repeats: sum = so_far + k*color + k(k-1)/2
        # (the asm increments `add` on all four lanes each step, :2447-2448)
        k = tt[None, :] - plan_count[:, None]  # [B, cap]
        tmask = (k >= 1) & (k <= max_test[:, None])
        bias = (k * (k - 1)) // 2
        sums = (
            so_far[:, None, None, :]
            + k[:, None, :, None] * pal4[:, :, None, :]
            + bias[:, None, :, None]
        )  # [B, S, cap, 4]
        mixed4 = (sums * inv_t[None, None, :, None]) >> 16
        d = mixed4 - target4[:, None, None, :]
        pen = jnp.sum(d * d * w4, axis=-1)  # [B, S, cap]
        pen = jnp.where(inval[:, :, None] | ~tmask[:, None, :], jnp.int32(2**30), pen)
        flat = pen.reshape(B, -1)
        best = jnp.argmin(flat, axis=1)
        chosen = (best // cap).astype(jnp.int32)
        amount = (best % cap + 1).astype(jnp.int32) - plan_count
        amount = jnp.maximum(amount, 1)
        # write `chosen` into lists[plan_count : plan_count+amount]
        pos = jnp.arange(cap, dtype=jnp.int32)[None, :]
        wmask = (pos >= plan_count[:, None]) & (pos < (plan_count + amount)[:, None])
        lists = jnp.where(wmask, chosen[:, None], lists)
        ch4 = jnp.take_along_axis(pal4, chosen[:, None, None], axis=1)[:, 0]
        so_far = so_far + ch4 * amount[:, None]
        return plan_count + amount, so_far, lists

    def cond_fn(carry):
        plan_count, _, _ = carry
        return jnp.any(plan_count < mixed)

    def body(carry):
        plan_count, so_far, lists = carry
        new = round_fn((plan_count, so_far, lists))
        # freeze pixels whose plan is complete
        done = plan_count >= mixed
        return (
            jnp.where(done, plan_count, new[0]),
            jnp.where(done[:, None], so_far, new[1]),
            jnp.where(done[:, None], lists, new[2]),
        )

    init = (
        jnp.zeros(B, jnp.int32),
        jnp.zeros((B, 4), jnp.int32),
        jnp.zeros((B, cap), jnp.int32),
    )
    plan_count, _, lists = jax.lax.while_loop(cond_fn, body, init)

    lum = jnp.take_along_axis(lum_pal, lists, axis=1)
    pos = jnp.arange(cap, dtype=jnp.int32)[None, :]
    lum = jnp.where(pos < plan_count[:, None], lum, jnp.int32(2**30))
    order = jnp.argsort(lum, axis=1, stable=True)
    return jnp.take_along_axis(lists, order, axis=1), plan_count


@functools.partial(jax.jit, static_argnames=("S", "use_tk", "mixed"))
def _dither_chunk(tiles_u8, pidx, hm, vm, pal_rgb, pal_valid,
                  S: int, use_tk: bool, mixed: int):
    """Dither one chunk of tiles fully on device.

    tiles_u8 [n,8,8,3] uint8; pidx [n] int32; hm/vm [n] bool (initial
    mirrors -> mirrored Bayer map); pal_rgb [P,S,3] int32;
    pal_valid [P,S] bool. Returns [n,8,8] uint8 palette indexes."""
    n = tiles_u8.shape[0]
    bay = jnp.broadcast_to(jnp.asarray(BAYER8), (n, 8, 8))
    bay = jnp.where(hm[:, None, None], bay[:, :, ::-1], bay)
    bay = jnp.where(vm[:, None, None], bay[:, ::-1, :], bay)
    mapv = bay.reshape(n * 64)
    pix = tiles_u8.astype(jnp.int32).reshape(n * 64, 3)
    prgb = jnp.repeat(pal_rgb[pidx], 64, axis=0)  # device-side gather
    pvalid = jnp.repeat(pal_valid[pidx], 64, axis=0)
    if use_tk:
        lists = thomas_knoll_lists(pix, prgb, pvalid, S)
        sel = jnp.take_along_axis(lists, mapv[:, None], axis=1)[:, 0]
    else:
        lists, count = yliluoma2_lists(pix, prgb, pvalid, S, mixed)
        rank = (mapv * count) >> 6
        sel = jnp.take_along_axis(lists, rank[:, None], axis=1)[:, 0]
    return sel.reshape(n, 8, 8).astype(jnp.uint8)


def dither(state: EncodeState, settings: EncoderSettings, chunk: int = 16384) -> EncodeState:
    T = len(state.corpus_rgb)
    S = settings.palette_size
    pal_rgb = jnp.asarray(state.palettes_rgb.astype(np.int32))
    pal_valid = jnp.asarray(state.palettes_valid)

    # per-tile mirrored Bayer map (canonical-orientation dithering):
    # the reference un-mirrors to natural orientation before dithering
    hm, vm = _corpus_initial_mirrors(state)

    if settings.dithering_use_thomas_knoll and settings.use_pallas_tk:
        sel = _dither_tk_pallas(state, settings, hm, vm)
        if sel is not None:
            state.corpus_pal_pixels = sel
            _prefetch_pal_hashes(state)
            return state

    chunk = min(chunk, max(1, T))
    nch = -(-T // chunk)
    Tp = nch * chunk
    corpus = jnp.asarray(state.corpus_rgb)
    if Tp != T:  # pad once to keep one compiled shape
        corpus = jnp.pad(corpus, ((0, Tp - T), (0, 0), (0, 0), (0, 0)))
    pidx = np.zeros(Tp, np.int32)
    pidx[:T] = state.corpus_pal_initial
    hmp = np.zeros(Tp, bool)
    vmp = np.zeros(Tp, bool)
    hmp[:T] = hm
    vmp[:T] = vm

    outs = []
    for i in range(0, Tp, chunk):
        outs.append(_dither_chunk(
            corpus[i : i + chunk], jnp.asarray(pidx[i : i + chunk]),
            jnp.asarray(hmp[i : i + chunk]), jnp.asarray(vmp[i : i + chunk]),
            pal_rgb, pal_valid,
            S, settings.dithering_use_thomas_knoll,
            settings.dithering_yliluoma2_mixed_colors,
        ))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
    state.corpus_pal_pixels = out[:T]  # device-resident
    _prefetch_pal_hashes(state)
    return state


def _prefetch_pal_hashes(state: EncodeState):
    """Dispatch Reindex's dedup hashes over the fresh palette pixels and
    start their host copy: both hide behind the reconstruct stage between
    dither and reindex (reindex then starts with the hashes host-local)."""
    from .reindex import _pal_hashes

    try:
        h = _pal_hashes(jnp.asarray(state.corpus_pal_pixels))
        h.copy_to_host_async()
        state._pal_hashes_prefetch = h
    except Exception:
        state._pal_hashes_prefetch = None


def _dither_tk_pallas(state: EncodeState, settings: EncoderSettings, hm, vm):
    """Thomas Knoll via the Pallas kernel (palette tables VMEM-resident for
    the whole 64-step loop). Returns None on any failure so the caller
    falls back to the XLA path (e.g. pallas unsupported on the backend)."""
    try:
        import jax

        from ..kernels.tk_dither import tk_dither_pallas

        T = len(state.corpus_rgb)
        bay = jnp.broadcast_to(jnp.asarray(BAYER8), (T, 8, 8))
        bay = jnp.where(jnp.asarray(hm)[:, None, None], bay[:, :, ::-1], bay)
        bay = jnp.where(jnp.asarray(vm)[:, None, None], bay[:, ::-1, :], bay)
        interpret = jax.default_backend() == "cpu"
        out = tk_dither_pallas(
            jnp.asarray(state.corpus_rgb),
            jnp.asarray(state.corpus_pal_initial.astype(np.int32)),
            jnp.asarray(state.palettes_rgb.astype(np.int32)),
            jnp.asarray(state.palettes_valid),
            bay,
            interpret=interpret,
        )
        return out
    except Exception:
        return None


def _corpus_initial_mirrors(state: EncodeState):
    """Mirror flags of each corpus tile = flags of its canonical content
    (GetTileHVMirrorHeuristics is deterministic on pixels, so any instance
    agrees; recompute from the canonical tile: after canonicalization the
    heuristic yields the flags' residual false/false, so we recompute from
    the ORIGINAL spin by checking which mirror makes it canonical)."""
    # The canonical tile satisfies "brightest quadrant top-left", so the
    # initial flags are not recoverable from content alone; take them from
    # the first tilemap instance instead.
    T = len(state.corpus_rgb)
    hm = np.zeros(T, bool)
    vm = np.zeros(T, bool)
    tidx = state.tilemap.tile_idx.reshape(-1)
    sel = tidx >= 0
    t = tidx[sel]
    first = np.full(T, -1, np.int64)
    # last-write wins is fine: all instances of the same canonical content
    # share identical mirror flags only when content is mirror-ambiguous;
    # the reference similarly keeps per-TILE flags from whichever frame
    # tile was transferred (TransferTiles copies HMirror_Initial).
    first[t] = np.flatnonzero(sel)
    ok = first >= 0
    hm[ok] = state.tilemap.hmirror.reshape(-1)[first[ok]]
    vm[ok] = state.tilemap.vmirror.reshape(-1)[first[ok]]
    return hm, vm

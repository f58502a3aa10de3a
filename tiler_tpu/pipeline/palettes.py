"""esPreparePalettes: palettization, per-palette color quantization, and
cross-palette permutation optimization.

Reference pipeline (tilingencoder.pas:1843-1871, :4105-4562):
  (a) DoPalettization: BICO streaming coreset (k = PaletteCount*8) over
      per-tile Spe-DCT/LAB features -> ANN kd-tree assignment -> yakmo
      k-means of the coreset centroids into PaletteCount palettes.
  (b) DoQuantization: per palette, yakmo k-means of member tiles' RGB
      pixels to PaletteSize colors, HSV (Val,Sat,Hue) ascending sort.
  (c) OptimizePalettes: per-palette color-order permutation maximizing the
      accumulated cross-palette per-slot stddev (Powell relaxation).

TPU-native mapping: the corpus fits HBM, so (a) is two levels of exact
weighted k-means + brute-force 1-NN (no coreset, no kd-tree — exact
replaces approximate). (b) dedups member pixels into weighted color sets
and runs one vmapped k-means over all palettes. (c) evaluates the exact
objective over all pairwise swaps per palette, vectorized over palettes —
a 2-opt search on the true objective instead of Powell on a rank
relaxation (same fixed-point family, no permutation-order hacks).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..config import EncoderSettings
from ..models.state import EncodeState
from ..cluster.kmeans import kmeans
from ..ops import dct
from ..ops.color import rgb_to_hsv_bytes, posterize

RED_MUL, GREEN_MUL, BLUE_MUL, LUMA_DIV = 299, 587, 114, 1000


def _corpus_features(state: EncodeState, settings: EncoderSettings, chunk=65536):
    """Per-tile dither-mode features in LAB (ComputeTilePsyVisFeatures with
    DitheringMode + UseLAB, tilingencoder.pas:4160). Device-resident."""
    T = len(state.corpus_rgb)
    outs = []
    for i in range(0, T, chunk):
        tiles = jnp.asarray(state.corpus_rgb[i : i + chunk], jnp.float32)
        outs.append(dct.tile_features(tiles, mode=settings.dithering_mode, use_lab=True))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs)


def palettization(state: EncodeState, settings: EncoderSettings,
                  mesh=None) -> EncodeState:
    feats = _corpus_features(state, settings)
    T = len(feats)
    P = settings.palette_count
    k1 = min(P * 8, T)  # BICO coreset size (tilingencoder.pas:4149)

    if mesh is not None and "corpus" in mesh.axis_names:
        # corpus-sharded Lloyd: shard-local assignment matmuls, centroid
        # psum over ICI (parallel/kmeans.py)
        from ..parallel.kmeans import sharded_kmeans

        cents, assign1, _ = sharded_kmeans(
            feats, k1, weights=jnp.asarray(state.corpus_use.astype(np.float32)),
            iters=settings.kmeans_iters, seed=settings.seed, mesh=mesh,
        )
    else:
        cents, assign1, _ = kmeans(
            feats, k1, weights=jnp.asarray(state.corpus_use.astype(np.float32)),
            iters=settings.kmeans_iters, seed=settings.seed, init="sample",
        )
    k1 = int(cents.shape[0])
    if k1 > P and P > 1:
        _, assign2, _ = kmeans(
            cents, P, iters=settings.kmeans_iters,
            seed=settings.seed + 1, init="kpp",
        )
        pal_of_c1 = assign2.astype(jnp.int32)
    elif k1 > P:  # P == 1
        pal_of_c1 = jnp.zeros(k1, jnp.int32)
    else:
        pal_of_c1 = jnp.arange(k1, dtype=jnp.int32)

    # use-count sort (:4223-4244) on device: each host<->device crossing
    # costs ~30-50 ms through the tunnel (and d2h bandwidth collapses in
    # bad windows), so the assignment STAYS device-resident; the host copy
    # streams in the background (copy_to_host_async) and materializes only
    # when a host consumer (reindex/dither host path/render) asks
    pal_initial = pal_of_c1[assign1]  # [T] device
    use = jnp.bincount(pal_initial, length=P)
    order = jnp.argsort(-use, stable=True)
    lut = jnp.zeros(P, jnp.int32).at[order].set(jnp.arange(P, dtype=jnp.int32))
    state.corpus_pal_initial = lut[pal_initial]
    try:
        state.corpus_pal_initial.copy_to_host_async()
    except Exception:
        pass
    return state


@functools.partial(jax.jit, static_argnames=("P", "cap"))
def _sample_member_pixels(corpus_rgb, pal_initial, P: int, cap: int, key):
    """Per-palette uniform sample (without replacement) of member TILES,
    expanded to their pixels, on device. Returns (cols [P,cap,3] f32,
    wts [P,cap] f32, npix [P] i32 = true member-pixel count).

    The reference feeds EVERY member pixel to yakmo (:4458-4481); capping
    the vmapped k-means input bounds its shape. Sampling whole tiles
    instead of independent pixels sorts T keys instead of 64*T (the
    pixel-level argsort cost 123 ms/encode at T=115k; this is ~8 ms) —
    palettes with <= cap/64 member tiles still contribute every pixel.
    """
    T = corpus_rgb.shape[0]
    ctiles = cap // 64  # member tiles sampled per palette
    pix = corpus_rgb.reshape(T, 64, 3).astype(jnp.float32)
    pal = pal_initial.astype(jnp.int32)
    # one combined-key argsort instead of a two-pass lexsort: palette id
    # in the high bits, random tie-break bits below (P <= 2^11)
    if (P + 1) * (1 << 20) + (1 << 20) < 2**31:
        r20 = jax.random.randint(key, (T,), 0, 1 << 20, dtype=jnp.int32)
        order = jnp.argsort(pal * (1 << 20) + r20)
    else:  # huge palette counts: keep the exact two-key sort
        r = jax.random.uniform(key, (T,))
        order = jnp.lexsort((r, pal))
    spal = pal[order]
    starts = jnp.searchsorted(spal, jnp.arange(P, dtype=jnp.int32))
    ends = jnp.searchsorted(spal, jnp.arange(P, dtype=jnp.int32), side="right")
    ntiles = (ends - starts).astype(jnp.int32)
    idx = starts[:, None] + jnp.arange(ctiles)[None, :]
    tvalid = jnp.arange(ctiles)[None, :] < jnp.minimum(ntiles, ctiles)[:, None]
    cols = pix[order[jnp.clip(idx, 0, T - 1)]]  # [P, ctiles, 64, 3]
    cols = cols.reshape(P, ctiles * 64, 3)
    valid = jnp.repeat(tvalid, 64, axis=1)
    if ctiles * 64 < cap:
        cols = jnp.pad(cols, ((0, 0), (0, cap - ctiles * 64), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, cap - ctiles * 64)))
    return cols, valid.astype(jnp.float32), ntiles * 64


def quantization(state: EncodeState, settings: EncoderSettings,
                 color_cap: int = 2048) -> EncodeState:
    P, S = settings.palette_count, settings.palette_size
    key = jax.random.PRNGKey(settings.seed)
    # pad the corpus to a power of two (sentinel palette id P sorts after
    # every real palette) so the sampler compiles once per size class
    T = len(state.corpus_rgb)
    Tpad = 256
    while Tpad < T:
        Tpad *= 2
    corpus = jnp.asarray(state.corpus_rgb)
    pidx = jnp.asarray(state.corpus_pal_initial.astype(np.int32))
    if Tpad != T:
        corpus = jnp.pad(corpus, ((0, Tpad - T), (0, 0), (0, 0), (0, 0)))
        pidx = jnp.pad(pidx, (0, Tpad - T), constant_values=P)
    cols, wts, npix_d = _sample_member_pixels(corpus, pidx, P, color_cap, key)

    if settings.color_quantizer == "mediancut":
        npix = np.asarray(npix_d).astype(np.int64)
        # dlquant DL1/DL3 role (extern.pas:195-196): deterministic
        # median-cut boxes instead of per-palette k-means
        from ..cluster.mediancut import median_cut

        cols_h = np.asarray(cols)
        wts_h = np.asarray(wts)
        cents = np.stack(
            [
                median_cut(cols_h[p][wts_h[p] > 0], wts_h[p][wts_h[p] > 0], S)
                for p in range(P)
            ]
        ).astype(np.float64)
        rgb = np.clip(np.round(np.nan_to_num(cents)), 0, 255).astype(np.int64)
        rgb = posterize(rgb, 255)  # identity at 8bpc (cBitsPerComp, :4552)

        # valid color count per palette = min(S, member pixel count) (:4449)
        ncols = np.minimum(S, npix)
        valid = np.arange(S)[None, :] < ncols[:, None]
        rgb[~valid] = 0

        # HSV (Val, Sat, Hue) ascending sort of the valid prefix (:4518-4529)
        hsv = rgb_to_hsv_bytes(rgb)
        sort_key = np.where(
            valid,
            (hsv[..., 2] << 16) | (hsv[..., 1] << 8) | hsv[..., 0],
            1 << 40,  # invalid slots sort last
        )
        order = np.argsort(sort_key, axis=1, kind="stable")
        rgb = np.take_along_axis(rgb, order[..., None], axis=1)
        valid = np.take_along_axis(valid, order, axis=1)

        state.palettes_rgb = rgb.astype(np.uint8)
        state.palettes_valid = valid
        return state

    # k-means path: quantize + HSV sort + 2-opt permutation optimization
    # run as ONE device chain with no host crossing in between (the
    # previous host round-trip per sub-stage cost 3 pulls + 2 re-uploads
    # of tunnel latency); the packed [P, S, 4] result streams to the host
    # in the background while dither (which consumes the DEVICE arrays)
    # dispatches
    seeds = jnp.arange(P) + settings.seed
    packed = _quantize_sort_optimize(
        cols, wts, seeds, npix_d, S, settings.kmeans_iters, 16)
    state.palettes_rgb = packed[..., :3].astype(jnp.uint8)
    state.palettes_valid = packed[..., 3] != 0.0
    try:
        state.palettes_rgb.copy_to_host_async()
        state.palettes_valid.copy_to_host_async()
    except Exception:
        pass
    return state


@functools.partial(jax.jit, static_argnames=("S",))
def _hsv_sort_dev(cents, npix, S: int):
    """Device mirror of the host tail above: clip/round centroids, zero
    invalid slots, HSV (Val, Sat, Hue) ascending stable sort
    (tilingencoder.pas:4449, :4518-4529; utils.pas:278-325 integer HSV).
    posterize(cvt=255) is the identity and is skipped. Returns
    (rgb f32 [P, S, 3] byte-exact integers, valid bool [P, S])."""
    rgb = jnp.clip(jnp.round(jnp.nan_to_num(cents)), 0, 255).astype(jnp.int32)
    ncols = jnp.minimum(S, npix.astype(jnp.int32))
    valid = jnp.arange(S, dtype=jnp.int32)[None, :] < ncols[:, None]
    rgb = jnp.where(valid[..., None], rgb, 0)

    def muldiv(a, b, c):  # Windows MulDiv: round-half-away-from-zero
        num = a * b
        return jnp.sign(num) * ((jnp.abs(num) + c // 2) // c)

    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    delta = mx - mn
    nz = delta != 0
    safe_delta = jnp.where(nz, delta, 1)
    s = jnp.where(nz, muldiv(delta, 255, jnp.where(mx == 0, 1, mx)), 0)
    h_r = muldiv(42, g - b, safe_delta)
    h_g = muldiv(42, b - r, safe_delta) + 84
    h_b = muldiv(42, r - g, safe_delta) + 168
    h = jnp.where(r == mx, h_r, jnp.where(g == mx, h_g, h_b))
    # Pascal mod truncates toward zero (keeps sign), then `and $ff`
    h = jnp.where(nz, jax.lax.rem(h, jnp.array(252, h.dtype)) & 0xFF, 0)
    sort_key = jnp.where(valid, (mx << 16) | (s << 8) | h, 1 << 30)
    order = jnp.argsort(sort_key, axis=1, stable=True)
    rgb = jnp.take_along_axis(rgb, order[..., None], axis=1)
    valid = jnp.take_along_axis(valid, order, axis=1)
    return rgb.astype(jnp.float32), valid


@functools.partial(jax.jit, static_argnames=("S", "iters", "max_rounds"))
def _quantize_sort_optimize(cols, wts, seeds, npix_d, S: int, iters: int,
                            max_rounds: int):
    """Per-palette k-means -> HSV slot sort -> cross-palette 2-opt, fused
    into one program; ONE packed [P, S, 4] f32 output (rgb + valid)."""
    out = _kmeans_small_batch_packed(cols, wts, seeds, npix_d, S, iters)
    P = out.shape[0]
    cents = out[:, : S * 3].reshape(P, S, 3)
    npix = out[:, S * 3]
    rgb, valid = _hsv_sort_dev(cents, npix, S)
    pal, valid = _optimize_palettes_dev(rgb, valid, S, max_rounds, S * S)
    return jnp.concatenate([pal, valid[..., None].astype(jnp.float32)],
                           axis=2)


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def _kmeans_small_batch_packed(colors, weights, seeds, npix_d, k: int,
                               iters: int):
    """All P per-palette k-means in one program, colors-last layout.

    colors [P, n, 3], weights [P, n] (0/1 valid mask), seeds [P].
    Returns [P, k*3 + 1] f32: centroids + member-pixel count packed for
    ONE d2h.

    Weighted Lloyd per palette (yakmo role, tilingencoder.pas:4458-4481):
    weighted-gumbel sample init, lowest-index argmin ties, exact weighted
    means. Batched over P with the n axis on VECTOR LANES: the previous
    vmapped [n, k] formulation put k=16 on the 128-wide lane axis (12%
    use) and measured 7-8 ms per Lloyd iteration at P=1024, n=2048; this
    [P, k, n] layout runs the distance/one-hot tensors at HBM rate."""
    P, n, _ = colors.shape
    # identical init draws: per-palette fold_in'd gumbel keys
    g = jax.vmap(lambda s: jax.random.gumbel(jax.random.PRNGKey(s), (n,)))(seeds)
    keyv = jnp.where(weights > 0,
                     jnp.log(jnp.maximum(weights, 1e-30)), -jnp.inf) + g
    _, idx = jax.lax.top_k(keyv, k)  # [P, k]
    cents = jnp.take_along_axis(colors, idx[:, :, None], axis=1)  # [P, k, 3]

    colsT = colors.transpose(0, 2, 1)  # [P, 3, n] — n on lanes
    x2 = jnp.sum(colsT * colsT, axis=1)  # [P, n]
    karange = jnp.arange(k, dtype=jnp.int32)[None, :, None]

    def lloyd(cents):
        c2 = jnp.sum(cents * cents, axis=-1)  # [P, k]
        d2 = (
            x2[:, None, :]
            - 2.0 * jnp.einsum("pkc,pcn->pkn", cents, colsT)
            + c2[:, :, None]
        )
        a = jnp.argmin(d2, axis=1)  # [P, n], ties -> lowest k
        oh = (a[:, None, :] == karange).astype(colors.dtype) * weights[:, None, :]
        cnt = jnp.sum(oh, axis=-1)  # [P, k]
        s = jnp.einsum("pkn,pcn->pkc", oh, colsT, precision="highest")
        return jnp.where(cnt[:, :, None] > 0,
                         s / jnp.maximum(cnt[:, :, None], 1e-30), cents)

    # convergence early-exit across ALL palettes at once (bit-identical
    # to the fixed-length scan — a converged iteration is the identity;
    # see cluster/kmeans.py). Small-k color quant converges in a few
    # iterations, so the batch usually exits well before `iters`.
    def cond(carry):
        _, i, done = carry
        return (i < iters) & ~done

    def body(carry):
        cents, i, _ = carry
        new = lloyd(cents)
        return new, i + 1, jnp.all(new == cents)

    cents, _, _ = jax.lax.while_loop(
        cond, body, (cents, jnp.int32(0), jnp.bool_(False))
    )
    return jnp.concatenate(
        [cents.reshape(P, k * 3), npix_d[:, None].astype(jnp.float32)], axis=1
    )


@functools.partial(jax.jit, static_argnames=("S", "max_rounds", "max_inner"))
def _optimize_palettes_dev(pal, valid, S: int, max_rounds: int, max_inner: int):
    """Device 2-opt on the OptimizePalettes objective — one fused program
    (the host-numpy version of this loop cost ~4.5s/encode at P=1024).

    Swap gains use the cancellation-free identity
        (ti+rj)^2 + (tj+ri)^2 - (ti+ri)^2 - (tj+rj)^2 = 2*(rj-ri)*(ti-tj)
    and  sqrt(a+d) - sqrt(a) = d / (sqrt(a+d) + sqrt(a)),
    so a gain is trusted down to ~1e-7 relative even though the raw
    objective is ~5e4 at P=1024 (naive fp32 obj_new - obj_cur had ~6e-3
    of rounding noise above the 1e-4 threshold, which made every palette
    "improve" forever: 3842 lockstep iterations, all caps hit, 1.9-3.4s;
    the stable form converges on true gains only)."""
    wch = jnp.array([RED_MUL, GREEN_MUL, BLUE_MUL], jnp.float32) / LUMA_DIV
    iu_i, iu_j = np.triu_indices(S, 1)
    iu_i = jnp.asarray(iu_i, jnp.int32)
    iu_j = jnp.asarray(iu_j, jnp.int32)
    mean = pal.sum(axis=(0, 1)) / S  # MeanR/G/B (tilingencoder.pas:4374-4380)
    slots = jnp.arange(S, dtype=jnp.int32)[None, :]

    def inner(t):
        dt2 = 2.0 * (t[:, iu_i] - t[:, iu_j])  # [P, pairs, 3], loop-invariant

        def body(c):
            pal, valid, it, _ = c
            d = t + pal
            ss = jnp.sum(d * d, axis=1)  # [P, 3]
            dss = (pal[:, iu_j] - pal[:, iu_i]) * dt2  # exact delta of ss
            sq_cur = jnp.sqrt(ss / S)  # [P, 3]
            sq_new = jnp.sqrt(jnp.maximum(ss[:, None, :] + dss, 0) / S)
            gain = jnp.sum(
                wch * (dss / S) / (sq_new + sq_cur[:, None, :] + 1e-20), -1
            )  # [P, pairs]
            best = jnp.argmax(gain, axis=1)
            bg = jnp.take_along_axis(gain, best[:, None], 1)[:, 0]
            do = bg > 1e-4
            bi = iu_i[best][:, None]
            bj = iu_j[best][:, None]
            sw = jnp.where(slots == bi, bj, jnp.where(slots == bj, bi, slots))
            sw = jnp.where(do[:, None], sw, slots)
            pal2 = jnp.take_along_axis(pal, sw[:, :, None], axis=1)
            valid2 = jnp.take_along_axis(valid, sw, axis=1)
            return pal2, valid2, it + 1, jnp.any(do)

        return body

    def outer_body(c):
        pal, valid, prev_obj, r, _ = c
        acc = pal.sum(axis=0, keepdims=True) - pal  # per-slot others
        t = acc - mean[None, None, :]  # held fixed through the inner 2-opt
        pal, valid, _, _ = jax.lax.while_loop(
            lambda c2: c2[3] & (c2[2] < max_inner),
            inner(t),
            (pal, valid, jnp.int32(0), jnp.bool_(True)),
        )
        dall = (pal.sum(axis=0, keepdims=True) - pal) + pal - mean[None, None, :]
        obj = jnp.mean(jnp.sum(wch * jnp.sqrt(jnp.sum(dall**2, 1) / S), -1))
        # relative threshold: the fp32 objective itself carries ~1e-7
        # relative noise, so an absolute epsilon would never converge
        return pal, valid, obj, r + 1, obj > prev_obj * (1 + 1e-5)

    pal, valid, _, _, _ = jax.lax.while_loop(
        lambda c: c[4] & (c[3] < max_rounds),
        outer_body,
        (pal, valid, jnp.float32(0), jnp.int32(0), jnp.bool_(True)),
    )
    return pal, valid


def optimize_palettes(state: EncodeState, settings: EncoderSettings,
                      max_rounds: int = 16) -> EncodeState:
    """2-opt swap search on the exact OptimizePalettes objective
    (PowellOP, tilingencoder.pas:4265-4307): maximize
      sum_c w_c * sqrt( sum_slot (acc_c[slot] + pal_c[slot] - mean_c)^2 / S )
    where acc = per-slot sum over the other palettes and mean = grand
    total / PaletteSize (:4374-4380). Stepwise over palettes until no gain
    (:4394-4421). Runs fully on device as a nested lax.while_loop; palette
    bytes are exact in fp32, so the swaps are value-preserving."""
    S = settings.palette_size
    # one packed h2d and one packed d2h (4 small crossings cost ~0.15s
    # of tunnel latency)
    packed_in = np.concatenate(
        [state.palettes_rgb.astype(np.float32),
         state.palettes_valid.astype(np.float32)[..., None]], axis=2,
    )

    @functools.partial(jax.jit, static_argnames=("S", "max_rounds"))
    def run(packed, S, max_rounds):
        pal, valid = _optimize_palettes_dev(
            packed[..., :3], packed[..., 3] != 0.0, S, max_rounds, S * S)
        return jnp.concatenate([pal, valid[..., None].astype(jnp.float32)],
                               axis=2)

    out = np.asarray(run(jnp.asarray(packed_in), S, max_rounds))
    state.palettes_rgb = out[..., :3].astype(np.uint8)
    state.palettes_valid = out[..., 3] != 0.0
    return state


def prepare_palettes(state: EncodeState, settings: EncoderSettings,
                     mesh=None) -> EncodeState:
    state = palettization(state, settings, mesh=mesh)
    state = quantization(state, settings)
    if settings.color_quantizer == "mediancut":
        # host-side quantizer: the permutation 2-opt runs as its own
        # device round trip (the k-means path fuses it on device)
        state = optimize_palettes(state, settings)
    return state

"""Pallas TPU kernel: fused corpus-distance + per-bucket top-2 for KNN.

The XLA top-k path materializes the [cells, Tpad] distance matrix in HBM
(3.8 GB per 720p frame at corpus 131072) and re-reads it in
approx_max_k: ~25 ms/frame of pure HBM traffic. This kernel computes the
distance block in VMEM and reduces it to per-bucket (min, argmin,
2nd-min, 2nd-argmin) on the fly — the only HBM output is
[buckets, cells] x4 (~50 MB), and the corpus matmul runs at MXU rates.

Ranking happens on d(c, t) = |ds_t|^2 - 2 <f_c, ds_t>: the per-cell
|f_c|^2 is candidate-invariant and dropped (the caller re-derives exact
errors for winners). Ranking is f32 (the XLA path cast to bf16 for
approx_max_k speed, this is strictly more precise).

Recall: the true top-k must be recovered from bucket top-2s. With
TB=512-wide buckets and k=64 over a hash-ordered corpus (reduce emits
tiles in hash order — pseudo-random with respect to similarity), the
expected loss is ~0.25 candidates/cell (Poisson tail with lambda=0.28) —
better than the approx_max_k recall_target=0.95 it replaces. k=1 is
EXACT (a global min is always its bucket's min).

Reference role: the int16 multi-NN kd-tree queries feeding
TFrame.Reconstruct (tilingencoder.pas:1528-1609) — itself approximate.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CB = 512  # cells per block
TB = 512  # corpus tiles per bucket
SB = 8    # buckets per grid step (Pallas output blocks need >=8 sublanes)
KD = 192  # feature dims


def _sortable(u):
    """Monotone int32 image of float32 bits: skey ascending == float
    ascending under SIGNED comparison (involution)."""
    return u ^ ((u >> 31) & jnp.int32(0x7FFFFFFF))


def _kernel(f_ref, ds_ref, d2_ref, k1_ref, k2_ref):
    f = f_ref[...]  # [CB, KD] bf16
    for s in range(SB):
        d = jnp.dot(
            f, ds_ref[:, s * TB : (s + 1) * TB],
            preferred_element_type=jnp.float32,
        )  # [CB, TB]
        d = d2_ref[:, s * TB : (s + 1) * TB] - 2.0 * d
        # Mosaic argmin costs ~6x a min reduction; pack the lane index
        # into the low 9 bits of a sortable int key instead (drops 9
        # mantissa bits -> 14-bit ranking mantissa, still finer than the
        # bf16 ranking of the XLA path) — measured 12 ms vs 51 ms for
        # the argmin formulation at bench shapes
        u = _sortable(jax.lax.bitcast_convert_type(d, jnp.int32))
        iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        key = (u & jnp.int32(~0x1FF)) | iota
        m1 = jnp.min(key, axis=1)  # [CB]
        key2 = jnp.where(key == m1[:, None], jnp.int32(2**31 - 1), key)
        m2 = jnp.min(key2, axis=1)
        k1_ref[s, :] = m1
        k2_ref[s, :] = m2


KDA = 208  # augmented contraction dim: 192 feats + 4 fold terms + pad


def _kernel2(f_ref, ds_ref, k1_ref, k2_ref):
    """v2: every distance term folded INTO the matmul. The roofline audit
    (scripts/roofline.py, PERF.md r5) put v1 at ~6% MXU with the wall in
    the ~11 VPU ops/element of post-matmul key packing (d2 add, -2 mul,
    sortable xor chain, in-loop iota). Here the MXU emits the TRUE
    squared distance directly — rows carry [-2f, |f|^2(hi,lo), 1, 1],
    columns [ds, 1, 1, |ds|^2(hi,lo)], each magnitude term split into
    two bf16 limbs for ~16-bit mantissa (the key keeps 15) — so the VPU
    does only max+mask+or+min+select+min (~6 ops/elem), and
    non-negative floats need no sortable transform (raw f32 bits are
    monotone; max(d,0) collapses rounding's tiny negatives to exact-0
    ties broken toward the low lane index, like the reference's sorted
    scan)."""
    f = f_ref[...]  # [CB, KDA] bf16
    iota = jax.lax.broadcasted_iota(jnp.int32, (CB, TB), 1)
    for s in range(SB):
        d = jnp.dot(
            f, ds_ref[:, s * TB : (s + 1) * TB],
            preferred_element_type=jnp.float32,
        )  # [CB, TB] = true |f - ds|^2 (up to fold rounding)
        d = jnp.maximum(d, 0.0)
        key = (jax.lax.bitcast_convert_type(d, jnp.int32)
               & jnp.int32(~0x1FF)) | iota
        m1 = jnp.min(key, axis=1)
        k1_ref[s, :] = m1
        k2_ref[s, :] = jnp.min(
            jnp.where(key == m1[:, None], jnp.int32(2**31 - 1), key), axis=1)


def _split_bf16(x):
    """Two-limb bf16 split: hi + lo == x to ~16-bit mantissa."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def knn_prep2(ds, Tp: int):
    """Once-per-encode corpus prep for knn_bucket_topk2: [KDA, Tp] bf16
    augmented transposed corpus (rows: ds, 1, 1, d2_hi, d2_lo, 0-pad).
    Padded corpus rows carry d2 = 1e30 so they rank last."""
    T = ds.shape[0]
    dsp = jnp.pad(ds, ((0, Tp - T), (0, 0)))
    d2 = jnp.sum(dsp * dsp, axis=1) + jnp.where(
        jnp.arange(Tp) < T, 0.0, 1e30)
    hi, lo = _split_bf16(d2)
    one = jnp.ones((1, Tp), jnp.bfloat16)
    out = jnp.concatenate([
        dsp.astype(jnp.bfloat16).T, one, one, hi[None], lo[None],
        jnp.zeros((KDA - KD - 4, Tp), jnp.bfloat16),
    ])
    return out


@functools.partial(jax.jit, static_argnames=("k",))
def knn_bucket_topk2(feats, dsTa, k: int):
    """v2 entry: feats [N, 192] f32, dsTa from knn_prep2. Returns
    (idx [N, k] i32, err [N, k] f32 ascending TRUE squared distance,
    15-bit ranking mantissa). Ranking differs from v1 only in rounding
    detail (fold limbs vs f32 adds) — near-tie candidate boundaries can
    shift; exact errors are recomputed downstream either way."""
    N = feats.shape[0]
    Tp = dsTa.shape[1]
    assert Tp % (SB * TB) == 0
    nb = Tp // TB
    Np = -(-N // CB) * CB
    f32 = feats.astype(jnp.float32)
    f2 = jnp.sum(f32 * f32, axis=1)
    hi, lo = _split_bf16(f2)
    one = jnp.ones((N, 1), jnp.bfloat16)
    fa = jnp.concatenate([
        (-2.0 * f32).astype(jnp.bfloat16), hi[:, None], lo[:, None],
        one, one, jnp.zeros((N, KDA - KD - 4), jnp.bfloat16)], axis=1)
    fp = jnp.pad(fa, ((0, Np - N), (0, 0)))

    grid = (Np // CB, nb // SB)
    ob = pl.BlockSpec((SB, CB), lambda i, j: (j, i))
    k1, k2 = pl.pallas_call(
        _kernel2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CB, KDA), lambda i, j: (i, 0)),
            pl.BlockSpec((KDA, SB * TB), lambda i, j: (0, j)),
        ],
        out_specs=[ob, ob],
        out_shape=[
            jax.ShapeDtypeStruct((nb, Np), jnp.int32),
            jax.ShapeDtypeStruct((nb, Np), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() == "cpu",  # CPU tests
    )(fp, dsTa)

    base = (jnp.arange(nb, dtype=jnp.int32) * TB)[:, None]
    keys = jnp.concatenate([k1, k2], axis=0).T[:N]  # [N, 2*nb]
    bases = jnp.concatenate([base, base], axis=0).T

    def decode(key, b):
        idx = b + (key & 0x1FF)
        return idx, jax.lax.bitcast_convert_type(
            key & jnp.int32(~0x1FF), jnp.float32)

    if k == 1:
        sel = jnp.argmin(keys, axis=1)
        key = jnp.take_along_axis(keys, sel[:, None], 1)
        return decode(key, bases[0][sel][:, None])
    neg, sel = jax.lax.top_k(-keys, k)
    return decode(-neg, bases[0][sel])


@functools.partial(jax.jit, static_argnames=("k",))
def knn_bucket_topk(feats, dsT, d2, k: int):
    """feats [N, 192] f32/bf16, dsT [192, T] bf16 TRANSPOSED corpus
    features (T a multiple of SB*TB; transpose+cast once per encode —
    doing it per call costs a ~45MB relayout), d2 [T] f32 = |ds|^2
    (+1e30 on padded rows). Returns (idx [N, k] i32, err [N, k] f32
    ascending) ranked on |ds|^2 - 2<f, ds> (NO |f|^2 term)."""
    N = feats.shape[0]
    T = dsT.shape[1]
    assert T % (SB * TB) == 0
    nb = T // TB
    Np = -(-N // CB) * CB
    fp = jnp.pad(feats.astype(jnp.bfloat16), ((0, Np - N), (0, 0)))

    grid = (Np // CB, nb // SB)
    out_shape = [
        jax.ShapeDtypeStruct((nb, Np), jnp.int32),  # packed key 1
        jax.ShapeDtypeStruct((nb, Np), jnp.int32),  # packed key 2
    ]
    ob = pl.BlockSpec((SB, CB), lambda i, j: (j, i))
    k1, k2 = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CB, KD), lambda i, j: (i, 0)),
            pl.BlockSpec((KD, SB * TB), lambda i, j: (0, j)),
            pl.BlockSpec((1, SB * TB), lambda i, j: (0, j)),
        ],
        out_specs=[ob, ob],
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() == "cpu",  # CPU tests
    )(fp, dsT.astype(jnp.bfloat16), d2[None, :])

    # merge bucket top-2s into the global top-k on the PACKED keys (key
    # order == distance order; in-bucket lane index breaks exact ties
    # toward the lower corpus index, like the reference's sorted scan)
    base = (jnp.arange(nb, dtype=jnp.int32) * TB)[:, None]
    keys = jnp.concatenate([k1, k2], axis=0).T[:N]  # [N, 2*nb]
    bases = jnp.concatenate([base, base], axis=0).T  # [1-broadcast, 2*nb]

    def decode(key, b):
        idx = b + (key & 0x1FF)
        u = _sortable(key & jnp.int32(~0x1FF))
        return idx, jax.lax.bitcast_convert_type(u, jnp.float32)

    if k == 1:
        sel = jnp.argmin(keys, axis=1)
        key = jnp.take_along_axis(keys, sel[:, None], 1)
        b = bases[0][sel][:, None]
        return decode(key, b)
    neg, sel = jax.lax.top_k(-keys, k)
    return decode(-neg, bases[0][sel])

"""HBM-resident weighted k-means: the TPU replacement for the reference's
native clustering DLLs.

One engine covers all three uses (SURVEY.md section 2.2):
  - BICO streaming coreset (corpus -> PaletteCount*8 summary points,
    tilingencoder.pas:4149-4173): weighted k-means on the full corpus —
    the corpus fits HBM, so the streaming summary is unnecessary.
  - ANN kd-tree cluster assignment (:4183-4188): exact brute-force
    1-NN via distance matmuls (exact beats approximate).
  - yakmo multi-restart k-means++ (:4196-4207, :4434-4500): k-means++
    init + Lloyd iterations.

Distances use the matmul identity |x-c|^2 = |x|^2 - 2 x.c + |c|^2 so the
MXU does the work; N is chunked via lax.scan to bound the distance-matrix
footprint.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _pad_to(x, n, fill=0):
    if x.shape[0] == n:
        return x
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=fill)


@functools.partial(jax.jit, static_argnames=("chunk",))
def assign_nearest(points, centroids, chunk: int = 16384):
    """Exact 1-NN: argmin_c |x - c|^2 ; returns (assign int32 [N], d2 [N])."""
    n, d = points.shape
    nn = -(-n // chunk) * chunk
    pts = _pad_to(points, nn)
    c2 = jnp.sum(centroids * centroids, axis=1)

    def body(_, x):
        x2 = jnp.sum(x * x, axis=1, keepdims=True)
        d2 = x2 - 2.0 * (x @ centroids.T) + c2[None, :]
        a = jnp.argmin(d2, axis=1)
        return None, (a.astype(jnp.int32), jnp.take_along_axis(d2, a[:, None], axis=1)[:, 0])

    _, (assign, d2) = jax.lax.scan(body, None, pts.reshape(-1, chunk, d))
    return assign.reshape(nn)[:n], d2.reshape(nn)[:n]


@functools.partial(jax.jit, static_argnames=("k",))
def kmeans_pp_init(points, weights, k: int, key):
    """k-means++ seeding (yakmo-equivalent; D. Arthur init), via lax.scan."""
    n, d = points.shape
    logw = jnp.where(weights > 0, jnp.log(jnp.maximum(weights, 1e-30)), -jnp.inf)
    first = jax.random.categorical(key, logw)
    min_d2 = jnp.full((n,), jnp.inf, points.dtype)
    cent0 = points[first]

    def step(carry, key_i):
        min_d2, prev_c = carry
        dd = points - prev_c[None, :]
        d2 = jnp.sum(dd * dd, axis=1)
        min_d2 = jnp.minimum(min_d2, d2)
        logits = logw + jnp.log(jnp.maximum(min_d2, 1e-30))
        nxt = jax.random.categorical(key_i, logits)
        c = points[nxt]
        return (min_d2, c), c

    keys = jax.random.split(key, k - 1) if k > 1 else jnp.zeros((0, 2), jnp.uint32)
    (_, _), rest = jax.lax.scan(step, (min_d2, cent0), keys)
    return jnp.concatenate([cent0[None], rest], axis=0) if k > 1 else cent0[None]


@functools.partial(jax.jit, static_argnames=("k", "iters", "chunk", "init"))
def _kmeans_jit(points, weights, key, k: int, iters: int, chunk: int, init: str):
    n, d = points.shape
    if init == "kpp":
        cents = kmeans_pp_init(points, weights, k, key)
    else:
        # weighted sample without replacement (Gumbel top-k)
        g = jax.random.gumbel(key, (n,))
        keys_ = jnp.where(weights > 0, jnp.log(jnp.maximum(weights, 1e-30)), -jnp.inf) + g
        _, idx = jax.lax.top_k(keys_, k)
        cents = points[idx]

    nn = -(-n // chunk) * chunk
    pts = _pad_to(points, nn).reshape(-1, chunk, d)
    w = _pad_to(weights, nn).reshape(-1, chunk)

    def lloyd(cents):
        c2 = jnp.sum(cents * cents, axis=1)
        cb = cents.astype(jnp.bfloat16)

        def acc(carry, xw):
            x, wi = xw
            x2 = jnp.sum(x * x, axis=1, keepdims=True)
            # assignment ranking in bf16 (fast MXU path)
            d2 = x2 - 2.0 * jnp.matmul(
                x.astype(jnp.bfloat16), cb.T, preferred_element_type=jnp.float32
            ) + c2[None, :]
            a = jnp.argmin(d2, axis=1)
            sums, cnts = carry
            sums = sums + jax.ops.segment_sum(x * wi[:, None], a, num_segments=k)
            cnts = cnts + jax.ops.segment_sum(wi, a, num_segments=k)
            return (sums, cnts), None

        (sums, cnts), _ = jax.lax.scan(
            acc, (jnp.zeros((k, d), points.dtype), jnp.zeros((k,), points.dtype)), (pts, w)
        )
        return jnp.where(cnts[:, None] > 0, sums / jnp.maximum(cnts[:, None], 1e-30), cents)

    # convergence early-exit (yakmo also iterates to convergence under a
    # hard cap, utils.pas:17): once an iteration reproduces its input
    # centroids exactly, every further iteration is the identity, so
    # stopping yields bit-identical output to the fixed-length scan
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
    assign, d2 = assign_nearest(points, cents, chunk=chunk)
    return cents, assign, d2


def kmeans(points, k: int, *, weights=None, iters: int = 30, seed: int = 0,
           chunk: int = 16384, init: str = "sample"):
    """Weighted k-means. Returns (centroids [k,D], assign [N], d2 [N]).

    N is padded to a power of two with zero-weight points so the jit
    compiles once per size class, not once per dataset size."""
    points = jnp.asarray(points, jnp.float32)
    n = points.shape[0]
    if weights is None:
        weights = jnp.ones((n,), jnp.float32)
    else:
        weights = jnp.asarray(weights, jnp.float32)
    k = int(min(k, n))
    npad = 256
    while npad < n:
        npad *= 2
    if npad != n:
        points = jnp.pad(points, ((0, npad - n), (0, 0)))
        weights = jnp.pad(weights, (0, npad - n))
    key = jax.random.PRNGKey(seed)
    chunk = int(min(chunk, npad))
    cents, assign, d2 = _kmeans_jit(points, weights, key, k, iters, chunk, init)
    return cents, assign[:n], d2[:n]

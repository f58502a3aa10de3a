"""Point-sharded weighted k-means: each chip assigns its point shard and
contributes partial centroid sums; psum over ICI merges them. Replaces
yakmo's OpenMP threads (extern.pas:198-209) with mesh collectives."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def sharded_lloyd_step(points, weights, cents, mesh: Mesh, data_axis: str = "corpus"):
    """One Lloyd iteration. points [N, D] and weights [N] sharded over
    `data_axis`; cents [k, D] replicated. Returns new centroids."""
    k = cents.shape[0]

    def local(pts, w, c):
        d2 = (
            jnp.sum(pts * pts, 1, keepdims=True)
            - 2.0 * (pts @ c.T)
            + jnp.sum(c * c, 1)[None, :]
        )
        a = jnp.argmin(d2, axis=1)
        oh = jax.nn.one_hot(a, k, dtype=pts.dtype) * w[:, None]
        sums = jnp.einsum("nk,nd->kd", oh, pts, precision="highest")
        cnts = oh.sum(axis=0)
        sums = jax.lax.psum(sums, data_axis)
        cnts = jax.lax.psum(cnts, data_axis)
        return jnp.where(cnts[:, None] > 0, sums / jnp.maximum(cnts[:, None], 1e-30), c)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(data_axis, None), P(data_axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(points, weights, cents)


def sharded_lloyd(points, weights, cents, iters: int, mesh: Mesh,
                  data_axis: str = "corpus"):
    """All Lloyd iterations in ONE program: a lax.while_loop around the
    psum'd step with the same exact fixed-point early-exit as
    cluster/kmeans.py (bit-identical to iterating `iters` times). The
    convergence predicate is computed from the post-psum REPLICATED
    centroids, so every shard takes the same trip count — collectives
    inside the loop stay lockstep. Also collapses `iters` host
    dispatches into one."""
    k = cents.shape[0]

    def local(pts, w, c0):
        def one(c):
            d2 = (
                jnp.sum(pts * pts, 1, keepdims=True)
                - 2.0 * (pts @ c.T)
                + jnp.sum(c * c, 1)[None, :]
            )
            a = jnp.argmin(d2, axis=1)
            oh = jax.nn.one_hot(a, k, dtype=pts.dtype) * w[:, None]
            sums = jax.lax.psum(
                jnp.einsum("nk,nd->kd", oh, pts, precision="highest"), data_axis
            )
            cnts = jax.lax.psum(oh.sum(axis=0), data_axis)
            return jnp.where(
                cnts[:, None] > 0, sums / jnp.maximum(cnts[:, None], 1e-30), c
            )

        def cond(carry):
            _, i, done = carry
            return (i < iters) & ~done

        def body(carry):
            c, i, _ = carry
            new = one(c)
            return new, i + 1, jnp.all(new == c)

        c, _, _ = jax.lax.while_loop(
            cond, body, (c0, jnp.int32(0), jnp.bool_(False))
        )
        return c

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(data_axis, None), P(data_axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(points, weights, cents)


def sharded_assign(points, cents, mesh: Mesh, data_axis: str = "corpus"):
    """Exact 1-NN assignment of sharded points against replicated
    centroids; returns (assign [N] int32, d2 [N]) sharded like points."""

    def local(pts, c):
        d2 = (
            jnp.sum(pts * pts, 1, keepdims=True)
            - 2.0 * (pts @ c.T)
            + jnp.sum(c * c, 1)[None, :]
        )
        a = jnp.argmin(d2, axis=1)
        return a.astype(jnp.int32), jnp.take_along_axis(d2, a[:, None], 1)[:, 0]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(data_axis, None), P()),
        out_specs=(P(data_axis), P(data_axis)),
        check_vma=False,
    )
    return fn(points, cents)


def sharded_kmeans(points, k: int, *, weights, iters: int, seed: int,
                   mesh: Mesh, data_axis: str = "corpus"):
    """Weighted k-means with the points sharded over `data_axis`:
    assignment matmuls run shard-local, centroid sums psum over ICI
    (cluster/kmeans.py's engine distributed; same Lloyd fixed points).

    Returns (cents [k, D], assign [N] int32, d2 [N]) — assign/d2 gathered
    to the host caller's layout."""
    import numpy as np
    from jax.sharding import NamedSharding

    n, d = points.shape
    nshard = mesh.shape[data_axis]
    npad = -(-n // nshard) * nshard
    pts = jnp.pad(jnp.asarray(points, jnp.float32), ((0, npad - n), (0, 0)))
    w = jnp.pad(jnp.asarray(weights, jnp.float32), (0, npad - n))
    pts = jax.device_put(pts, NamedSharding(mesh, P(data_axis, None)))
    w = jax.device_put(w, NamedSharding(mesh, P(data_axis)))

    # weighted sample init (Gumbel top-k), replicated
    key = jax.random.PRNGKey(seed)
    g = jax.random.gumbel(key, (npad,))
    keys_ = jnp.where(w > 0, jnp.log(jnp.maximum(w, 1e-30)), -jnp.inf) + g
    _, idx = jax.lax.top_k(keys_, min(k, n))
    cents = jnp.asarray(points, jnp.float32)[idx]

    cents = sharded_lloyd(pts, w, cents, iters, mesh, data_axis=data_axis)
    assign, d2 = sharded_assign(pts, cents, mesh, data_axis=data_axis)
    return cents, assign[:n], d2[:n]

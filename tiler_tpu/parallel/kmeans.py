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

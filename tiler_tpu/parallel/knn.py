"""Corpus-sharded exact KNN: each chip ranks its corpus shard locally
(MXU matmuls), then candidates ride ICI via all_gather for the global
re-rank. Replaces ANN_short.dll kd-tree queries (extern.pas:182-185) with
exact distributed brute force."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def sharded_topk(feats, ds, k: int, mesh: Mesh, corpus_axis: str = "corpus"):
    """feats [N, D] (replicated), ds [T, D] sharded over `corpus_axis`
    (T divisible by mesh size). Returns (idx [N, k] int32 global indexes,
    err [N, k] ascending squared-L2)."""
    T = ds.shape[0]
    nshard = mesh.shape[corpus_axis]
    assert T % nshard == 0, "pad the corpus to a multiple of the mesh size"
    tloc = T // nshard

    def local(feats_l, ds_l):
        ax = jax.lax.axis_index(corpus_axis)
        f2 = jnp.sum(feats_l * feats_l, axis=1, keepdims=True)
        d2 = f2 - 2.0 * (feats_l @ ds_l.T) + jnp.sum(ds_l * ds_l, axis=1)[None, :]
        kk = min(k, tloc)
        nege, sel = jax.lax.top_k(-d2, kk)
        gidx = (sel + ax * tloc).astype(jnp.int32)
        # gather all shards' candidates and re-rank globally
        all_e = jax.lax.all_gather(-nege, corpus_axis, axis=0, tiled=False)
        all_i = jax.lax.all_gather(gidx, corpus_axis, axis=0, tiled=False)
        all_e = jnp.moveaxis(all_e, 0, 1).reshape(feats_l.shape[0], -1)
        all_i = jnp.moveaxis(all_i, 0, 1).reshape(feats_l.shape[0], -1)
        nege2, sel2 = jax.lax.top_k(-all_e, k)
        return jnp.take_along_axis(all_i, sel2, axis=1), -nege2

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(corpus_axis, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(feats, ds)

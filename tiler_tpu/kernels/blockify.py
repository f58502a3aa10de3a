"""Pallas TPU kernel: planar->blocked field relayout.

[HP, WP, K] -> [mh, mw, 64, K] where HP=8*mh, WP=8*mw and the 64 axis is
the (sy, sx) phase raster. With K on lanes the permute touches only
sublane-side axes — pure VMEM data movement, no lane transposes — where
the XLA transpose of the same tensor measured ~17 ms/720p frame
(scripts/profile_hot.py r2; the motion field's block layout exists to
dodge exactly that copy, at the cost of an elementwise-accumulation
field pass the r5 roofline showed is 10x off its bandwidth floor).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _col_chunk(mw: int, kd: int, itemsize: int) -> int:
    """Largest divisor of mw whose [1, 8, tw, 8, K] block stays <= ~1 MB.

    A whole-row block at 720p ([1, 8, 168, 8, 192] bf16 = 4.1 MB) overflows
    the 16 MB scoped-vmem stack once Mosaic double-buffers in+out and
    materializes the transpose copy (measured: 21 MB request, r5 battery).
    """
    budget = 1 << 20
    for tw in range(mw, 0, -1):
        if mw % tw == 0 and 8 * tw * 8 * kd * itemsize <= budget:
            return tw
    return 1


@jax.jit
def blockify_field(F):
    """F [HP, WP, K] -> [mh, mw, 64, K] (dtype-preserving)."""
    HP, WP, Kd = F.shape
    mh, mw = HP // 8, WP // 8
    tw = _col_chunk(mw, Kd, F.dtype.itemsize)
    Fr = F.reshape(mh, 8, mw, 8, Kd)

    def kern(i_ref, o_ref):
        x = i_ref[...]  # [1, 8, tw, 8, K]
        o_ref[...] = x.transpose(0, 2, 1, 3, 4).reshape(1, tw, 64, Kd)

    return pl.pallas_call(
        kern,
        grid=(mh, mw // tw),
        in_specs=[pl.BlockSpec((1, 8, tw, 8, Kd),
                               lambda i, j: (i, 0, j, 0, 0))],
        out_specs=pl.BlockSpec((1, tw, 64, Kd), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((mh, mw, 64, Kd), F.dtype),
        interpret=jax.default_backend() == "cpu",
    )(Fr)

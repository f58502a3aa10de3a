"""Quality metrics: PSNR-HVS (weighted-DCT-domain PSNR) and Pearson correlation.

References: EuclideanToPSNR (utils.pas:1074-1078), PearsonCorrelation
(tilingencoder.pas:2201-2230), per-tile mean LAB inter-frame data
(tilingencoder.pas:1329-1368).
"""
from __future__ import annotations

import math

import jax.numpy as jnp

TILE_DCT_SIZE = 192

# cPsnrMaxValue = 10*log10(255^2/0.5) (utils.pas:112). Plain float: a
# jnp scalar here would init the JAX backend at IMPORT time, which
# blocks forever when the axon tunnel is down (every consumer of this
# module used to need a watchdog-wrapped import because of it)
PSNR_MAX = 10 * math.log10(255 * 255 / 0.5)


def euclidean_to_psnr(err):
    """Squared-L2 error over a 192-dim weighted-DCT vector -> PSNR-HVS dB."""
    mse = err * (1.0 / TILE_DCT_SIZE)
    return 10.0 * jnp.log10(255.0 * 255.0 / jnp.maximum(0.5, mse))


def pearson(x, y, axis=-1):
    """Pearson correlation along `axis`; returns 1.0 when degenerate."""
    mx = jnp.mean(x, axis=axis, keepdims=True)
    my = jnp.mean(y, axis=axis, keepdims=True)
    xc = x - mx
    yc = y - my
    num = jnp.sum(xc * yc, axis=axis)
    den = jnp.sqrt(jnp.sum(xc * xc, axis=axis)) * jnp.sqrt(jnp.sum(yc * yc, axis=axis))
    return jnp.where(den != 0.0, num / jnp.where(den == 0, 1.0, den), 1.0)

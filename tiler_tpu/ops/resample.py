"""On-device Lanczos resampling + planar (YUV) ingest conversion.

The reference resamples on the HOST via ffmpeg's sws_scale Lanczos
(`Scaling` factor, extern.pas:759-789) because it has no device. A
TPU-first ingest ships SOURCE-resolution pixels over the (scarce)
host->device link and resamples on chip: a separable Lanczos-3 resize is
two small dense matmuls per frame — MXU food — and CIF->720p cuts h2d
bytes ~13x (planar 4:2:0 input: ~18x).

Semantics: identical pipeline order to the host path (io/video.py)
so `device_resample` only moves WHERE the work runs:
  y4m C420:  nearest chroma upsample -> BT.601 full-range YUV->RGB
             -> round/clip uint8  (bit-identical math to load_y4m)
  scaling!=1: Lanczos-3 resize of the uint8 RGB -> round/clip uint8.
The filter itself differs from the host's PIL Lanczos only in
implementation detail (PIL quantizes coefficients to 8-bit fixed point
and rounds the intermediate pass to uint8; we keep f32 between passes).
Measured filter difference on real content is ~50 dB PSNR — see
tests/test_resample.py and docs/PERF.md.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TILE_W = 8


def lanczos_matrix(n_in: int, n_out: int, a: int = 3) -> np.ndarray:
    """Dense [n_out, n_in] row-normalized Lanczos-a resampling matrix with
    PIL/sws-style center alignment: out pixel i samples input coordinate
    (i + 0.5) * n_in / n_out. For downscale the kernel widens by the
    scale factor (anti-aliasing), matching PIL's convention."""
    scale = n_in / n_out
    fscale = max(scale, 1.0)
    support = a * fscale
    centers = (np.arange(n_out, dtype=np.float64) + 0.5) * scale
    # window of contributing input pixels per output pixel
    j = np.arange(n_in, dtype=np.float64)
    x = (j[None, :] + 0.5 - centers[:, None]) / fscale  # [n_out, n_in]
    with np.errstate(divide="ignore", invalid="ignore"):
        w = np.sinc(x) * np.sinc(x / a)
    w[np.abs(x) >= a] = 0.0
    # out-of-range taps clamp to the edge in PIL; with a dense matrix the
    # same effect comes from renormalizing each row over in-range taps
    rs = w.sum(axis=1, keepdims=True)
    rs[rs == 0] = 1.0
    return (w / rs).astype(np.float32)


def _pad_hw(h: int, w: int):
    return (-(-h // TILE_W)) * TILE_W, (-(-w // TILE_W)) * TILE_W


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_rgb(frames_u8, lh, lw, *, out_h: int, out_w: int):
    """uint8 [B,h,w,3] -> uint8 [B,Hp,Wp,3] (Lanczos resize to
    (out_h,out_w), then zero-pad to tile multiples — pad_frame parity)."""
    x = frames_u8.astype(jnp.float32)
    # vertical then horizontal pass, f32 end to end, HIGHEST matmul
    # precision (bf16 passes would cost ~0.3 LSB of visible banding)
    x = jnp.einsum("oh,bhwc->bowc", lh, x,
                   precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("ow,bhwc->bhoc", lw, x,
                   precision=jax.lax.Precision.HIGHEST)
    x = jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)
    ph, pw = _pad_hw(out_h, out_w)
    return jnp.pad(x, ((0, 0), (0, ph - out_h), (0, pw - out_w), (0, 0)))


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "resize"))
def planar_to_rgb(y, u, v, lh, lw, *, out_h: int, out_w: int, resize: bool):
    """Y [B,h,w] + U/V [B,hc,wc] uint8 -> uint8 RGB [B,Hp,Wp,3].

    Exactly the host y4m path's math (io/video.py load_y4m): nearest
    chroma upsample, BT.601 full-range, round/clip to uint8 — then the
    optional on-device resize. At scaling=1 the result is bit-identical
    to the host path."""
    B, h, w = y.shape
    yf = y.astype(jnp.float32)
    uf = u.astype(jnp.float32) - 128.0
    vf = v.astype(jnp.float32) - 128.0
    if u.shape[1] != h or u.shape[2] != w:  # nearest upsample (host parity)
        ry, rx = h // u.shape[1], w // u.shape[2]
        uf = jnp.repeat(jnp.repeat(uf, ry, axis=1), rx, axis=2)
        vf = jnp.repeat(jnp.repeat(vf, ry, axis=1), rx, axis=2)
    r = yf + 1.13983 * vf
    g = yf - 0.39465 * uf - 0.58060 * vf
    b = yf + 2.03211 * uf
    rgb = jnp.clip(jnp.round(jnp.stack([r, g, b], -1)), 0, 255)
    rgb = rgb.astype(jnp.uint8)
    if resize:
        return resize_rgb(rgb, lh, lw, out_h=out_h, out_w=out_w)
    ph, pw = _pad_hw(out_h, out_w)
    return jnp.pad(rgb, ((0, 0), (0, ph - out_h), (0, pw - out_w), (0, 0)))

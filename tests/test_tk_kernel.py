"""Pallas TK-dither kernel vs the XLA lax.scan implementation
(interpret mode on CPU; the TPU path compiles the same kernel)."""
import numpy as np
import jax.numpy as jnp

from tiler_tpu.kernels import tk_dither as K
from tiler_tpu.pipeline import dither as D


def test_tk_kernel_matches_xla():
    rng = np.random.RandomState(0)
    T, P, S = 40, 5, 16
    tiles = rng.randint(0, 256, (T, 8, 8, 3)).astype(np.uint8)
    pidx = rng.randint(0, P, T).astype(np.int32)
    pal = rng.randint(0, 256, (P, S, 3)).astype(np.int32)
    valid = np.ones((P, S), bool)
    valid[2, -3:] = False
    bayer = np.broadcast_to(D.BAYER8, (T, 8, 8)).copy()

    got = np.asarray(
        K.tk_dither_pallas(
            jnp.asarray(tiles), jnp.asarray(pidx), jnp.asarray(pal),
            jnp.asarray(valid), jnp.asarray(bayer), interpret=True,
        )
    )

    # oracle: existing XLA path
    pix = tiles.reshape(T * 64, 3).astype(np.int32)
    prgb = np.repeat(pal[pidx], 64, axis=0)
    pvalid = np.repeat(valid[pidx], 64, axis=0)
    lists = np.asarray(
        D.thomas_knoll_lists(jnp.asarray(pix), jnp.asarray(prgb), jnp.asarray(pvalid), S)
    )
    mapv = bayer.reshape(T * 64)
    want = np.take_along_axis(lists, mapv[:, None], axis=1)[:, 0].reshape(T, 8, 8)

    # compare by the actual RGB of selected colors (equal-luma ties may pick
    # different but identically-scored slots)
    lum = pal[..., 0] * 299 + pal[..., 1] * 587 + pal[..., 2] * 114
    got_lum = lum[pidx[:, None, None], got]
    want_lum = lum[pidx[:, None, None], want]
    assert np.array_equal(got_lum, want_lum)
    match = (got == want).mean()
    assert match > 0.99, f"selection match {match:.3%}"

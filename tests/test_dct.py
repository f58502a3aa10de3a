"""DCT feature extractor invariants, mirroring TTilingEncoder.Test
(tilingencoder.pas:3876-3898): DCT->invDCT, weighted DCT->inv, and
wavelet->dewavelet must reconstruct the synthetic gradient tile exactly
(after byte rounding)."""
import numpy as np
import jax.numpy as jnp

from tiler_tpu.ops import dct


def _test_tile():
    # T.RGBPixels[i,j] := ToRGB(i*8, j*32, i*j)  (tilingencoder.pas:3872-3874)
    i = np.arange(8)[:, None]
    j = np.arange(8)[None, :]
    t = np.stack([i * 8 * np.ones_like(j), j * 32 * np.ones_like(i), i * j], axis=-1)
    return t.astype(np.float64)


def test_dct_inverse_roundtrip():
    t = jnp.asarray(_test_tile())
    for mode in ("dct", "weighted_dct"):
        feat = dct.tile_features(t, mode=mode)
        back = dct.inv_tile_features(feat, mode=mode)
        assert np.array_equal(np.asarray(back), np.asarray(t)), mode


def test_wavelet_inverse_roundtrip():
    t = jnp.asarray(_test_tile())
    feat = dct.tile_features(t, mode="wavelets")
    back = dct.inv_tile_features(feat, mode="wavelets")
    assert np.array_equal(np.asarray(back), np.asarray(t))


def test_snake_is_permutation():
    assert sorted(dct.SNAKE.tolist()) == list(range(64))
    assert np.array_equal(dct.SNAKE[dct.SNAKE_INV], np.arange(64))


def test_zigzag_layout_matches_reference():
    # DC coefficient (v=u=0) must land at output index 0 per channel;
    # coefficient (v=0,u=1) at index 1, (v=1,u=0) at index 2 (snake layout).
    t = jnp.asarray(_test_tile())
    feat = np.asarray(dct.tile_features(t, mode="dct", use_lab=False))
    cpn = np.asarray(dct.to_cpn(t))
    D = dct.DCT_MAT
    z = np.einsum("vy,yxc,ux->vuc", D, np.asarray(cpn), D)
    for c in range(3):
        assert np.allclose(feat[c * 64 + 0], z[0, 0, c])
        assert np.allclose(feat[c * 64 + 1], z[0, 1, c])
        assert np.allclose(feat[c * 64 + 2], z[1, 0, c])
        # (v=0,u=2) -> snake 5
        assert np.allclose(feat[c * 64 + 5], z[0, 2, c])


def test_weights_symmetric_and_positive():
    assert np.all(dct.DCT_WEIGHTS > 0)
    for c in range(3):
        assert np.array_equal(dct.DCT_WEIGHTS[c], dct.DCT_WEIGHTS[c].T)


def test_batched_features_shape():
    rng = np.random.RandomState(0)
    tiles = rng.randint(0, 256, size=(17, 8, 8, 3)).astype(np.float32)
    feat = dct.tile_features(jnp.asarray(tiles), mode="weighted_spe_dct")
    assert feat.shape == (17, 192)
    q = dct.quantize_features(feat)
    assert q.dtype == jnp.int16


def test_spe_dct_halves_frequency():
    # Spe-DCT of a constant tile: DC ratio vs standard DCT should match the
    # cos((x+.5)*0*pi/16)=1 structure -> identical DC, different AC basis.
    t = jnp.ones((8, 8, 3)) * 100.0
    f_std = np.asarray(dct.tile_features(t, mode="dct"))
    f_spe = np.asarray(dct.tile_features(t, mode="spe_dct"))
    assert np.allclose(f_std[0], f_spe[0])

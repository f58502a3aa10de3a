"""Motion search vs a brute-force oracle (semantics of
TFrame.PredictMotion, tilingencoder.pas:1184-1248: min weighted-DCT L2
over offsets [-R, R-1]^2 clipped to the frame, + Manhattan tie penalty,
first minimum in (oy, ox) raster order)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tiler_tpu.pipeline import motion


def _brute_force(cur, prev, R):
    H, W, _ = cur.shape
    th, tw = H // 8, W // 8
    # window features of prev
    F = np.asarray(motion.window_dct_field(jnp.asarray(prev, jnp.float32)))
    T = np.asarray(motion.tile_features_raster(
        jnp.asarray(cur, jnp.float32).reshape(th, 8, tw, 8, 3).swapaxes(1, 2)))
    best = np.zeros((th, tw, 3))
    for i in range(th):
        for j in range(tw):
            dy, dx = i * 8, j * 8
            berr, boy, box = np.inf, 0, 0
            for oy in range(-R, R):
                for ox in range(-R, R):
                    wy, wx = dy + oy, dx + ox
                    if not (0 <= wy <= H - 8 and 0 <= wx <= W - 8):
                        continue
                    d = T[i, j] - F[wy, wx]
                    e = float(np.dot(d, d)) + abs(oy) + abs(ox)
                    if e < berr:
                        berr, boy, box = e, oy, ox
            best[i, j] = (boy, box, berr)
    return best


@pytest.mark.parametrize("radius", [4, 8, 12])
def test_motion_matches_brute_force(radius):
    rng = np.random.RandomState(42)
    H, W = 40, 48
    prev = rng.randint(0, 256, (H, W, 3)).astype(np.float32)
    # cur = prev shifted by (3, -5) with noise, so real motion exists
    cur = np.roll(prev, (3, -5), axis=(0, 1)) + rng.randint(-2, 3, (H, W, 3))
    cur = np.clip(cur, 0, 255).astype(np.float32)

    oy, ox, err = motion.motion_search(jnp.asarray(cur), jnp.asarray(prev), radius)
    oy, ox, err = np.asarray(oy), np.asarray(ox), np.asarray(err)
    ref = _brute_force(cur, prev, radius)

    # offsets may differ on near-ties under the bf16 ranking expansion
    # (random noise frames are the worst case: candidates nearly equidistant)
    match = (oy == ref[..., 0]) & (ox == ref[..., 1])
    assert match.mean() >= 0.85, f"offsets agree only {match.mean():.2%}"
    # reported error must equal the exact distance at the returned offset
    H, W, _ = cur.shape
    th, tw = H // 8, W // 8
    F = np.asarray(motion.window_dct_field(jnp.asarray(prev, jnp.float32)))
    T = np.asarray(motion.tile_features_raster(
        jnp.asarray(cur, jnp.float32).reshape(th, 8, tw, 8, 3).swapaxes(1, 2)))
    for i in range(th):
        for j in range(tw):
            d = T[i, j] - F[i * 8 + oy[i, j], j * 8 + ox[i, j]]
            want = np.dot(d, d) + abs(oy[i, j]) + abs(ox[i, j])
            # rtol 2e-4: the conv-built field and the basis-matmul tile
            # features round the fp32 DCT at different points; their
            # squared distances agree to ~1e-4 relative, not to the ulp
            assert np.isclose(err[i, j], want, rtol=2e-4, atol=1e-2)
    # and the selected error can't beat the oracle's optimum meaningfully
    assert np.all(err >= ref[..., 2] * (1 - 2e-4) - 0.5)


def test_motion_finds_exact_shift():
    rng = np.random.RandomState(0)
    H, W = 64, 64
    prev = rng.randint(0, 256, (H, W, 3)).astype(np.float32)
    cur = np.roll(prev, (4, 7), axis=(0, 1))
    oy, ox, err = motion.motion_search(jnp.asarray(cur), jnp.asarray(prev), 16)
    oy, ox, err = np.asarray(oy), np.asarray(ox), np.asarray(err)
    # interior tiles (border tiles see rolled-over content)
    inner = np.s_[2:-2, 2:-2]
    assert np.all(oy[inner] == -4) and np.all(ox[inner] == -7)
    # perfect match: err = manhattan penalty = 11
    assert np.allclose(err[inner], 11.0, atol=0.5)


def test_motion_zero_shift_prefers_center():
    rng = np.random.RandomState(1)
    f = rng.randint(0, 256, (32, 32, 3)).astype(np.float32)
    oy, ox, err = motion.motion_search(jnp.asarray(f), jnp.asarray(f), 8)
    assert np.all(np.asarray(oy) == 0) and np.all(np.asarray(ox) == 0)
    assert np.allclose(np.asarray(err), 0.0, atol=1e-2)


def test_halo_blocked_rank_matches_unblocked():
    """The halo-blocked rank contraction (lax.map over row blocks,
    TILER_TPU_MOTION_BM) must select exactly the same vectors and errors
    as the unblocked full-stack formulation — it is a memory layout
    change, not an algorithm change."""
    import os
    import jax

    rng = np.random.RandomState(7)
    H, W = 96, 128
    prev = rng.randint(0, 256, (H, W, 3)).astype(np.float32)
    cur = np.roll(prev, (5, -7), (0, 1)) + rng.randint(0, 5, (H, W, 3))

    def run(bm):
        os.environ["TILER_TPU_MOTION_BM"] = bm
        try:
            # fresh trace per knob value (the env binds at trace time)
            f = jax.jit(lambda a, b: motion._motion_core(a, b, 16))
            return f(jnp.asarray(cur), jnp.asarray(prev))
        finally:
            os.environ.pop("TILER_TPU_MOTION_BM", None)

    hy, hx, herr = run("8")
    uy, ux, uerr = run("0")
    assert np.array_equal(np.asarray(hy), np.asarray(uy))
    assert np.array_equal(np.asarray(hx), np.asarray(ux))
    assert np.array_equal(np.asarray(herr), np.asarray(uerr))


def test_window_field_im2row_matches_passes():
    """The im2row/MXU field formulation (settings.motion_field="im2row")
    must reproduce the pass-A/pass-B block field up to f32
    contraction-order rounding, and the full motion search must pick
    identical winners on non-degenerate content."""
    import numpy as np
    import jax.numpy as jnp
    from tiler_tpu.pipeline.motion import (
        _window_field_blocks, _window_field_blocks_im2row, motion_search)

    rng = np.random.RandomState(7)
    H, W = 48, 64
    yy, xx = np.mgrid[0:H, 0:W]
    base = ((yy * 5 + xx * 3) % 256).astype(np.int32)
    frame = np.clip(base[..., None] + rng.randint(-25, 25, (H, W, 3)),
                    0, 255).astype(np.uint8)
    P, mh, mw = 16, (H - 7 + 2 * 16 + 7) // 8, (W - 7 + 2 * 16 + 7) // 8
    mu = jnp.asarray(rng.randn(192).astype(np.float32))
    Fa, Na = _window_field_blocks(jnp.asarray(frame), mu, P, mh, mw, 192)
    Fb, Nb = _window_field_blocks_im2row(jnp.asarray(frame), mu, P, mh, mw, 192)
    a, b = np.asarray(Fa, np.float32), np.asarray(Fb, np.float32)
    scale = max(1.0, np.abs(a).max())
    assert np.abs(a - b).max() / scale < 2e-2, "bf16-rounded field mismatch"
    na, nb = np.asarray(Na), np.asarray(Nb)
    fin = np.isfinite(na)
    assert (fin == np.isfinite(nb)).all()
    assert np.allclose(na[fin], nb[fin], rtol=3e-2)

    cur = np.roll(frame, (3, 5), (0, 1))
    oy0, ox0, e0 = motion_search(jnp.asarray(cur), jnp.asarray(frame), 8)
    oy1, ox1, e1 = motion_search(jnp.asarray(cur), jnp.asarray(frame), 8,
                                 field_impl="im2row")
    agree = np.mean((np.asarray(oy0) == np.asarray(oy1))
                    & (np.asarray(ox0) == np.asarray(ox1)))
    assert agree >= 0.95, agree  # near-ties only

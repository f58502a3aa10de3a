"""K-modes clustering over categorical (byte) vectors.

Capability parity with the reference's kmodes.pas (a nicodv/kmodes-style
implementation with farthest-point-first init and hand-rolled asm
matching-dissimilarity, kmodes.pas:72-1097). The reference keeps it in
`uses` but the current pipeline no longer calls it (legacy palette
clustering); it is provided here as a library utility.

Matching dissimilarity = Hamming distance over attributes; modes are
per-cluster per-attribute majority values.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def _matching_dist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[N, D] x [K, D] -> [N, K] Hamming distances."""
    return (a[:, None, :] != b[None, :, :]).sum(axis=2)


def init_farthest_first(x: np.ndarray, k: int, seed: int = 0) -> np.ndarray:
    """Farthest-point heuristic (cf. doc/Farthest-Point_Heuristic pdf,
    kmodes.pas:694): start from the densest point, then repeatedly take
    the point farthest (max-min) from the chosen set."""
    n, d = x.shape
    # density: sum of per-attribute frequency of each point's values
    freq_score = np.zeros(n, np.int64)
    for j in range(d):
        vals, inv, counts = np.unique(x[:, j], return_inverse=True, return_counts=True)
        freq_score += counts[inv]
    chosen = [int(np.argmax(freq_score))]
    min_d = _matching_dist(x, x[chosen])[:, 0]
    while len(chosen) < min(k, n):
        nxt = int(np.argmax(min_d))
        chosen.append(nxt)
        min_d = np.minimum(min_d, _matching_dist(x, x[[nxt]])[:, 0])
    return x[chosen].copy()


def kmodes(x: np.ndarray, k: int, max_iter: int = 100, seed: int = 0
           ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Returns (modes [k, D], labels [N], n_iter)."""
    x = np.asarray(x)
    n, d = x.shape
    k = min(k, n)
    modes = init_farthest_first(x, k, seed)
    labels = np.full(n, -1, np.int64)
    for it in range(max_iter):
        dist = _matching_dist(x, modes)
        new_labels = dist.argmin(axis=1)
        if np.array_equal(new_labels, labels):
            return modes, labels, it
        labels = new_labels
        for c in range(k):
            m = labels == c
            if not m.any():
                # re-seed empty cluster with the worst-fit point
                worst = int(np.argmax(dist[np.arange(n), labels]))
                modes[c] = x[worst]
                continue
            sub = x[m]
            for j in range(d):
                vals, counts = np.unique(sub[:, j], return_counts=True)
                modes[c, j] = vals[np.argmax(counts)]
    return modes, labels, max_iter

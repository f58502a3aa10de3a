"""Device mesh helpers.

The reference's only parallelism is a shared-memory thread pool
(SURVEY.md section 2.3). The TPU-native equivalent scales two axes:
  - "corpus": the global tile corpus (KNN dataset, k-means points) is
    sharded across chips; distance matmuls run locally and candidates are
    combined with all_gather/psum over ICI.
  - "data": frames / tilemap cells are data-parallel.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis_names: Sequence[str] = ("corpus",)) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if len(axis_names) == 1:
        arr = np.array(devs)
    else:
        # split n into a near-square grid for (data, corpus)
        d = int(np.floor(np.sqrt(n)))
        while n % d:
            d -= 1
        arr = np.array(devs).reshape(d, n // d)
    return Mesh(arr, axis_names)

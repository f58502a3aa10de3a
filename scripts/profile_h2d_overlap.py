#!/usr/bin/env python
"""Does the axon tunnel overlap h2d transfers with device compute?

The bench's load step is h2d-bound (44 MB of RGB at ~56 MB/s in the
r4 driver window = 0.78 s/16f synced), and the pipelined-ingest design
(pipeline/load.py) assumes transfers stream while queued compute runs.
The synced split says only ~0.3 s of the 3.3 s step total hides in the
3.0 s wall, so either the tunnel serializes h2d against compute, or the
dispatch order leaves the transfers behind a barrier.

Measures, on the live backend:
  A. h2d alone: dispatch 16 x 2.76 MB uint8 pieces, block.
  B. compute alone: a ~1.5 s chained matmul loop, block.
  C. overlap: dispatch compute FIRST, then the h2d pieces, block both.
  D. overlap, reversed dispatch order.

overlap_ratio = (A + B - C) / min(A, B): 1.0 = full overlap, 0 = serial.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, n=3):
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def pull(arrs):
    """axon's block_until_ready does NOT flush its lazy queue for h2d
    (a 44 MB asarray 'completes' in 0 ms; the cost appears at first
    use) — every timing must end in an actual d2h value read."""
    import jax.numpy as _jnp

    return sum(float(a.astype(_jnp.float32).sum()) for a in arrs)


def main():
    dev = jax.devices()[0]
    print("device:", dev)
    F, H, W = 16, 720, 1280
    host = [np.random.randint(0, 255, (H, W, 3), np.uint8) for _ in range(F)]

    @jax.jit
    def burn(x):
        def step(c, _):
            return c @ c * (1.0 / 2048.0) + 1e-3, None

        y, _ = jax.lax.scan(step, x, None, length=400)
        return y.sum()

    x0 = jnp.ones((2048, 2048), jnp.bfloat16)
    burn(x0).block_until_ready()  # compile

    def h2d():
        ps = [jnp.asarray(h) for h in host]
        pull(ps)

    def compute():
        float(burn(x0))

    a = bench(h2d)
    b = bench(compute)

    def overlap_cf():
        r = burn(x0)
        ps = [jnp.asarray(h) for h in host]
        pull(ps + [r])

    def overlap_hf():
        ps = [jnp.asarray(h) for h in host]
        r = burn(x0)
        pull(ps + [r])

    c = bench(overlap_cf)
    d = bench(overlap_hf)
    mb = F * H * W * 3 / 1e6
    print(f"h2d alone:      {a:.3f}s  ({mb/a:.0f} MB/s)")
    print(f"compute alone:  {b:.3f}s")
    print(f"compute-first:  {c:.3f}s  overlap_ratio={(a+b-c)/min(a,b):.2f}")
    print(f"h2d-first:      {d:.3f}s  overlap_ratio={(a+b-d)/min(a,b):.2f}")


if __name__ == "__main__":
    main()

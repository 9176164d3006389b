"""Resolve scores: event-sort vs XLA cube vs the pallas VMEM-tiled cube
(taxonomy/resolve.py _scores_pallas), on the real chip at bench shape.

Usage: python tools/resolve_pallas_exp.py [B [W [TB]]]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from krakenuniq_tpu.taxonomy import resolve as R

B = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
W = int(sys.argv[2]) if len(sys.argv) > 2 else 130
if len(sys.argv) > 3:
    R._SCORE_TB = int(sys.argv[3])
T = 40_000


def timeit(fn, *a, n=5):
    np.asarray(fn(*a))
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        r = fn(*a)
        np.asarray(r)
        best = min(best, time.time() - t0)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    tins = jnp.asarray(rng.integers(0, 2 * T, size=(B, W)).astype(np.int32))
    touts = jnp.asarray(
        np.minimum(np.asarray(tins) + rng.integers(1, T, size=(B, W)), 2 * T).astype(np.int32)
    )
    hit = jnp.asarray(rng.random((B, W)) < 0.75)

    f_sort = jax.jit(lambda a, b, h: jnp.sum(
        jnp.where(h, R._scores_sort(a, b, h), 0).astype(jnp.int64)))
    f_pall = jax.jit(lambda a, b, h: jnp.sum(
        jnp.where(h, R._scores_pallas(a, b, h), 0).astype(jnp.int64)))
    d1 = np.asarray(f_sort(tins, touts, hit))
    d2 = np.asarray(f_pall(tins, touts, hit))
    print(f"TB={R._SCORE_TB} digest sort={d1} pallas={d2} equal={bool(d1 == d2)}", flush=True)
    print(f"event-sort scores: {timeit(f_sort, tins, touts, hit):8.1f} ms", flush=True)
    print(f"pallas cube:       {timeit(f_pall, tins, touts, hit):8.1f} ms", flush=True)


if __name__ == "__main__":
    main()

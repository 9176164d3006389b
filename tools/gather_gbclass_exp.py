"""Extend the §2 gather cost model to the GB size class: per-row cost of
2/4/8-byte-row random gathers from a 1.07 GB table, plus the 67 MB
displacement-class control. Decides whether a one-slot 8B-row CHD layout
(one 2-u32 gather instead of one 4-u32) is worth a format change.

Usage: python tools/gather_gbclass_exp.py [n_queries_millions]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

NQ = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 8_520_000
ROWS_GB = 1 << 26  # x 16B = 1.07 GB at 4 u32
ROWS_DISP = 1 << 24  # x 4B u32 words = 67 MB


def timeit(fn, *a, n=5):
    np.asarray(fn(*a))
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        np.asarray(fn(*a))
        best = min(best, time.time() - t0)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    idx = jax.device_put(rng.integers(0, ROWS_GB, size=NQ).astype(np.int32))
    idx2 = jax.device_put(
        rng.integers(0, 2 * ROWS_GB, size=NQ).astype(np.int32)
    )
    t4 = jax.device_put(
        rng.integers(0, 2**32, size=(ROWS_GB, 4), dtype=np.uint64).astype(np.uint32)
    )

    @jax.jit
    def g4(t, i):
        r = jnp.take(t, i, axis=0)
        return jnp.sum(r[:, 0] ^ r[:, 3])

    @jax.jit
    def g2(t, i):
        r = jnp.take(t.reshape(2 * ROWS_GB, 2), i, axis=0)
        return jnp.sum(r[:, 0] ^ r[:, 1])

    ms4 = timeit(g4, t4, idx)
    print(f"1.07GB 4-u32 rows: {ms4:7.1f} ms  ({ms4*1e6/NQ:5.2f} ns/row)", flush=True)
    ms2 = timeit(g2, t4, idx2)
    print(f"1.07GB 2-u32 rows: {ms2:7.1f} ms  ({ms2*1e6/NQ:5.2f} ns/row)", flush=True)
    del t4

    t1 = jax.device_put(
        rng.integers(0, 2**32, size=(ROWS_DISP // 4, 4), dtype=np.uint64).astype(np.uint32)
    )
    idx3 = jax.device_put(rng.integers(0, ROWS_DISP // 4, size=NQ).astype(np.int32))

    @jax.jit
    def gd(t, i):
        r = jnp.take(t, i, axis=0)
        return jnp.sum(r[:, 0] ^ r[:, 2])

    msd = timeit(gd, t1, idx3)
    print(f"67MB 4-u32 rows:   {msd:7.1f} ms  ({msd*1e6/NQ:5.2f} ns/row)", flush=True)


if __name__ == "__main__":
    main()

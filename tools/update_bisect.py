"""Bisect the ~1s/step device-counter update at 8.5M lanes: which piece?

Usage: python tools/update_bisect.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp

B, W = 65536, 130
N = B * W
POOL = 504
P = 12
M = 1 << P


def timeit(fn, n=4):
    np.asarray(fn())
    t0 = time.time()
    for _ in range(n - 1):
        fn()
    np.asarray(fn())
    return (time.time() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    taxa = jax.device_put(rng.integers(0, POOL, size=N).astype(np.int32))
    enc = jax.device_put(
        rng.integers(0, 2**32, size=N, dtype=np.uint64).astype(np.uint32)
    )
    lanes = jax.device_put(rng.random(N) < 0.8)
    pool_rows = jnp.asarray(np.arange(POOL, dtype=np.int32))

    @jax.jit
    def bc_small(taxa, lanes):
        return jnp.bincount(jnp.where(lanes, taxa, POOL), length=POOL + 1)[:4]

    print(f"bincount 8.5M -> {POOL}:   {timeit(lambda: bc_small(taxa, lanes)):7.1f} ms", flush=True)

    @jax.jit
    def decode(enc):
        flagged = (enc & jnp.uint32(1)) == 1
        stored = ((enc >> jnp.uint32(1)) & jnp.uint32(0x3F)).astype(jnp.uint8)
        flag_rank = stored + jnp.uint8(25 - P)
        shifted = enc << jnp.uint32(P)
        clz = jnp.minimum(
            jnp.where(shifted == 0, jnp.uint32(32), jax.lax.clz(shifted).astype(jnp.uint32)),
            jnp.uint32(32 - P),
        )
        plain_rank = (clz + jnp.uint32(1)).astype(jnp.uint8)
        return jnp.sum(jnp.where(flagged, flag_rank, plain_rank))

    print(f"rank decode elementwise:  {timeit(lambda: decode(enc)):7.1f} ms", flush=True)

    @jax.jit
    def reg_sort(taxa, enc, lanes):
        idx = (enc >> jnp.uint32(32 - P)).astype(jnp.int32)
        rank = (enc & jnp.uint32(0x3F)).astype(jnp.uint8)  # stand-in
        slot64 = taxa.astype(jnp.uint64) * jnp.uint64(M) + idx.astype(jnp.uint64)
        comb = jnp.where(
            lanes,
            (slot64 << jnp.uint64(6)) | rank.astype(jnp.uint64),
            jnp.uint64(0xFFFFFFFFFFFFFFFF),
        )
        cs = jax.lax.sort(comb)
        grid = (
            pool_rows.astype(jnp.uint64)[:, None] * jnp.uint64(M)
            + jnp.arange(M, dtype=jnp.uint64)[None, :]
        ).reshape(-1)
        bounds = (grid + jnp.uint64(1)) << jnp.uint64(6)
        last = jnp.searchsorted(cs, bounds, side="left", method="sort").astype(jnp.int32) - 1
        got = jnp.take(cs, jnp.maximum(last, 0))
        ok = ((got >> jnp.uint64(6)) == grid) & (last >= 0)
        return jnp.sum(jnp.where(ok, got & jnp.uint64(0x3F), 0).astype(jnp.uint8))

    print(f"register sort+searchsorted: {timeit(lambda: reg_sort(taxa, enc, lanes)):5.1f} ms", flush=True)

    @jax.jit
    def reg_scatter(taxa, enc, lanes):
        idx = (enc >> jnp.uint32(32 - P)).astype(jnp.int32)
        rank = (enc & jnp.uint32(0x3F)).astype(jnp.uint8)
        flat = jnp.where(lanes, taxa * M + idx, POOL * M)
        reg = jnp.zeros(POOL * M + 1, jnp.uint8)
        reg = reg.at[flat].max(jnp.where(lanes, rank, jnp.uint8(0)))
        return jnp.sum(reg[: POOL * M])

    print(f"register scatter-max:     {timeit(lambda: reg_scatter(taxa, enc, lanes)):7.1f} ms", flush=True)

    @jax.jit
    def sort_only(taxa, enc, lanes):
        slot64 = taxa.astype(jnp.uint64) * jnp.uint64(M) + enc.astype(jnp.uint64)
        comb = jnp.where(lanes, slot64, jnp.uint64(0xFFFFFFFFFFFFFFFF))
        return jnp.sum(jax.lax.sort(comb))

    print(f"u64 sort alone:           {timeit(lambda: sort_only(taxa, enc, lanes)):7.1f} ms", flush=True)

    @jax.jit
    def ssorted_only(taxa, enc):
        cs = jax.lax.sort(taxa.astype(jnp.uint64) * jnp.uint64(M) + enc.astype(jnp.uint64))
        grid = (
            pool_rows.astype(jnp.uint64)[:, None] * jnp.uint64(M)
            + jnp.arange(M, dtype=jnp.uint64)[None, :]
        ).reshape(-1)
        last = jnp.searchsorted(cs, grid, side="left", method="sort")
        return jnp.sum(last)

    print(f"sort + searchsorted(2M):  {timeit(lambda: ssorted_only(taxa, enc)):7.1f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Gather mechanics on v5e: what does XLA's row-gather rate depend on?

Established (probe_emitter_exp3 results, recorded in BENCHNOTES.md): the
probe costs ~1.7ns PER GATHERED u32 ELEMENT regardless of producer fusion,
program splitting, or layout (A == B == S == 120ms for 8 u32/query at 8.5M
queries; single-row H = 58ms for 4 u32/query). This script measures the
levers that could beat it:

  I   u64-element gather of the same bytes (4 u64 vs 8 u32 per query)
  L0  fully-clustered indices (iota//8): locality upper bound
  L1  sorted real indices: achievable locality after a device sort
  K   lax.sort of the 8.5M u64 hashes alone (the sort-merge budget)
  M   tiny table (2^12 buckets, VMEM-scale) random gather
  N   gather 2 u32 per query ([nb*4] flat, one slot word)

Usage: python tools/probe_emitter_exp4.py [B]
"""

import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN = np.uint64(0x9E3779B97F4A7C15)

LB = 22
B = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
W = 130
NQ = B * W


def timeit(fn, *a, n=5):
    np.asarray(fn(*a))
    t0 = time.time()
    for _ in range(n - 1):
        fn(*a)
    np.asarray(fn(*a))
    return (time.time() - t0) / n * 1e3


def report(tag, ms, elems_per_q):
    ns_per_elem = ms * 1e6 / (NQ * elems_per_q) if elems_per_q else 0
    print(f"{tag:40s} {ms:8.2f} ms"
          + (f"  ({ns_per_elem:5.2f} ns/u32-elem)" if elems_per_q else ""),
          flush=True)


def main():
    rng = np.random.default_rng(0)
    fused = jax.device_put(
        rng.integers(0, 2**32, size=(1 << LB, 4), dtype=np.uint64).astype(np.uint32)
    )
    h = jax.device_put(rng.integers(0, 2**64, size=NQ, dtype=np.uint64))
    print(f"queries {NQ/1e6:.2f}M, table 2^{LB} buckets", flush=True)

    shift = np.uint64(64 - LB)

    @jax.jit
    def base_2rows(h):
        r1 = (h >> shift).astype(jnp.int32)
        r2 = ((h * GOLDEN) >> shift).astype(jnp.int32)
        return jnp.sum(jnp.take(fused, r1, axis=0)) + jnp.sum(jnp.take(fused, r2, axis=0))

    report("base: 2 rows x 4 u32", timeit(base_2rows, h), 8)

    fused64 = jax.device_put(
        rng.integers(0, 2**64, size=(1 << LB, 2), dtype=np.uint64)
    )

    @jax.jit
    def gather_u64(h):
        r1 = (h >> shift).astype(jnp.int32)
        r2 = ((h * GOLDEN) >> shift).astype(jnp.int32)
        return jnp.sum(jnp.take(fused64, r1, axis=0)) + jnp.sum(
            jnp.take(fused64, r2, axis=0)
        )

    report("I: 2 rows x 2 u64 (same bytes)", timeit(gather_u64, h), 8)

    idx_clustered = jax.device_put(
        (np.arange(NQ, dtype=np.int64) * (1 << LB) // NQ).astype(np.int32)
    )
    idx_random = jax.device_put(
        rng.integers(0, 1 << LB, size=NQ, dtype=np.int64).astype(np.int32)
    )

    @jax.jit
    def row_gather(idx):
        return jnp.sum(jnp.take(fused, idx, axis=0))

    report("1 row x 4 u32, random idx", timeit(row_gather, idx_random), 4)
    report("L0: 1 row x 4 u32, sequential idx", timeit(row_gather, idx_clustered), 4)

    @jax.jit
    def sort_idx(h):
        return jax.lax.sort((h >> shift).astype(jnp.int32))

    s_idx = np.asarray(jax.jit(lambda h: jnp.sum(sort_idx(h)))(h))  # warm
    report("K: lax.sort 8.5M i32 (bucket idx)", timeit(
        lambda h: jnp.sum(sort_idx(h)), h), 0)

    @jax.jit
    def sorted_gather(h):
        return jnp.sum(jnp.take(fused, sort_idx(h), axis=0))

    report("L1: sort + 1-row gather", timeit(sorted_gather, h), 4)

    @jax.jit
    def sort_u64(h):
        return jnp.sum(jax.lax.sort(h))

    report("K2: lax.sort 8.5M u64", timeit(sort_u64, h), 0)

    tiny = jax.device_put(
        rng.integers(0, 2**32, size=(1 << 12, 4), dtype=np.uint64).astype(np.uint32)
    )

    @jax.jit
    def tiny_gather(h):
        r1 = (h >> np.uint64(64 - 12)).astype(jnp.int32)
        return jnp.sum(jnp.take(tiny, r1, axis=0))

    report("M: 1 row x 4 u32, 2^12-bucket table", timeit(tiny_gather, h), 4)

    flat = jax.device_put(
        rng.integers(0, 2**32, size=((1 << LB) * 4,), dtype=np.uint64).astype(np.uint32)
    )

    @jax.jit
    def elem_gather2(h):
        r1 = ((h >> shift).astype(jnp.int32)) * 4
        return jnp.sum(jnp.take(flat, r1)) + jnp.sum(jnp.take(flat, r1 + 1))

    report("N: 2 single u32 elems", timeit(elem_gather2, h), 2)


if __name__ == "__main__":
    main()

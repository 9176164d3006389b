"""Experiment: can a sorted-query tile-scan beat XLA's flat random gather?

Idea: if queries are pre-sorted by bucket, the probe becomes a scan over
table TILES; each iteration dynamic-slices one tile (sequential HBM read,
roofline-fast) and gathers only that tile's queries from it. If XLA keeps
the sliced tile in VMEM for the in-loop gather, per-row cost should drop
toward the measured VMEM-resident gather rate (~3.1 ns/row) instead of the
big-table rate (~13 ns/row). Pieces timed separately so the sort/unsort
overhead is visible too.

Run on the real TPU: python tools/probe_tilescan_exp.py [n_queries] [lr]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, n=5):
    # np.asarray forces a real completion barrier; block_until_ready acks
    # early over the tunneled transport (BENCHNOTES §1)
    np.asarray(fn())
    t0 = time.time()
    for _ in range(n - 1):
        fn()
    np.asarray(fn())
    return (time.time() - t0) / n


def main():
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 8_519_680  # 65536*130
    lr = int(sys.argv[2]) if len(sys.argv) > 2 else 26
    nrows = 1 << lr
    rng = np.random.default_rng(0)
    table = rng.integers(0, 1 << 32, size=(nrows, 4), dtype=np.uint32)
    t_dev = jax.device_put(table)
    idx = rng.integers(0, nrows, size=nq, dtype=np.int32)
    idx_dev = jax.device_put(idx)
    h_dev = jax.device_put(rng.integers(0, 1 << 63, size=nq, dtype=np.uint64))

    # A: flat random row gather (the current probe's core op)
    @jax.jit
    def flat(t, i):
        return jnp.take(t, i, axis=0).sum(dtype=jnp.uint32)

    dt = timeit(lambda: flat(t_dev, idx_dev))
    print(f"A flat gather: {dt*1e3:.1f}ms ({dt/nq*1e9:.2f} ns/row)")

    # B: sort queries by row id (what a tile-scan needs). Outputs reduce
    # to a SCALAR so the barrier fetch does not pollute the timing (a full
    # 8.5M-array np.asarray adds its own D2H transfer time).
    @jax.jit
    def sortq(i):
        s = jax.lax.sort(i)
        return s[0] + s[-1] + s[nq // 2]

    dt_s = timeit(lambda: sortq(idx_dev))
    print(f"B sort i32 queries (scalar out): {dt_s*1e3:.1f}ms")

    @jax.jit
    def sort_u64_pair(h, i):
        hs, is_ = jax.lax.sort((h, i), num_keys=1)
        return hs[0] + hs[-1] + is_[nq // 2].astype(jnp.uint64)

    dt_sp = timeit(lambda: sort_u64_pair(h_dev, idx_dev))
    print(f"B2 sort u64 keys + i32 payload (scalar out): {dt_sp*1e3:.1f}ms")

    idx_sorted = np.sort(idx)
    idx_sorted_dev = jax.device_put(idx_sorted)
    dt2 = timeit(lambda: flat(t_dev, idx_sorted_dev))
    print(f"C flat gather, sorted indices: {dt2*1e3:.1f}ms")

    # D: tile scan -- MAXQ queries per tile, tile dynamic-sliced per step
    for tile_rows, maxq_mult in ((1 << 14, 3), (1 << 16, 3)):
        n_tiles = nrows // tile_rows
        maxq = int(nq / n_tiles * maxq_mult) // 128 * 128 + 128
        # host prep: counts per tile and padded per-tile query offsets
        tile_of = idx_sorted >> int(np.log2(tile_rows))
        starts = np.searchsorted(tile_of, np.arange(n_tiles + 1)).astype(np.int32)
        counts = np.diff(starts)
        if counts.max() > maxq:
            print(f"D tile={tile_rows}: skipped (max tile load {counts.max()} > {maxq})")
            continue
        starts_dev = jax.device_put(starts[:-1])
        counts_dev = jax.device_put(counts.astype(np.int32))
        qpad = jax.device_put(
            np.concatenate([idx_sorted, np.zeros(maxq, np.int32)])
        )

        @jax.jit
        def tile_scan(t, q, st, ct):
            def body(acc, args):
                s, c, ti = args
                tile = jax.lax.dynamic_slice(
                    t, (ti * tile_rows, 0), (tile_rows, 4)
                )
                qt = jax.lax.dynamic_slice(q, (s,), (maxq,))
                local = qt - ti * tile_rows
                rows = jnp.take(tile, jnp.clip(local, 0, tile_rows - 1), axis=0)
                mask = jnp.arange(maxq, dtype=jnp.int32) < c
                return acc + jnp.where(mask, rows[:, 0], 0).sum(dtype=jnp.uint32), None

            acc, _ = jax.lax.scan(
                body,
                jnp.uint32(0),
                (st, ct, jnp.arange(n_tiles, dtype=jnp.int32)),
            )
            return acc

        dt3 = timeit(lambda: tile_scan(t_dev, qpad, starts_dev, counts_dev), n=3)
        print(
            f"D tile scan ({n_tiles} tiles x {tile_rows} rows, maxq={maxq}): "
            f"{dt3*1e3:.1f}ms ({dt3/nq*1e9:.2f} ns/row incl. masked lanes "
            f"x{maxq*n_tiles/nq:.2f})"
        )


if __name__ == "__main__":
    main()

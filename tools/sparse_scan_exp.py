"""Sparse-stats scan-pass cost: round-3 formulation vs the round-4 rewrite
(classify/sparse_exact.py). The r3 core spent ~10 full-lane scan passes
(mostly i64); the rewrite drops the two per-pair scans (sort stability makes
pair max-pos and singleton free at pair-end lanes) and moves d_sofar and the
reverse broadcast to i32 packing. Scalar-reduced outputs + np.asarray give a
true completion barrier (BENCHNOTES.md §13).

Usage: python tools/sparse_scan_exp.py [B [W]]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from krakenuniq_tpu.classify.sparse_exact import (
    sparse_stats_core,
    _seg_cummax,
    _seg_cumsum,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
W = int(sys.argv[2]) if len(sys.argv) > 2 else 130
P = 12
CAP = 1 << 21
_PAD = jnp.uint64(0xFFFFFFFFFFFFFFFF)


def r3_core(taxa_dense, enc, hll_lanes, unit_id, p, cap):
    """The round-3 formulation, verbatim semantics (all-i64 scans, two
    per-pair segmented scans)."""
    th = (1 << p) // 4
    b, w = taxa_dense.shape
    n = b * w

    def seg_cumsum64(reset, vals):
        s = jnp.cumsum(vals)
        start = jax.lax.cummax(jnp.where(reset, s - vals, jnp.int64(-1)))
        return s - start

    def seg_cummax64(reset, vals, val_bits):
        seg = jnp.cumsum(reset.astype(jnp.int64))
        packed = (seg << jnp.int64(val_bits)) | (vals + jnp.int64(1))
        m = jax.lax.cummax(packed)
        return (m & jnp.int64((1 << val_bits) - 1)) - jnp.int64(1)

    unit = unit_id.astype(jnp.uint64)[:, None]
    key = (
        (unit << jnp.uint64(32 + 25))
        | (taxa_dense.astype(jnp.uint64) << jnp.uint64(32))
        | enc.astype(jnp.uint64)
    )
    keyf = jnp.where(hll_lanes, key, _PAD).reshape(-1)
    pos = jnp.arange(n, dtype=jnp.int64)
    ks, ps = jax.lax.sort((keyf, pos), num_keys=1)
    valid = ks != _PAD
    gk = ks >> jnp.uint64(32)
    one = jnp.ones((1,), bool)
    pb = jnp.concatenate([one, ks[1:] != ks[:-1]]) & valid
    gb = jnp.concatenate([one, gk[1:] != gk[:-1]]) & valid
    pe = jnp.concatenate([ks[1:] != ks[:-1], one]) & valid
    ge = jnp.concatenate([gk[1:] != gk[:-1], one]) & valid
    pos_bits = max(2, int(n - 1).bit_length() + 2)
    pair_maxpos = seg_cummax64(pb, ps, pos_bits)
    pair_cnt = seg_cumsum64(pb, jnp.ones(n, jnp.int64))
    v_pair = jnp.where(
        pe, (pair_maxpos << jnp.int64(1)) | (pair_cnt == 1), jnp.int64(-1)
    )
    edge_v = seg_cummax64(gb, v_pair, pos_bits + 1)
    d_sofar = seg_cumsum64(gb, pb.astype(jnp.int64))
    stays_end = (d_sofar < th) | ((d_sofar == th) & ((edge_v & jnp.int64(1)) == 1))
    stays_rev = seg_cummax64(jnp.flip(ge), jnp.flip(ge & stays_end).astype(jnp.int64), 2)
    stays_lane = jnp.flip(stays_rev) > 0
    emit_pair = pb & stays_lane
    emit_event = ge & ~stays_lane & valid
    taxon_of = gk & jnp.uint64((1 << 25) - 1)
    unit_of = gk >> jnp.uint64(25)
    event_key = jnp.uint64(1 << 63) | (unit_of << jnp.uint64(25)) | taxon_of
    out_key = jnp.where(emit_pair, ks, jnp.where(emit_event, event_key, _PAD))
    packed = jax.lax.sort(out_key)[:cap]
    return packed, jnp.sum(emit_pair).astype(jnp.int32), jnp.sum(emit_event).astype(jnp.int32)


def timeit(fn, *a, n=5):
    np.asarray(jax.tree.leaves(fn(*a))[0])
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        r = fn(*a)
        np.asarray(jax.tree.leaves(r)[0])
        best = min(best, time.time() - t0)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    n = B * W
    print(f"B={B} W={W} -> {n/1e6:.2f}M lanes", flush=True)
    # zipf-ish taxon ids so group/pair structure resembles the bench workload
    taxa = jnp.asarray(
        (rng.zipf(1.5, size=(B, W)) % 400).astype(np.int32)
    )
    enc = jnp.asarray(rng.integers(0, 1 << 32, size=(B, W), dtype=np.uint64).astype(np.uint32))
    lanes = jnp.asarray(rng.random((B, W)) < 0.8)
    unit = jnp.asarray((rng.integers(0, 16, size=B)).astype(np.uint8))
    unit = jnp.sort(unit)

    def scalar(core):
        def f(t, e, l, u):
            buf, n_p, n_e = core(t, e, l, u, P, CAP)
            return jnp.sum(buf) + n_p.astype(jnp.uint64) + n_e.astype(jnp.uint64)
        return jax.jit(f)

    f_r3 = scalar(r3_core)
    f_r4 = scalar(sparse_stats_core)
    a = (taxa, enc, lanes, unit)
    # agreement check first (scalar digests must match exactly)
    d3 = np.asarray(f_r3(*a))
    d4 = np.asarray(f_r4(*a))
    print(f"digest r3={d3} r4={d4} equal={bool(d3 == d4)}", flush=True)
    print(f"r3 core: {timeit(f_r3, *a):8.1f} ms", flush=True)
    print(f"r4 core: {timeit(f_r4, *a):8.1f} ms", flush=True)

    # component costs at the same shape
    key = jnp.asarray(rng.integers(0, 1 << 62, size=n, dtype=np.uint64))

    @jax.jit
    def sort_u64_i32(k):
        ks, ps = jax.lax.sort((k, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
        return ks[0] + ps[0].astype(jnp.uint64)

    @jax.jit
    def sort_u64_i64(k):
        ks, ps = jax.lax.sort((k, jnp.arange(n, dtype=jnp.int64)), num_keys=1)
        return ks[0] + ps[0].astype(jnp.uint64)

    @jax.jit
    def sort_u64(k):
        return jax.lax.sort(k)[0]

    @jax.jit
    def scan_i64(k):
        v = k.astype(jnp.int64)
        return jax.lax.cummax(v)[-1] + jnp.cumsum(v)[-1]

    @jax.jit
    def scan_i32(k):
        v = (k & jnp.uint64(0xFFFF)).astype(jnp.int32)
        return jax.lax.cummax(v)[-1] + jnp.cumsum(v)[-1]

    print(f"sort u64+i32 payload: {timeit(sort_u64_i32, key):8.1f} ms", flush=True)
    print(f"sort u64+i64 payload: {timeit(sort_u64_i64, key):8.1f} ms", flush=True)
    print(f"sort u64 alone:       {timeit(sort_u64, key):8.1f} ms", flush=True)
    print(f"cummax+cumsum i64:    {timeit(scan_i64, key):8.1f} ms (2 passes)", flush=True)
    print(f"cummax+cumsum i32:    {timeit(scan_i32, key):8.1f} ms (2 passes)", flush=True)


if __name__ == "__main__":
    main()

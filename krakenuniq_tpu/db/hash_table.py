"""Bucketed open-addressing hash table for the device k-mer lookup.

Motivation (measured on TPU v5e): XLA's gather engine costs ~the same per
INDEX regardless of how many contiguous elements each index fetches, so a
lookup that touches one 128-byte bucket row per query is ~12x cheaper than a
12-step binary search. Layout:

  table: uint64 [n_buckets, 16]
    columns 0..7   bucket keys (canonical k-mers; EMPTY = all-ones sentinel)
    columns 8..15  packed values: vals_dense << 32 | val (original taxid)

Keys are placed by bucket = murmur3_finalizer(key) >> (64 - lb) -- the same
bit mixer the HLL path already computes, so the device derives bucket ids
for free. Collision policy: overflowing keys spill into the NEXT bucket;
the build grows the table until no chain exceeds 2 buckets, so the device
lookup needs at most two row fetches (the second only when the first bucket
is full).
"""

from __future__ import annotations

import numpy as np

from ..utils.bits import murmur3_finalizer

EMPTY_KEY = np.uint64(0xFFFFFFFFFFFFFFFF)
BUCKET_SLOTS = 8


def build_hash_table(
    keys: np.ndarray,
    vals: np.ndarray,
    vals_dense: np.ndarray,
    load_factor: float = 0.4,
):
    """Returns (table uint64 [n_buckets, 16], lb) with max probe chain 2."""
    n = len(keys)
    lb = max(4, int(np.ceil(np.log2(max(n, 1) / (BUCKET_SLOTS * load_factor)))))
    h = murmur3_finalizer(keys)
    packed = (np.asarray(vals_dense, dtype=np.uint64) << np.uint64(32)) | np.asarray(
        vals, dtype=np.uint64
    )
    while True:
        nb = 1 << lb
        buckets = (h >> np.uint64(64 - lb)).astype(np.int64)
        order = np.argsort(buckets, kind="stable")
        sb = buckets[order]
        counts = np.bincount(sb, minlength=nb)
        # rank within own bucket
        start_of = np.concatenate([[0], np.cumsum(counts)])
        rank = np.arange(n, dtype=np.int64) - start_of[sb]
        # slots 0..7 stay in own bucket; 8..15 spill to the next bucket's free
        # slots -- valid only if (own overflow + next bucket's own count) <= 8
        over = counts - BUCKET_SLOTS
        spill_into_next = np.maximum(over, 0)
        next_load = counts + np.roll(spill_into_next, 1)
        if np.max(counts) <= 2 * BUCKET_SLOTS and np.max(next_load) <= BUCKET_SLOTS:
            break
        lb += 1

    table = np.empty((nb, 2 * BUCKET_SLOTS), dtype=np.uint64)
    table[:, :BUCKET_SLOTS] = EMPTY_KEY
    table[:, BUCKET_SLOTS:] = 0

    in_own = rank < BUCKET_SLOTS
    own_rows = sb[in_own]
    own_cols = rank[in_own]
    table[own_rows, own_cols] = keys[order][in_own]
    table[own_rows, BUCKET_SLOTS + own_cols] = packed[order][in_own]

    spilled = ~in_own
    if spilled.any():
        sp_rows = (sb[spilled] + 1) % nb
        # next bucket's own occupancy determines where spills start
        base = counts[(sb[spilled] + 1) % nb]
        # order spills within their target: rank - 8 within source bucket
        sp_cols = base + (rank[spilled] - BUCKET_SLOTS)
        if np.any(sp_cols >= BUCKET_SLOTS):
            raise AssertionError("hash build invariant violated")
        table[sp_rows, sp_cols] = keys[order][spilled]
        table[sp_rows, BUCKET_SLOTS + sp_cols] = packed[order][spilled]
    return table, lb

"""Bucketed two-choice hash table for the device k-mer lookup.

Motivation (measured on TPU v5e): XLA's gather engine costs ~the same per
INDEX regardless of how many contiguous elements each index fetches, so a
lookup that touches one 128-byte bucket row per query is ~12x cheaper than a
12-step binary search. Layout:

  table: uint64 [n_buckets, 16]
    columns 0..7   bucket keys (canonical k-mers; EMPTY = all-ones sentinel)
    columns 8..15  packed values: vals_dense << 32 | val (original taxid)

Every key has two candidate buckets derived from murmur3_finalizer(key)
(the same bit mixer the HLL path computes anyway):
    b1 = h >> (64 - lb)        b2 = (h * GOLDEN) >> (64 - lb)
Two-choice placement keeps the max bucket load near the average, so 8-slot
buckets at ~0.5 load essentially never overflow; the build rebalances
overfull buckets by flipping keys to their alternate bucket and grows the
table in the (rare) case that fails. The device lookup always probes both
buckets: two row fetches per query batch, independent of database size.
"""

from __future__ import annotations

import numpy as np

from ..utils.bits import murmur3_finalizer

EMPTY_KEY = np.uint64(0xFFFFFFFFFFFFFFFF)
BUCKET_SLOTS = 8
GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def bucket_ids(h: np.ndarray, lb: int):
    shift = np.uint64(64 - lb)
    return (h >> shift).astype(np.int64), ((h * GOLDEN) >> shift).astype(np.int64)


def build_hash_table(
    keys: np.ndarray,
    vals: np.ndarray,
    vals_dense: np.ndarray,
    load_factor: float = 0.5,
    max_iters: int = 16,
):
    """Returns (table uint64 [n_buckets, 16], lb)."""
    n = len(keys)
    keys = np.asarray(keys, dtype=np.uint64)
    h = murmur3_finalizer(keys)
    packed = (np.asarray(vals_dense, dtype=np.uint64) << np.uint64(32)) | np.asarray(
        vals, dtype=np.uint64
    )
    lb = max(4, int(np.ceil(np.log2(max(n, 1) / (BUCKET_SLOTS * load_factor)))))
    while True:
        b1, b2 = bucket_ids(h, lb)
        nb = 1 << lb
        assign = b1.copy()
        ok = False
        for _ in range(max_iters):
            order = np.argsort(assign, kind="stable")
            sa = assign[order]
            counts = np.bincount(sa, minlength=nb)
            start_of = np.concatenate([[0], np.cumsum(counts)])
            rank = np.arange(n, dtype=np.int64) - start_of[sa]
            over = rank >= BUCKET_SLOTS
            if not over.any():
                ok = True
                break
            flip = order[over]
            assign[flip] = np.where(assign[flip] == b1[flip], b2[flip], b1[flip])
        if ok:
            break
        lb += 1

    table = np.empty((nb, 2 * BUCKET_SLOTS), dtype=np.uint64)
    table[:, :BUCKET_SLOTS] = EMPTY_KEY
    table[:, BUCKET_SLOTS:] = 0
    rows = sa
    cols = rank
    table[rows, cols] = keys[order]
    table[rows, BUCKET_SLOTS + cols] = packed[order]
    return table, lb

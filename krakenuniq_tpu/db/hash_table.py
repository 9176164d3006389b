"""Bucketed two-choice hash table for the device k-mer lookup.

Motivation (measured on TPU v5e): XLA's row-gather has a fast path when the
gathered row is at most 4 elements wide (~4 ns/row for a 4 x uint64 row) and
a ~3x cliff above that, with cost per INDEX nearly independent of total
bytes. The table is therefore stored as two narrow planes of 4-slot buckets:

  tags: uint64 [n_buckets, 4]   murmur3_finalizer(key) per slot
  vals: uint64 [n_buckets, 4]   vals_dense << 32 | val (original taxid)

The murmur3 finalizer is a BIJECTION on uint64, so storing the mixed hash
instead of the key loses nothing: tag equality <=> key equality. Empty slots
hold tag 0 / value 0, which is exact without a reserved sentinel: a query
whose hash collides with an empty tag reads value 0, i.e. taxon 0 --
indistinguishable from a database miss, which is also how the reference
treats stored zero values (classify.cpp:939 counts them under taxon 0).

Every key has two candidate buckets derived from h = murmur3_finalizer(key)
(the same bit mixer the HLL path computes anyway):
    b1 = h >> (64 - lb)        b2 = (h * GOLDEN) >> (64 - lb)
Two-choice placement keeps the max bucket load near the average; the build
rebalances overfull buckets by flipping keys to their alternate bucket and
grows the table in the (rare) case that fails.

The build itself runs ON DEVICE (sort + scan + scatter): constructing the
table for millions of keys takes tens of milliseconds, where the same
algorithm in host numpy takes minutes on a weak host. The device lookup
probes both candidate buckets' tags and then fetches ONE value row: three
narrow row-gathers per query batch, independent of database size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.bits import murmur3_finalizer

BUCKET_SLOTS = 4
EMPTY_TAG = np.uint64(0)
GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def bucket_ids(h, lb: int):
    """Host/device-agnostic candidate bucket ids."""
    shift = np.uint64(64 - lb)
    return (h >> shift).astype(np.int64), ((h * GOLDEN) >> shift).astype(np.int64)


@functools.partial(jax.jit, static_argnames=("lb", "iters"))
def _build_attempt(hashes: jax.Array, packed: jax.Array, lb: int, iters: int = 3):
    """One placement attempt at a given table size; returns
    (tags, vals, overflow_count)."""
    n = hashes.shape[0]
    nb = 1 << lb
    shift = jnp.uint64(64 - lb)
    b1 = (hashes >> shift).astype(jnp.int32)
    b2 = ((hashes * GOLDEN) >> shift).astype(jnp.int32)
    assign = b1
    iota = jnp.arange(n, dtype=jnp.int32)

    def group_rank(sa):
        # sa sorted ascending; rank within equal-value group via a cummax of
        # group-start positions (lax.cummax is a single primitive -- an
        # associative_scan here costs minutes of compile time on remote
        # transports)
        is_start = jnp.concatenate([jnp.ones(1, bool), sa[1:] != sa[:-1]])
        start_idx = jax.lax.cummax(jnp.where(is_start, iota, -1))
        return iota - start_idx

    # a key whose hash IS the empty tag (0) must stay in its first-choice
    # bucket: a query for it matches bucket 1's empty slots, so the value
    # must be found there (empty slots contribute 0 to the selected sum)
    pinned = hashes == EMPTY_TAG

    order = rank = sa = None
    for _ in range(iters):
        order = jnp.argsort(assign, stable=True)
        sa = jnp.take(assign, order)
        rank = group_rank(sa)
        over = rank >= BUCKET_SLOTS
        alt = jnp.take(b1 + b2, order) - sa
        new_sorted_assign = jnp.where(
            over & ~jnp.take(pinned, order), alt, sa
        )
        assign = jnp.zeros_like(assign).at[order].set(new_sorted_assign)

    order = jnp.argsort(assign, stable=True)
    sa = jnp.take(assign, order)
    rank = group_rank(sa)
    overflow = jnp.sum((rank >= BUCKET_SLOTS).astype(jnp.int32))

    rows = sa.astype(jnp.int64)
    cols = jnp.minimum(rank, BUCKET_SLOTS - 1).astype(jnp.int64)
    flat_idx = rows * BUCKET_SLOTS + cols
    tags = jnp.zeros(nb * BUCKET_SLOTS, jnp.uint64).at[flat_idx].set(
        jnp.take(hashes, order)
    )
    vals = jnp.zeros(nb * BUCKET_SLOTS, jnp.uint64).at[flat_idx].set(
        jnp.take(packed, order)
    )
    return (
        tags.reshape(nb, BUCKET_SLOTS),
        vals.reshape(nb, BUCKET_SLOTS),
        overflow,
    )


def build_hash_table(
    keys: np.ndarray,
    vals: np.ndarray,
    vals_dense: np.ndarray,
    load_factor: float = 0.5,
):
    """Returns ((tags, vals) DEVICE arrays uint64 [n_buckets, 4], lb)."""
    n = len(keys)
    hashes = murmur3_finalizer(np.ascontiguousarray(keys, dtype=np.uint64))
    dhashes = jax.device_put(hashes)
    packed = (np.asarray(vals_dense, dtype=np.uint64) << np.uint64(32)) | np.asarray(
        vals, dtype=np.uint64
    )
    dpacked = jax.device_put(packed)
    lb = max(4, int(np.ceil(np.log2(max(n, 1) / (BUCKET_SLOTS * load_factor)))))
    while True:
        tags, tvals, overflow = _build_attempt(dhashes, dpacked, lb)
        if int(overflow) == 0:
            return (tags, tvals), lb
        lb += 1

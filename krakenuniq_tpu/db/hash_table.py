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


def _group_rank(sa, iota):
    """Rank within equal-value groups of a sorted array, via a cummax of
    group-start positions (lax.cummax is a single primitive -- an
    associative_scan here costs minutes of compile time on remote
    transports)."""
    is_start = jnp.concatenate([jnp.ones(1, bool), sa[1:] != sa[:-1]])
    start_idx = jax.lax.cummax(jnp.where(is_start, iota, -1))
    return iota - start_idx


@functools.partial(jax.jit, static_argnames=("lb",), donate_argnums=(0,))
def _rebalance_iter(assign, hashes, lb: int, it):
    """One two-choice rebalance sweep: flip a hash-selected half of each
    overfull bucket's excess keys to their alternate bucket.

    Two sources of randomness make this a converging random walk instead of
    a deadlock: (1) the flip coin (a rotating hash bit) breaks the livelock
    where two buckets bounce the same keys forever, and (2) the per-sweep
    intra-bucket priority reshuffle means no key holds a slot permanently --
    without it, a cycle of buckets saturated by never-moving rank<4 keys is
    a permanent deadlock (observed: ~600 keys stuck at 4.8M keys, lb=22)."""
    n = assign.shape[0]
    shift = jnp.uint64(64 - lb)
    b1 = (hashes >> shift).astype(jnp.int32)
    b2 = ((hashes * GOLDEN) >> shift).astype(jnp.int32)
    # a key whose hash IS the empty tag (0) must stay in its first-choice
    # bucket: a query for it matches bucket 1's empty slots, so the value
    # must be found there (empty slots contribute 0 to the selected sum)
    pinned = hashes == EMPTY_TAG
    iota = jnp.arange(n, dtype=jnp.int32)
    rot = (it % 53).astype(jnp.uint64)
    scram = ((hashes >> rot) ^ hashes).astype(jnp.uint32)
    sa, _, perm = jax.lax.sort((assign, scram, iota), num_keys=2)
    rank = _group_rank(sa, iota)
    over = rank >= BUCKET_SLOTS
    overflow = jnp.sum(over.astype(jnp.int32))
    coin = (
        (jnp.take(hashes, perm) >> (it % 61).astype(jnp.uint64)) & jnp.uint64(1)
    ) == 1
    flip = over & ~jnp.take(pinned, perm) & coin
    alt = jnp.take(b1 + b2, perm) - sa
    new_sorted = jnp.where(flip, alt, sa)
    new_assign = jnp.zeros_like(assign).at[perm].set(new_sorted)
    return new_assign, overflow


@functools.partial(jax.jit, static_argnames=("lb",))
def _finalize_table(assign, hashes, packed, lb: int):
    n = hashes.shape[0]
    nb = 1 << lb
    iota = jnp.arange(n, dtype=jnp.int32)
    order = jnp.argsort(assign, stable=True)
    sa = jnp.take(assign, order)
    rank = _group_rank(sa, iota)
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
    return tags.reshape(nb, BUCKET_SLOTS), vals.reshape(nb, BUCKET_SLOTS), overflow


def _build_attempt(hashes, packed, lb: int, max_iters: int = 48):
    """Placement attempt at a fixed table size via an iterated two-choice
    random walk; returns (tags, vals, overflow_count)."""
    shift = np.uint64(64 - lb)
    assign = (np.asarray(hashes) >> shift).astype(np.int32)
    assign = jax.device_put(assign)
    it = 0
    while it < max_iters:
        assign, overflow = _rebalance_iter(assign, hashes, lb, jnp.int32(it))
        it += 1
        if it >= 4 and int(overflow) == 0:
            break
    return _finalize_table(assign, hashes, packed, lb)


def build_hash_table(
    keys: np.ndarray,
    vals: np.ndarray,
    vals_dense: np.ndarray,
    load_factor: float = 0.5,
):
    """Returns ((tags, vals) DEVICE arrays uint64 [n_buckets, 4], lb).

    load_factor = keys / slots; two-choice 4-slot buckets place reliably at
    0.5 within a few dozen sweeps. If placement fails the table is grown
    (at most twice) before giving up."""
    n = len(keys)
    hashes = murmur3_finalizer(np.ascontiguousarray(keys, dtype=np.uint64))
    dhashes = jax.device_put(hashes)
    packed = (np.asarray(vals_dense, dtype=np.uint64) << np.uint64(32)) | np.asarray(
        vals, dtype=np.uint64
    )
    dpacked = jax.device_put(packed)
    lb = max(4, int(np.ceil(np.log2(max(n, 1) / (BUCKET_SLOTS * load_factor)))))
    for _ in range(3):
        tags, tvals, overflow = _build_attempt(dhashes, dpacked, lb)
        if int(overflow) == 0:
            return (tags, tvals), lb
        lb += 1
    raise RuntimeError(
        f"hash table placement failed for {n} keys even at 2^{lb - 1} buckets"
    )

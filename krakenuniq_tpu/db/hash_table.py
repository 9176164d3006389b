"""Bucketed two-choice hash table for the device k-mer lookup.

Motivation (measured on TPU v5e): XLA's row-gather cost is ~linear in the
row BYTES fetched (~0.37 ns/B, ~6 ns for a 16B row) and only weakly in the
index count, so the layout minimizes bytes touched per query. The table is
two u32 planes probed in two levels:

  ptags:   uint32 [n_buckets, 4]   partial tag per slot (screen)
  confirm: uint32 [n_buckets * 4, 4]  (hash_lo, hash_hi, taxid, dense) per slot

A query gathers its two candidate buckets' ptag rows (2 x 16B), picks the
first matching slot, then gathers that slot's confirm row (16B) and accepts
only on a full 64-bit hash match -- 48B/query, 2.7x fewer than a
4-slot-u64-planes design and ~3x faster end to end.

Keys are addressed by h = murmur3_finalizer(key) (a BIJECTION on uint64, so
storing/comparing mixed hashes loses nothing; the HLL path computes the same
h anyway). Every key has two candidate buckets
    b1 = h >> (64 - lb)        b2 = (h * GOLDEN) >> (64 - lb)
and its stored partial tag is bits [lb, lb+32) of h (if placed in b1) or of
h * GOLDEN (if placed in b2) -- the bits just below the bucket index of the
respective probe value, so a probe compares like against like. Two-choice
placement keeps the max bucket load near the average; the build rebalances
overfull buckets by flipping keys to their alternate bucket and grows the
table in the (rare) case that fails.

Exactness: the confirm step makes false positives impossible -- a query
returns a value only when the full 64-bit hash matches. False NEGATIVES
(the screen picking a decoy slot whose partial tag collides, hiding the
real slot behind it) are possible in principle with ~2^-32 probability per
resident key; `build_hash_table` therefore runs a self-validation lookup of
every key after placement and rebuilds at a larger size in the
(astronomically rare) failure case. Keys whose partial tag is 0 are pinned
to their first-choice bucket so they are found ahead of empty slots (which
read as ptag 0 / confirm zeros; a zero confirm row rejects every query
except h == 0, for which it correctly reports taxon 0 = miss).

The build itself runs ON DEVICE (sort + scan + scatter): constructing the
table for millions of keys takes tens of milliseconds, where the same
algorithm in host numpy takes minutes on a weak host.
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


def partial_tags(h, lb: int):
    """Bits [lb, lb+32) of the probe value: the screen tag for a bucket
    derived from h's top lb bits."""
    return ((h << np.uint64(lb)) >> np.uint64(32)).astype(jnp.uint32)


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
    # a key whose first-choice partial tag is 0 must stay in its first-choice
    # bucket: empty slots also read as ptag 0, and the screen must find the
    # real slot (keys pack before empties) rather than fail over to bucket 2
    pinned = partial_tags(hashes, lb) == 0
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
    """Scatter placed keys into the (ptags, confirm) planes."""
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

    h_s = jnp.take(hashes, order)
    p_s = jnp.take(packed, order)
    b1_s = (h_s >> jnp.uint64(64 - lb)).astype(jnp.int64)
    # stored tag matches the probe value of the choice that placed the key
    hc = jnp.where(rows == b1_s, h_s, h_s * GOLDEN)
    ptag_s = partial_tags(hc, lb)

    ptags = jnp.zeros(nb * BUCKET_SLOTS, jnp.uint32).at[flat_idx].set(ptag_s)
    mask32 = jnp.uint64(0xFFFFFFFF)
    # one whole-row scatter: chained per-column .at[].set on a multi-GB plane
    # materializes a copy per column (observed 16.9GB peak at 48M keys where
    # the table itself is 2.1GB)
    rows4 = jnp.stack(
        [
            (h_s & mask32).astype(jnp.uint32),
            (h_s >> jnp.uint64(32)).astype(jnp.uint32),
            (p_s & mask32).astype(jnp.uint32),
            (p_s >> jnp.uint64(32)).astype(jnp.uint32),
        ],
        axis=1,
    )
    confirm = jnp.zeros((nb * BUCKET_SLOTS, 4), jnp.uint32).at[flat_idx].set(rows4)
    return ptags.reshape(nb, BUCKET_SLOTS), confirm, overflow


@functools.partial(jax.jit, static_argnames=("lb",))
def _self_check(ptags, confirm, hashes, packed, lb: int):
    """Count keys the probe fails to find (must be 0 for an exact table)."""
    from ..lookup.hash_lookup import probe_values

    got = probe_values(ptags, confirm, hashes, lb)
    return jnp.sum((got != packed).astype(jnp.int32))


def _build_attempt(hashes, packed, lb: int, max_iters: int = 48):
    """Placement attempt at a fixed table size via an iterated two-choice
    random walk; returns (ptags, confirm, overflow_count)."""
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
    force_lb: int | None = None,
):
    """Returns ((ptags, confirm) DEVICE planes, lb); see module docstring.

    load_factor = keys / slots; two-choice 4-slot buckets place reliably at
    0.5 within a few dozen sweeps. If placement or the exactness
    self-validation fails, the table is grown (at most twice) before giving
    up. force_lb pins the size (used to stack uniformly-sized shard tables)."""
    n = len(keys)
    hashes = murmur3_finalizer(np.ascontiguousarray(keys, dtype=np.uint64))
    dhashes = jax.device_put(hashes)
    packed = (np.asarray(vals_dense, dtype=np.uint64) << np.uint64(32)) | np.asarray(
        vals, dtype=np.uint64
    )
    dpacked = jax.device_put(packed)
    if force_lb is not None:
        lb = force_lb
        attempts = 1
    else:
        lb = max(4, int(np.ceil(np.log2(max(n, 1) / (BUCKET_SLOTS * load_factor)))))
        attempts = 3
    if lb > 29:
        # flat confirm index must fit int32; tables this large exceed HBM anyway
        raise ValueError(f"hash table of 2^{lb} buckets is not supported")
    for _ in range(attempts):
        ptags, confirm, overflow = _build_attempt(dhashes, dpacked, lb)
        if int(overflow) == 0 and int(_self_check(ptags, confirm, dhashes, dpacked, lb)) == 0:
            return (ptags, confirm), lb
        lb += 1
    raise RuntimeError(
        f"hash table placement failed for {n} keys even at 2^{lb - 1} buckets"
    )

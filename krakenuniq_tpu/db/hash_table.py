"""Bucketed two-choice hash table for the device k-mer lookup.

Motivation (measured on TPU v5e): XLA's row-gather cost is ~linear in the
row BYTES fetched (~0.37 ns/B, ~3 ns for an 8B row) and only weakly in the
index count, so the layout minimizes bytes touched per query. The table is
two u32 planes of 8-byte rows probed in two levels:

  ptags:   uint32 [n_buckets, 2]      partial tag per slot (screen)
  confirm: uint32 [n_buckets * 2, 2]  (hash_lo, value) per slot

A query gathers its two candidate buckets' tag rows (2 x 8B), picks the
first matching slot, then gathers that slot's confirm row (8B) and accepts
only when the confirm hash_lo word also matches -- 24B/query (the previous
4-slot/full-hash layout cost 48B/query and 40B/key; this one is <= 24B/key
at the sizing below).

Keys are addressed by h = murmur3_finalizer(key) (a BIJECTION on uint64, so
storing/comparing mixed hashes loses nothing; the HLL path computes the same
h anyway). Every key has two candidate buckets
    b1 = h >> (64 - lb)        b2 = (h * GOLDEN) >> (64 - lb)
and its stored partial tag is bits [lb, lb+32) of h (if placed in b1) or of
h * GOLDEN (if placed in b2) -- the bits just below the bucket index of the
respective probe value, so a probe compares like against like. The confirm
word is always the low 32 bits of the ORIGINAL h.

Exactness: a first-choice-resident key's stored (bucket, tag, hash_lo)
triple covers all 64 bits of h, so a query accepting such a slot has exactly
the resident's hash. A second-choice resident stores lb+32 bits of h*GOLDEN
plus the low 32 bits of h; a false accept therefore requires a query h
satisfying two independent 32+-bit relations against some resident --
probability 2^-(64+lb) per (query, resident) pair, i.e. < 2^-20 expected
false positives over a pod-scale corpus (10^10 queries x 10^10 keys at
lb >= 30). False NEGATIVES (the screen picking a decoy slot whose tag
collides, hiding the real slot behind it) are possible with ~2^-32
probability per resident key; `build_hash_table` therefore self-validates
every key after placement and rebuilds at a larger size in the
(astronomically rare) failure case. Keys whose partial tag is 0 are pinned
to their first-choice bucket so they are found ahead of empty slots (which
read as ptag 0; an empty confirm row only accepts h_lo == 0 and then
returns value 0 = miss anyway).

Placement runs on HOST as a vectorized batch cuckoo insertion (claim-verify
rounds with eviction; the active set shrinks geometrically, so the cost is a
few full-array numpy passes). The device's role is one fused dispatch:
scatter the planes and self-check every key. Earlier designs iterated
rebalance sweeps ON device; a 4.8M-key placement cost 36s of device time
because each sweep re-sorted and re-scattered ALL keys -- the host walk
touches only unplaced keys, which is O(n) work total instead of O(n) per
sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.bits import murmur3_finalizer

BUCKET_SLOTS = 2
GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def bucket_ids(h, lb: int):
    """Host/device-agnostic candidate bucket ids."""
    shift = np.uint64(64 - lb)
    return (h >> shift).astype(np.int64), ((h * GOLDEN) >> shift).astype(np.int64)


def partial_tags(h, lb: int):
    """Bits [lb, lb+32) of the probe value: the screen tag for a bucket
    derived from h's top lb bits."""
    return ((h << np.uint64(lb)) >> np.uint64(32)).astype(jnp.uint32)


def _host_place(hashes: np.ndarray, lb: int, max_rounds: int = 400):
    """Two-choice cuckoo placement with eviction, vectorized over the whole
    unplaced ("active") set per round.

    Each round, every active key picks a wanted slot in its target bucket
    (first empty slot, else a coin-chosen victim), claims it with a
    minimum-index scatter (np.minimum.at), and winners displace any victim
    into the active set with the OTHER of its two buckets as the new target.
    The active set shrinks geometrically; keys whose first-choice tag is 0
    are pinned to bucket b1 (see module docstring).

    Returns int32 assigned-bucket-per-key, or None if placement failed
    (caller grows the table)."""
    n = len(hashes)
    nb = 1 << lb
    shift = np.uint64(64 - lb)
    b1 = (hashes >> shift).astype(np.int64)
    b2 = ((hashes * GOLDEN) >> shift).astype(np.int64)
    pinned = ((hashes << np.uint64(lb)) >> np.uint64(32)).astype(np.uint32) == 0
    b2 = np.where(pinned, b1, b2)

    slots = np.full(nb * BUCKET_SLOTS, -1, dtype=np.int32)  # occupant key index
    active = np.arange(n, dtype=np.int32)
    target = b1.copy()  # bucket each active key tries this round
    claim = np.full(nb * BUCKET_SLOTS, n, dtype=np.int32)  # reset per round below
    for rnd in range(max_rounds):
        t = target[active]
        s0 = slots[t * 2]
        s1 = slots[t * 2 + 1]
        coin = ((hashes[active] >> np.uint64(rnd % 61)) & np.uint64(1)).astype(np.int64)
        want = np.where(s0 < 0, t * 2, np.where(s1 < 0, t * 2 + 1, t * 2 + coin))
        # claim-verify: lowest key index wins a contested slot
        np.minimum.at(claim, want, active)
        win = claim[want] == active
        claim[want] = n  # restore only the touched entries for the next round
        won_slots = want[win]
        victims = slots[won_slots]
        slots[won_slots] = active[win]
        evicted = victims[victims >= 0]
        if len(evicted):
            # a victim's next target is its OTHER bucket (random-walk cuckoo)
            from_bucket = won_slots[victims >= 0] // 2
            other = np.where(b1[evicted] == from_bucket, b2[evicted], b1[evicted])
            target[evicted] = other
        active = np.concatenate([active[~win], evicted])
        if len(active) == 0:
            assign = np.empty(n, dtype=np.int32)
            occ = slots >= 0
            assign[slots[occ]] = (np.nonzero(occ)[0] // 2).astype(np.int32)
            return assign
        # losers retry the same bucket next round with a fresh coin; if both
        # of a key's buckets stay full, eviction chains open space over a few
        # rounds -- stagnation past max_rounds means the load is too high
    return None


def _group_rank(sa, iota):
    """Rank within equal-value groups of a sorted array, via a cummax of
    group-start positions."""
    is_start = jnp.concatenate([jnp.ones(1, bool), sa[1:] != sa[:-1]])
    start_idx = jax.lax.cummax(jnp.where(is_start, iota, -1))
    return iota - start_idx


@functools.partial(jax.jit, static_argnames=("lb",))
def _finalize_table(assign, hashes, values, lb: int):
    """Single fused device dispatch: scatter placed keys into the
    (ptags, confirm) planes (packing occupants ahead of empty slots within
    each bucket) and self-check that the probe finds every key. Returns
    (ptags, confirm, n_bad)."""
    from ..lookup.hash_lookup import probe_values

    n = hashes.shape[0]
    nb = 1 << lb
    iota = jnp.arange(n, dtype=jnp.int32)
    order = jnp.argsort(assign, stable=True)
    sa = jnp.take(assign, order)
    rank = _group_rank(sa, iota)
    rows = sa.astype(jnp.int64)
    cols = jnp.minimum(rank, BUCKET_SLOTS - 1).astype(jnp.int64)
    flat_idx = rows * BUCKET_SLOTS + cols

    h_s = jnp.take(hashes, order)
    v_s = jnp.take(values, order)
    b1_s = (h_s >> jnp.uint64(64 - lb)).astype(jnp.int64)
    # stored tag matches the probe value of the choice that placed the key;
    # the confirm word is always the ORIGINAL hash's low 32 bits (see module
    # docstring for why that beats storing the probe value's low bits)
    hc = jnp.where(rows == b1_s, h_s, h_s * GOLDEN)
    ptag_s = partial_tags(hc, lb)

    ptags = jnp.zeros(nb * BUCKET_SLOTS, jnp.uint32).at[flat_idx].set(ptag_s)
    rows2 = jnp.stack(
        [(h_s & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), v_s], axis=1
    )
    confirm = jnp.zeros((nb * BUCKET_SLOTS, 2), jnp.uint32).at[flat_idx].set(rows2)
    ptags = ptags.reshape(nb, BUCKET_SLOTS)
    got = probe_values(ptags, confirm, hashes, lb)
    n_bad = jnp.sum(got != values, dtype=jnp.int32)
    return ptags, confirm, n_bad


def build_hash_table(
    keys: np.ndarray,
    vals: np.ndarray,
    vals_dense: np.ndarray,
    load_factor: float = 0.6,
    force_lb: int | None = None,
    store_raw: bool = False,
):
    """Returns ((ptags, confirm) DEVICE planes, lb); see module docstring.

    The stored per-key value word is the DENSE taxon id (the classify step
    maps it back through taxid_table); `store_raw` stores the raw 32-bit DB
    value instead (UID databases, whose values are set ids, not taxids).

    load_factor = the MAX keys/slots ratio (power-of-two table sizing means
    the actual load lands in [load_factor/2, load_factor]); batch cuckoo
    placement of 2-slot two-choice buckets succeeds reliably up to the
    ~0.897 theoretical threshold. If placement or the exactness
    self-validation fails, the table is grown (at most twice) before giving
    up. force_lb pins the size (used to stack uniformly-sized shard tables)."""
    n = len(keys)
    hashes = murmur3_finalizer(np.ascontiguousarray(keys, dtype=np.uint64))
    values = np.asarray(vals if store_raw else vals_dense).astype(np.uint32)
    if force_lb is not None:
        lb = force_lb
        attempts = 1
    else:
        lb = max(
            4, int(np.ceil(np.log2(max(n, 2) / (BUCKET_SLOTS * load_factor))))
        )
        attempts = 3
    if lb > 30:
        # flat confirm index must fit int32; tables this large exceed HBM anyway
        raise ValueError(f"hash table of 2^{lb} buckets is not supported")
    dhashes = jax.device_put(hashes)
    dvalues = jax.device_put(values)
    for _ in range(attempts):
        assign = _host_place(hashes, lb)
        if assign is not None:
            ptags, confirm, n_bad = _finalize_table(
                jax.device_put(assign), dhashes, dvalues, lb
            )
            if int(n_bad) == 0:
                return (ptags, confirm), lb
        lb += 1
    raise RuntimeError(
        f"hash table placement failed for {n} keys even at 2^{lb - 1} buckets"
    )

"""Bucketed two-choice hash table for the device k-mer lookup.

Motivation (measured on TPU v5e): XLA's random row-gather from a [N, 2] u32
operand is the ONLY fast random-access form (~2-3 ns/row; small tables are
even prefetched whole into VMEM). The table is two u32 planes of 8-byte rows
probed in two levels:

  ptags:   uint32 [n_buckets, 2]      partial tag per slot (screen)
  confirm: uint32 [n_buckets * 2, 2]  (hash_lo, value) per slot

A query gathers its two candidate buckets' tag rows (2 x 8B), picks the
first matching slot, then gathers that slot's confirm row (8B) and accepts
only when the confirm hash_lo word also matches -- 24B/query (the previous
4-slot/full-hash layout cost 48B/query and 40B/key; this one is <= 24B/key
at the sizing below).

Layout findings that fix this design (all measured on v5e, classify-step
context, 491k queries):
  - [N, 2] u32 resident planes are stored DENSE by XLA:TPU (layout
    {0,1:T(2,128)}, i.e. pairs along sublanes) -- there is no lane padding
    for entry parameters, and row-gathers from them take the fast path.
  - every alternative probed slower: flat u32 [2N] element-gathers and
    emulated-u64 [N] word-gathers ~8.5 ns/element (+20 ms/step); a
    lane-packed [M, 128] (1,2)-slice gather the same; full (1,128)-row
    gathers ~230 ns/row. TPU has no native 64-bit lanes, so u64 packing
    also drags the whole compare pipeline through emulation.
  - what must NOT exist is a [N, 2] u32 value produced by on-device
    scatter/reshape: those materialize in a (8,128)-tiled buffer whose
    lane-padded minor dimension blows up 64x (observed: a 512MB confirm
    plane allocating 32GB at 48M keys). The planes are therefore built on
    HOST with numpy scatters and only ever enter the device via device_put.

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

Placement AND plane construction run on HOST as vectorized numpy passes
(batch cuckoo insertion: claim-verify rounds with eviction; the active set
shrinks geometrically). The device's only build-time role is the final
self-check probe -- one fused gather dispatch over all keys, using the same
probe as the classify step. Earlier designs scattered the planes ON device;
besides the 64x OOM above, the scatter program's remote compile alone cost
40-350s per (shape, lb) variant, where the numpy scatter is ~1s per 50M
keys.
"""

from __future__ import annotations

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


def _host_planes(assign, hashes, values, lb: int):
    """Host numpy construction of the (ptags, confirm) planes (packing
    occupants ahead of empty slots within each bucket)."""
    nb = 1 << lb
    order = np.argsort(assign, kind="stable")
    sa = assign[order]
    # rank within each equal-assign group
    first = np.concatenate([[True], sa[1:] != sa[:-1]])
    start = np.maximum.accumulate(np.where(first, np.arange(len(sa)), -1))
    rank = np.arange(len(sa)) - start
    rows = sa.astype(np.int64)
    cols = np.minimum(rank, BUCKET_SLOTS - 1).astype(np.int64)
    flat_idx = rows * BUCKET_SLOTS + cols

    h_s = hashes[order]
    v_s = values[order]
    b1_s = (h_s >> np.uint64(64 - lb)).astype(np.int64)
    # stored tag matches the probe value of the choice that placed the key;
    # the confirm word is always the ORIGINAL hash's low 32 bits (see module
    # docstring for why that beats storing the probe value's low bits)
    hc = np.where(rows == b1_s, h_s, h_s * GOLDEN)
    ptag_s = ((hc << np.uint64(lb)) >> np.uint64(32)).astype(np.uint32)

    ptags = np.zeros(nb * BUCKET_SLOTS, np.uint32)
    ptags[flat_idx] = ptag_s
    confirm = np.zeros((nb * BUCKET_SLOTS, 2), np.uint32)
    confirm[flat_idx, 0] = (h_s & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    confirm[flat_idx, 1] = v_s
    return ptags.reshape(nb, BUCKET_SLOTS), confirm


def build_hash_table(
    keys: np.ndarray,
    vals: np.ndarray,
    vals_dense: np.ndarray,
    load_factor: float = 0.6,
    force_lb: int | None = None,
    store_raw: bool = False,
    self_check: bool = True,
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
    up. force_lb pins the size (used to stack uniformly-sized shard tables).
    self_check=False skips the device probe (callers that keep planes on
    host, e.g. cache writers, avoid the HBM round trip)."""
    from ..lookup.hash_lookup import probe_values

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
        # flat confirm row index must fit int32; larger tables exceed HBM anyway
        raise ValueError(f"hash table of 2^{lb} buckets is not supported")
    for _ in range(attempts):
        assign = _host_place(hashes, lb)
        if assign is not None:
            ptags, confirm = _host_planes(assign, hashes, values, lb)
            dptags = jax.device_put(ptags)
            dconfirm = jax.device_put(confirm)
            if not self_check:
                return (dptags, dconfirm), lb
            got = probe_values(dptags, dconfirm, jax.device_put(hashes), lb)
            n_bad = int(jnp.sum(got != jax.device_put(values), dtype=jnp.int32))
            if n_bad == 0:
                return (dptags, dconfirm), lb
        lb += 1
    raise RuntimeError(
        f"hash table placement failed for {n} keys even at 2^{lb - 1} buckets"
    )

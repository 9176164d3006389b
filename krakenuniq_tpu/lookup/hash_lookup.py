"""Device-side hash-table k-mer lookup.

Default (CHD) layout: ONE 16B row gather from the main table per query
plus one 16B row gather from a ~16x smaller displacement plane
(db/hash_table.py module doc). The query hash splits into p (top lr bits)
and remainder r; the bucket's stored (d0, d1) displacement addresses
  row = (p + d0 + d1*q(r)) mod 2^lr
and the row's two slots hold (r << lr | value) -- a slot match pins the
full remainder and the row index pins p, so all 64 hash bits are pinned
and the lookup is EXACT (murmur's finalizer is a bijection on uint64).
Compared with the round-3 two-choice fused probe (two 16B gathers from
the BIG table), the big-table gather count halves and the second gather
moves to a table in XLA's faster small-operand gather class.

The fused two-choice layout remains as build fallback: one u32
[n_buckets, 4] plane of [tag0, val0, tag1, val1] rows; the probe gathers
both candidate buckets' rows and accepts a slot whose tag and value-word
high bits (choice flag + spare hash bits) both match -- also exact.

Raw-valued (UID) tables keep the two-level (ptags, confirm) layout -- the
32-bit value word has no spare bits -- probed as two 8B tag rows, then the
8B confirm row of the first screened slot (24B/query, two dependent
rounds); a false accept requires a 2^-(64+lb)-probability coincidence.

The query's murmur hash doubles as the probe value, so canonical k-mers
never need to be fetched or compared. The value word is the pool id /
dense taxon id for normal databases (mapped back to the original taxid
space by the classify step) or the raw 32-bit DB value for UID databases.

Layout dispatch is static by plane structure: 1 plane = fused; 2 planes
with planes[0].shape[1] == 4 = CHD (disp4, rows); shape[1] == 2 = raw
two-level (ptags, confirm).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..db.hash_table import BUCKET_SLOTS, C2, GOLDEN


def _probe_fused(fused, h, lb: int):
    """Fused single-plane probe: returns (found, taxon_field) per query."""
    shift = np.uint64(64 - lb)
    v_bits = lb - 1
    hg = h * GOLDEN
    r1 = (h >> shift).astype(jnp.int32)
    r2 = (hg >> shift).astype(jnp.int32)
    spare_mask = np.uint64((1 << (32 - lb)) - 1)

    def expected(hc, choice_bit: int):
        tag = ((hc << np.uint64(lb)) >> np.uint64(32)).astype(jnp.uint32)
        hi = (hc & spare_mask).astype(jnp.uint32) << jnp.uint32(v_bits)
        if choice_bit:
            hi = hi | jnp.uint32(1 << 31)
        return tag, hi

    t1, hi1 = expected(h, 0)
    t2, hi2 = expected(hg, 1)
    row1 = jnp.take(fused, r1, axis=0)  # [n, 4]
    row2 = jnp.take(fused, r2, axis=0)
    tax_mask = jnp.uint32((1 << v_bits) - 1)
    hi_mask = ~tax_mask

    m1 = (row1[:, 0::2] == t1[:, None]) & ((row1[:, 1::2] & hi_mask) == hi1[:, None])
    m2 = (row2[:, 0::2] == t2[:, None]) & ((row2[:, 1::2] & hi_mask) == hi2[:, None])
    # exactness means at most one slot can match; max-combine is a select
    v1 = jnp.max(jnp.where(m1, row1[:, 1::2] & tax_mask, jnp.uint32(0)), axis=1)
    v2 = jnp.max(jnp.where(m2, row2[:, 1::2] & tax_mask, jnp.uint32(0)), axis=1)
    ok = jnp.any(m1, axis=1) | jnp.any(m2, axis=1)
    return ok, jnp.maximum(v1, v2)


def _probe_rows(ptags, confirm, h, lb: int):
    """Two-level (raw/UID) probe: returns (found, value_word) per query."""
    shift = np.uint64(64 - lb)
    hg = h * GOLDEN
    r1 = (h >> shift).astype(jnp.int32)
    r2 = (hg >> shift).astype(jnp.int32)
    p1 = ((h << np.uint64(lb)) >> np.uint64(32)).astype(jnp.uint32)
    p2 = ((hg << np.uint64(lb)) >> np.uint64(32)).astype(jnp.uint32)
    t1 = jnp.take(ptags, r1, axis=0)
    t2 = jnp.take(ptags, r2, axis=0)
    eq1 = t1 == p1[:, None]
    # when both choices land on the same bucket, keys there are stored with
    # their first-choice tag; only the first-choice compare applies
    eq2 = (t2 == p2[:, None]) & (r1 != r2)[:, None]
    has1 = jnp.any(eq1, axis=1)
    has2 = jnp.any(eq2, axis=1)
    c1 = jnp.argmax(eq1, axis=1).astype(jnp.int32)
    c2 = jnp.argmax(eq2, axis=1).astype(jnp.int32)
    flat = jnp.where(
        has1, r1 * BUCKET_SLOTS + c1, r2 * BUCKET_SLOTS + c2
    )
    crow = jnp.take(confirm, flat, axis=0)
    ok = (has1 | has2) & (crow[:, 0] == (h & np.uint64(0xFFFFFFFF)).astype(jnp.uint32))
    return ok, crow[:, 1]


def _probe_chd(disp4, rows_plane, h, lr: int):
    """One-gather displaced-bucket probe: returns (found, value) per query.
    `lr` is the row-bits; the bucket width lg is static from disp4's shape."""
    lg = int(np.log2(disp4.shape[0] * 4))
    r_mask = np.uint64((1 << (64 - lr)) - 1)
    p = (h >> np.uint64(64 - lr)).astype(jnp.uint32)
    r = h & r_mask
    g = ((r * GOLDEN) >> np.uint64(64 - lg)).astype(jnp.int32)
    q = ((r * C2) >> np.uint64(64 - lr)).astype(jnp.uint32)
    # displacement word: 16B row gather from the packed [2^(lg-2), 4] plane,
    # then a 4-way lane select (element gathers are the slow path on TPU)
    drow = jnp.take(disp4, g >> 2, axis=0)  # [n, 4]
    lane = g & 3
    d = jnp.where(
        lane == 0,
        drow[:, 0],
        jnp.where(lane == 1, drow[:, 1], jnp.where(lane == 2, drow[:, 2], drow[:, 3])),
    )
    d0 = d & jnp.uint32(0xFFFF)
    d1 = d >> jnp.uint32(16)
    row = (p + d0 + d1 * q) & jnp.uint32((1 << lr) - 1)
    rw = jnp.take(rows_plane, row.astype(jnp.int32), axis=0)  # [n, 4]
    v_mask = jnp.uint32((1 << lr) - 1)
    e_hi = (r >> np.uint64(32 - lr)).astype(jnp.uint32)
    e_lo = ((r & np.uint64((1 << (32 - lr)) - 1)) << np.uint64(lr)).astype(jnp.uint32)
    m0 = (rw[:, 0] == e_hi) & ((rw[:, 1] & ~v_mask) == e_lo)
    m1 = (rw[:, 2] == e_hi) & ((rw[:, 3] & ~v_mask) == e_lo)
    # exactness: at most one REAL slot matches; empty slots match only
    # r == 0 queries and contribute value 0 = miss, so max-combine is safe
    val = jnp.maximum(
        jnp.where(m0, rw[:, 1] & v_mask, jnp.uint32(0)),
        jnp.where(m1, rw[:, 3] & v_mask, jnp.uint32(0)),
    )
    return m0 | m1, val


def _probe(planes, h, lb: int):
    """Static layout dispatch (module docstring): 1 plane = fused; 2 planes
    = CHD (disp4 rows are 4 wide) or raw two-level (ptags rows are 2 wide)."""
    if len(planes) == 1:
        return _probe_fused(planes[0], h, lb)
    if planes[0].shape[1] == 4:
        return _probe_chd(planes[0], planes[1], h, lb)
    return _probe_rows(planes[0], planes[1], h, lb)


# Probe cost model (corrected in round 3; full data in BENCHNOTES.md).
# The round-2 "gather-emitter pathology" was a measurement artifact: with a
# proper completion barrier, probing device_put hashes, fused
# producer+probe, and split programs all time identically (~120ms at 8.5M
# queries on a 64MB table). XLA:TPU row gathers cost ~6.7-12.9 ns per
# random row regardless of index locality (sorted == random) or producer
# fusion; narrower rows, element gathers, u64 gathers, and sort-then-gather
# are all equal or worse. Two 16B bucket rows per query (~25.6 ns at
# reference scale) is therefore within ~1.6x of XLA's floor for ANY
# exact two-location scheme, and the layout stays. Single-element gathers
# from computed indices remain slow (~8.9 ns/element) -- which is why
# device_counters.py uses a global-key sort instead of a remap gather.


@functools.partial(jax.jit, static_argnames=("lb",))
def probe_values(planes, hashes, lb: int):
    """Raw probe for the build-time self check: the stored value word per
    hash, 0 on miss."""
    ok, val = _probe(planes, hashes.reshape(-1), lb)
    return jnp.where(ok, val, jnp.uint32(0)).reshape(hashes.shape)


@functools.partial(jax.jit, static_argnames=("lb",))
def hash_lookup_kmers(
    planes: tuple,  # (fused,) or (ptags, confirm); see db/hash_table.py
    hashes: jax.Array,  # uint64 [...] murmur3_finalizer(canonical k-mer)
    valid: jax.Array,  # bool [...]
    lb: int,
):
    """Returns the stored value per lane; 0 where missing/invalid."""
    shape = hashes.shape
    ok, val = _probe(planes, hashes.reshape(-1), lb)
    ok = ok & valid.reshape(-1)
    return jnp.where(ok, val, jnp.uint32(0)).reshape(shape)

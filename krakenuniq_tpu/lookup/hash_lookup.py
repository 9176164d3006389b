"""Device-side hash-table k-mer lookup.

Default (fused) layout: one u32 [n_buckets, 4] plane of [tag0, val0, tag1,
val1] rows (db/hash_table.py). The probe gathers the query's two candidate
rows -- two INDEPENDENT 16B row-gathers, so a single memory round trip --
and accepts a slot whose tag and value-word high bits (choice flag + spare
hash bits) both match. The accepted (bucket, tag, choice, spare) tuple
pins all 64 bits of the placing probe value, so the lookup is EXACT: a
slot is accepted iff its key's murmur hash equals the query's (murmur's
finalizer and the GOLDEN multiply are both bijections on uint64).
Measured on TPU v5e, XLA's random row-gather costs ~0.37 ns per byte
fetched: 32B/query here, with no dependent second round.

Raw-valued (UID) tables keep the two-level (ptags, confirm) layout -- the
32-bit value word has no spare bits -- probed as two 8B tag rows, then the
8B confirm row of the first screened slot (24B/query, two dependent
rounds); a false accept requires a 2^-(64+lb)-probability coincidence.

The query's murmur hash doubles as the probe value, so canonical k-mers
never need to be fetched or compared. The value word is the dense taxon id
for normal databases (mapped back to the original taxid space through
taxid_table by the classify step) or the raw 32-bit DB value for UID
databases.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..db.hash_table import BUCKET_SLOTS, GOLDEN


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


def _probe(planes, h, lb: int):
    """Layout dispatch: 1 plane = fused, 2 planes = two-level (raw)."""
    if len(planes) == 1:
        return _probe_fused(planes[0], h, lb)
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

"""Device-side hash-table k-mer lookup: three 8-byte u32 row-gathers.

See db/hash_table.py for the two-level (ptags, confirm) layout. Measured on
TPU v5e, XLA's random row-gather costs ~0.37 ns per BYTE fetched, so the
probe touches 24B/query: two 8B partial-tag rows (the two candidate
buckets), then the 8B confirm row (hash_lo + value word) of the first
screened slot. The confirm compare makes a false accept require a
2^-(64+lb)-probability coincidence (hash_table.py docstring); the build
guarantees the first screened slot is the right one for every resident key
(self-validated). The query's murmur hash doubles as the probe value, so
canonical k-mers never need to be fetched or compared.

The value word is the dense taxon id for normal databases (mapped back to
the original taxid space through taxid_table by the classify step) or the
raw 32-bit DB value for UID databases.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..db.hash_table import BUCKET_SLOTS, GOLDEN


def _probe_rows(ptags, confirm, h, lb: int):
    """Shared probe: returns (found, value_word) per query."""
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


def probe_values(ptags, confirm, hashes, lb: int):
    """Raw probe for the build-time self check: the stored u32 value word per
    hash, 0 on miss."""
    ok, val = _probe_rows(ptags, confirm, hashes.reshape(-1), lb)
    return jnp.where(ok, val, jnp.uint32(0)).reshape(hashes.shape)


@functools.partial(jax.jit, static_argnames=("lb",))
def hash_lookup_kmers(
    ptags: jax.Array,  # uint32 [n_buckets, 2]
    confirm: jax.Array,  # uint32 [n_buckets * 2, 2]
    hashes: jax.Array,  # uint64 [...] murmur3_finalizer(canonical k-mer)
    valid: jax.Array,  # bool [...]
    lb: int,
):
    """Returns the stored u32 value word per lane; 0 where missing/invalid."""
    shape = hashes.shape
    ok, val = _probe_rows(ptags, confirm, hashes.reshape(-1), lb)
    ok = ok & valid.reshape(-1)
    return jnp.where(ok, val, jnp.uint32(0)).reshape(shape)

"""Device-side hash-table k-mer lookup: two row-gathers per query batch.

See db/hash_table.py for the table layout and the max-chain-2 guarantee.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..db.hash_table import BUCKET_SLOTS, EMPTY_KEY, GOLDEN


def _probe(table: jax.Array, rows: jax.Array, q: jax.Array):
    """Fetch one bucket row per query; returns (hit, packed_value)."""
    row = jnp.take(table, rows, axis=0)  # [M, 16] uint64
    keys = row[:, :BUCKET_SLOTS]
    packed = row[:, BUCKET_SLOTS:]
    eq = keys == q[:, None]
    hit = jnp.any(eq, axis=1)
    value = jnp.sum(jnp.where(eq, packed, jnp.uint64(0)), axis=1)
    return hit, value


@functools.partial(jax.jit, static_argnames=("lb",))
def hash_lookup_kmers(
    table: jax.Array,  # uint64 [n_buckets, 16]
    query: jax.Array,  # uint64 [...] canonical k-mers
    hashes: jax.Array,  # uint64 [...] murmur3_finalizer(query)
    valid: jax.Array,  # bool [...]
    lb: int,
):
    """Returns (taxon uint32, taxon_dense int32); 0 where missing/invalid."""
    shape = query.shape
    q = query.reshape(-1)
    h = hashes.reshape(-1)
    v = valid.reshape(-1)
    nb = table.shape[0]

    shift = np.uint64(64 - lb)
    rows1 = (h >> shift).astype(jnp.int32)
    rows2 = ((h * GOLDEN) >> shift).astype(jnp.int32)
    hit1, val1 = _probe(table, rows1, q)
    hit2, val2 = _probe(table, rows2, q)

    hit = (hit1 | hit2) & v
    value = jnp.where(hit1, val1, val2)
    taxon = jnp.where(hit, value & jnp.uint64(0xFFFFFFFF), 0).astype(jnp.uint32)
    taxon_dense = jnp.where(hit, value >> jnp.uint64(32), 0).astype(jnp.int32)
    return taxon.reshape(shape), taxon_dense.reshape(shape)

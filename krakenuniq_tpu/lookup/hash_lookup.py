"""Device-side hash-table k-mer lookup: two row-gathers per query batch.

See db/hash_table.py for the table layout and the max-chain-2 guarantee.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..db.hash_table import BUCKET_SLOTS, EMPTY_KEY


def _probe(table: jax.Array, rows: jax.Array, q: jax.Array):
    """Fetch one bucket row per query; returns (hit, packed_value, full)."""
    row = jnp.take(table, rows, axis=0)  # [M, 16] uint64
    keys = row[:, :BUCKET_SLOTS]
    packed = row[:, BUCKET_SLOTS:]
    eq = keys == q[:, None]
    hit = jnp.any(eq, axis=1)
    value = jnp.sum(jnp.where(eq, packed, jnp.uint64(0)), axis=1)
    full = jnp.all(keys != jnp.uint64(EMPTY_KEY), axis=1)
    return hit, value, full


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

    rows = (h >> np.uint64(64 - lb)).astype(jnp.int32)
    hit1, val1, full1 = _probe(table, rows, q)
    rows2 = jnp.where(rows + 1 < nb, rows + 1, 0)
    hit2, val2, _ = _probe(table, rows2, q)

    hit = hit1 | (full1 & hit2)
    value = jnp.where(hit1, val1, jnp.where(full1 & hit2, val2, jnp.uint64(0)))
    hit = hit & v
    taxon = jnp.where(hit, value & jnp.uint64(0xFFFFFFFF), 0).astype(jnp.uint32)
    taxon_dense = jnp.where(hit, value >> jnp.uint64(32), 0).astype(jnp.int32)
    return taxon.reshape(shape), taxon_dense.reshape(shape)

"""Device-side hash-table k-mer lookup: three narrow row-gathers per batch.

See db/hash_table.py for the two-plane (tags, vals) layout and why 4-wide
uint64 rows hit XLA's fast gather path. The query's murmur hash doubles as
the comparison tag (the finalizer is bijective), so the canonical k-mers
themselves never need to be fetched or compared.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..db.hash_table import GOLDEN


@functools.partial(jax.jit, static_argnames=("lb",))
def hash_lookup_kmers(
    tags: jax.Array,  # uint64 [n_buckets, 4]
    vals: jax.Array,  # uint64 [n_buckets, 4]
    hashes: jax.Array,  # uint64 [...] murmur3_finalizer(canonical k-mer)
    valid: jax.Array,  # bool [...]
    lb: int,
):
    """Returns (taxon uint32, taxon_dense int32); 0 where missing/invalid."""
    shape = hashes.shape
    h = hashes.reshape(-1)
    v = valid.reshape(-1)

    shift = np.uint64(64 - lb)
    rows1 = (h >> shift).astype(jnp.int32)
    rows2 = ((h * GOLDEN) >> shift).astype(jnp.int32)
    eq1 = jnp.take(tags, rows1, axis=0) == h[:, None]
    hit1 = jnp.any(eq1, axis=1)
    eq2 = jnp.take(tags, rows2, axis=0) == h[:, None]
    hit2 = jnp.any(eq2, axis=1)

    # one value fetch from whichever bucket matched (arbitrary row on miss --
    # its value is masked out below)
    row = jnp.where(hit1, rows1, rows2)
    eq = jnp.where(hit1[:, None], eq1, eq2)
    vrow = jnp.take(vals, row, axis=0)
    value = jnp.sum(jnp.where(eq, vrow, jnp.uint64(0)), axis=1)

    hit = (hit1 | hit2) & v
    taxon = jnp.where(hit, value & jnp.uint64(0xFFFFFFFF), 0).astype(jnp.uint32)
    taxon_dense = jnp.where(hit, value >> jnp.uint64(32), 0).astype(jnp.int32)
    return taxon.reshape(shape), taxon_dense.reshape(shape)

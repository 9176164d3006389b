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
    # all four row-gathers are mutually independent so the hardware can
    # overlap them (measured: a dependent gather chain runs at its ~30ms
    # latency per link, independent gathers at ~8ms throughput); a key is
    # stored in exactly one bucket, so summing both buckets' masked values
    # is exact (the non-matching bucket contributes zeros)
    eq1 = jnp.take(tags, rows1, axis=0) == h[:, None]
    eq2 = jnp.take(tags, rows2, axis=0) == h[:, None]
    vrow1 = jnp.take(vals, rows1, axis=0)
    vrow2 = jnp.take(vals, rows2, axis=0)
    hit1 = jnp.any(eq1, axis=1)
    hit2 = jnp.any(eq2, axis=1)
    # when both choices land on the same bucket the two gathers see the same
    # slots -- count the second one only when the buckets differ
    dup = rows1 == rows2
    value = jnp.sum(jnp.where(eq1, vrow1, jnp.uint64(0)), axis=1) + jnp.where(
        dup,
        jnp.uint64(0),
        jnp.sum(jnp.where(eq2, vrow2, jnp.uint64(0)), axis=1),
    )

    hit = (hit1 | hit2) & v
    taxon = jnp.where(hit, value & jnp.uint64(0xFFFFFFFF), 0).astype(jnp.uint32)
    taxon_dense = jnp.where(hit, value >> jnp.uint64(32), 0).astype(jnp.int32)
    return taxon.reshape(shape), taxon_dense.reshape(shape)

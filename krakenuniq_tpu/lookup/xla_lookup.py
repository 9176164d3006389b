"""Two-level database lookup, XLA formulation.

Semantics of reference kmer_query (krakendb.cpp:250-321): the minimizer
selects a bin via the offset table; a binary search over the sorted bin
finds the k-mer; misses return taxon 0.

This formulation replaces the reference's per-query cache-carrying scalar
search with a fully vectorized masked lower-bound: every lane runs the same
fixed trip count (ceil(log2(max_bin+1))+1), so the whole query batch is one
fused loop of gathers -- no data-dependent control flow under jit.

The default hot path is the fused hash probe (lookup/hash_lookup.py); this
bsearch path remains as the build-time fallback and for databases loaded
without a hash table.

Pallas note (investigated and rejected, measurements on v5e): a hand-written
lookup kernel needs random 16B-row access over a multi-GB HBM table. Mosaic's
in-kernel gather supports only lane-wise 2D VMEM gathers (the table would
have to fit in VMEM/128), and per-row `make_async_copy` DMAs cannot approach
the XLA gather engine's ~0.33 ns/B on 8.5M-query batches. XLA row-gathers ARE
the hardware path for this access pattern; the TPU-native leverage went into
layout instead (fused 32B/query probe rows, sort+searchsorted register max
replacing scatter, dense RLE rows, mode-specific output sets).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_iter",))
def lookup_kmers(
    keys: jax.Array,  # uint64 [N] sorted within bins
    vals: jax.Array,  # uint32 [N]
    vals_dense: jax.Array,  # int32 [N]
    offsets: jax.Array,  # int64 [n_bins + 1] (shard-relative)
    query: jax.Array,  # uint64 [...]: canonical k-mers
    bins: jax.Array,  # uint64 [...]: minimizer bin key per query
    valid: jax.Array,  # bool [...]: lanes to search
    n_iter: int,
    bin_start: int = 0,
):
    """Returns (taxon uint32, taxon_dense int32), 0 where missing/invalid."""
    shape = query.shape
    q = query.reshape(-1)
    b = bins.reshape(-1).astype(jnp.int64) - bin_start
    v = valid.reshape(-1)

    n_bins = offsets.shape[0] - 1
    in_range = (b >= 0) & (b < n_bins) & v
    b_safe = jnp.clip(b, 0, n_bins - 1)
    lo = jnp.where(in_range, jnp.take(offsets, b_safe), 0)
    hi = jnp.where(in_range, jnp.take(offsets, b_safe + 1), 0)
    hi0 = hi

    n = keys.shape[0]

    def body(_, carry):
        lo, hi = carry
        active = lo < hi
        mid = (lo + hi) >> 1
        mid_safe = jnp.clip(mid, 0, n - 1)
        km = jnp.take(keys, mid_safe)
        go_right = km < q
        new_lo = jnp.where(go_right, mid + 1, lo)
        new_hi = jnp.where(go_right, hi, mid)
        lo = jnp.where(active, new_lo, lo)
        hi = jnp.where(active, new_hi, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    pos = jnp.clip(lo, 0, n - 1)
    found = (lo < hi0) & (jnp.take(keys, pos) == q) & in_range
    taxon = jnp.where(found, jnp.take(vals, pos), jnp.uint32(0))
    taxon_dense = jnp.where(found, jnp.take(vals_dense, pos), jnp.int32(0))
    return taxon.reshape(shape), taxon_dense.reshape(shape)

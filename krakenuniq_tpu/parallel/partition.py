"""Minimizer-range database partitioning for multi-chip meshes.

Generalizes the reference's out-of-core chunking (`--preload-size`,
krakendb.cpp:463-522): where the reference binary-searches the largest
minimizer range fitting a RAM budget and loads chunks SERIALLY, we cut the
minimizer space into N ranges of (near-)equal key count and keep all N
resident SIMULTANEOUSLY, one per device along the mesh's "db" axis. The
correctness invariant is the same one the reference's chunk merge asserts
(classify.cpp:447): each k-mer's minimizer lives in exactly one range.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def partition_bins_equal_keys(offsets: np.ndarray, n_shards: int) -> list[tuple[int, int]]:
    """Cut bins [0, n_bins) into n_shards contiguous ranges with ~equal keys.

    offsets: (n_bins + 1) cumulative key counts. Returns [(bin_lo, bin_hi)).
    """
    offsets = np.asarray(offsets, dtype=np.uint64)
    n_bins = len(offsets) - 1
    total = int(offsets[-1])
    targets = [(total * i) // n_shards for i in range(1, n_shards)]
    cuts = [0]
    for t in targets:
        cut = int(np.searchsorted(offsets, t, side="left"))
        cut = max(cuts[-1], min(cut, n_bins))
        cuts.append(cut)
    cuts.append(n_bins)
    return [(cuts[i], cuts[i + 1]) for i in range(n_shards)]


@dataclasses.dataclass
class ShardedDBPlanes:
    """Stacked per-shard planes, padded to uniform sizes for SPMD."""

    keys: np.ndarray  # uint64 [S, Nmax]; padding = all-ones sentinel
    vals: np.ndarray  # uint32 [S, Nmax]
    vals_dense: np.ndarray  # int32 [S, Nmax]
    offsets: np.ndarray  # int64 [S, Bmax + 1]; shard-relative, last value repeated
    bin_start: np.ndarray  # int64 [S]
    max_bin: int

    @property
    def n_shards(self) -> int:
        return self.keys.shape[0]


def shard_db_planes(
    keys: np.ndarray,
    vals: np.ndarray,
    vals_dense: np.ndarray,
    offsets: np.ndarray,
    n_shards: int,
) -> ShardedDBPlanes:
    bounds = partition_bins_equal_keys(offsets, n_shards)
    offsets = np.asarray(offsets, dtype=np.int64)
    key_slices = [(int(offsets[lo]), int(offsets[hi])) for lo, hi in bounds]
    n_max = max(e - s for s, e in key_slices)
    b_max = max(hi - lo for lo, hi in bounds)

    s_keys = np.full((n_shards, n_max), np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    s_vals = np.zeros((n_shards, n_max), dtype=np.uint32)
    s_vd = np.zeros((n_shards, n_max), dtype=np.int32)
    s_off = np.zeros((n_shards, b_max + 1), dtype=np.int64)
    s_start = np.zeros(n_shards, dtype=np.int64)
    max_bin = 0
    for i, ((blo, bhi), (klo, khi)) in enumerate(zip(bounds, key_slices)):
        n = khi - klo
        s_keys[i, :n] = keys[klo:khi]
        s_vals[i, :n] = vals[klo:khi]
        s_vd[i, :n] = vals_dense[klo:khi]
        rel = offsets[blo : bhi + 1] - offsets[blo]
        s_off[i, : len(rel)] = rel
        s_off[i, len(rel) :] = rel[-1] if len(rel) else 0  # padded bins are empty
        s_start[i] = blo
        if bhi > blo:
            max_bin = max(max_bin, int(np.diff(offsets[blo : bhi + 1]).max()))
    return ShardedDBPlanes(
        keys=s_keys, vals=s_vals, vals_dense=s_vd, offsets=s_off, bin_start=s_start, max_bin=max_bin
    )


@dataclasses.dataclass
class ShardedHashPlanes:
    """Stacked per-shard hash tables (db/hash_table.py layouts).

    planes holds the shard-stacked device arrays:
    (disp4[S, 2^(lg-2), 4], rows[S, 2^lb, 4]) for dense-valued tables
    (CHD layout), (ptags[S, nb, 2], confirm[S, nb*2, 2]) for raw (UID)
    tables."""

    planes: tuple
    lb: int
    bounds: list  # minimizer-bin ranges per shard (for bookkeeping)
    store_raw: bool = False

    def shard_planes(self, s: int) -> tuple:
        """The plane tuple of one shard (probe-ready)."""
        return tuple(p[s] for p in self.planes)

    @property
    def n_shards(self) -> int:
        return self.planes[0].shape[0]


def shard_hash_tables(
    keys: np.ndarray,
    vals: np.ndarray,
    vals_dense: np.ndarray,
    offsets: np.ndarray,
    n_shards: int,
    hash_sink: list | None = None,  # appended with (host_planes, lb, bounds)
    store_raw: bool = False,
) -> ShardedHashPlanes:
    """Partition keys by minimizer range (same invariant as the bsearch
    shards) and build one hash table per shard, padded to a common size.

    Building every shard at the common lb up front (the max of the
    per-shard minimums; equal-key partitioning keeps them equal in
    practice) avoids rebuild passes; a shard whose placement stalls at the
    common lb (adversarially skewed key sets) restarts the whole stack one
    bit larger so the SPMD layout stays uniform. The stack is assembled on
    HOST and device_put once; `hash_sink` receives the host planes for
    cache writers. store_raw stacks the two-level (ptags, confirm) layout
    used by UID tables."""
    import jax

    from ..db.hash_table import HashBuildError, build_hash_table, chd_min_lr

    bounds = partition_bins_equal_keys(offsets, n_shards)
    offsets = np.asarray(offsets, dtype=np.int64)
    key_slices = [(int(offsets[lo]), int(offsets[hi])) for lo, hi in bounds]
    if store_raw:
        from ..db.hash_table import BUCKET_SLOTS

        lb = max(
            max(4, int(np.ceil(np.log2(max(khi - klo, 2) / (BUCKET_SLOTS * 0.6)))))
            for klo, khi in key_slices
        )
    else:
        vmax = int(vals_dense.max()) if len(vals_dense) else 0
        lb = max(chd_min_lr(khi - klo, vmax) for klo, khi in key_slices)
    while True:
        if lb > 30:
            raise HashBuildError(
                f"sharded hash stack does not fit 2^30 buckets/shard "
                f"({n_shards} shards)"
            )
        if store_raw:
            stacks = (
                np.zeros((n_shards, 1 << lb, 2), np.uint32),
                np.zeros((n_shards, (1 << lb) * 2, 2), np.uint32),
            )
        else:
            # CHD layout (db/hash_table.py): disp plane + 2-slot rows plane
            lg = max(2, lb - 2)
            stacks = (
                np.zeros((n_shards, 1 << max(0, lg - 2), 4), np.uint32),
                np.zeros((n_shards, 1 << lb, 4), np.uint32),
            )
        try:
            for i, (klo, khi) in enumerate(key_slices):
                _, _, host = build_hash_table(
                    keys[klo:khi], vals[klo:khi], vals_dense[klo:khi], force_lb=lb,
                    store_raw=store_raw, keep_host=True, to_device=False,
                    layout="chd",
                )
                for stack, plane in zip(stacks, host):
                    stack[i] = plane
        except HashBuildError:
            lb += 1
            continue
        break
    if hash_sink is not None:
        hash_sink.append((stacks, lb, bounds))
    return ShardedHashPlanes(
        planes=tuple(jax.device_put(s) for s in stacks),
        lb=lb,
        bounds=bounds,
        store_raw=store_raw,
    )

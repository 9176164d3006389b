"""Device-resident per-taxon accumulation (--device-counters fast mode).

Keeps the whole taxon_counts state in HBM across the run: per-taxon read and
k-mer counters plus dense HLL registers, updated in-place every batch with
scatter-adds/maxes; the host fetches the state ONCE at the end. This removes
the per-k-mer device->host traffic of the exact-compat mode.

Register pooling: HLL registers only ever accumulate for taxa that occur as
DATABASE VALUES (counted k-mers carry the DB's LCA taxon, classify.cpp:939)
-- a set the host knows exactly at load time. The register plane is
therefore [pool_size, m] over the sorted distinct dense values (plus 0 for
misses), NOT [taxonomy_size, m]: a 2.4M-node NCBI taxonomy costs nothing
beyond its actual value set. Read/k-mer counters stay full-width [T]
(calls can land on any ancestor via resolve_tree). In value-pool mode the
id space IS the register row space, so registers update by direct
scatter-max and per-taxon counts come from an i32 sort plus boundary
probes (measured fastest; bincount's scatter-add and the older
sort+searchsorted translation cost 2-8x more -- BENCHNOTES.md §5); the
sort+searchsorted translation remains for non-identity pools, and a plain
remap-gather + scatter for very large ones.

Bit-exactness: dense registers alone reproduce the reference only for taxa
whose counters END dense. The sparse-regime tracking in sparse_exact.py
closes the gap -- per work unit the device decides which (unit, taxon)
groups went dense and compacts the distinct encodings of those that stayed
sparse into a small host buffer; finalize() then rebuilds sparse-mode HLLs
whose state (and therefore every report column) is bit-identical to the
host/reference path. `sparse_cap=0` opts out (estimate-level compat only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..hll import HLL, ReadCounts
from .sparse_exact import SparseTracker, sparse_stats_core, sparse_stats_host


def update_core(
    reg: jax.Array,  # uint8 [P, m] register pool (donated)
    kmer_counts: jax.Array,  # int64 [T] (donated)
    read_counts: jax.Array,  # int64 [T] (donated)
    pool_maps: tuple,  # (pool_rows int32 [P] sorted dense ids, lut1d int32 [T])
    taxa_dense: jax.Array,  # int32 [B, W]
    enc: jax.Array,  # uint32 [B, W]
    hll_lanes: jax.Array,  # bool [B, W]
    call_dense: jax.Array,  # int32 [B]
    row_valid: jax.Array,  # bool [B]
    p: int,
    unit_id: jax.Array | None = None,  # uint8 [B]: work-unit index per row
    sparse_cap: int = 0,  # >0: also return sparse-exact stats (buf, n_p, n_e)
    counts_only: bool = False,  # skip registers/tracking (--exact: sets live on host)
    identity_pool: bool = False,  # register rows ARE the id space (pool mode)
):
    """Pure accumulation body; jitted standalone below and fused into the
    classify step by the pipeline (one dispatch, overlapped with the lookup
    gathers)."""
    pool_rows, lut1d = pool_maps
    t = kmer_counts.shape[0]
    pool, m = reg.shape
    pm = pool * m
    sp = (
        sparse_stats_core(taxa_dense, enc, hll_lanes, unit_id, p, sparse_cap)
        if sparse_cap > 0 and not counts_only
        else ()
    )
    taxa_flat = taxa_dense.reshape(-1)
    enc_flat = enc.reshape(-1)
    lanes = hll_lanes.reshape(-1)

    safe_taxa = jnp.where(lanes, taxa_flat, 0)
    read_counts = read_counts + jnp.bincount(
        jnp.where(row_valid, call_dense, t), length=t + 1
    )[:t].astype(jnp.int64)
    if t <= (1 << 17):
        # per-id k-mer counts from an i32 sort + t+1 boundary probes: the
        # sort runs ~26ms at 8.5M lanes where bincount's scatter-add costs
        # 80-500ms (BENCHNOTES.md §5)
        st = jax.lax.sort(jnp.where(lanes, taxa_flat, jnp.int32(t)))
        edges = jnp.searchsorted(
            st, jnp.arange(t + 1, dtype=jnp.int32), side="left"
        )
        kmer_counts = kmer_counts + (edges[1:] - edges[:-1]).astype(jnp.int64)
    else:
        kmer_counts = kmer_counts + jnp.bincount(
            jnp.where(lanes, taxa_flat, t), length=t + 1
        )[:t].astype(jnp.int64)
    if counts_only:
        return (reg, kmer_counts, read_counts) + sp

    # dense register update: idx = top p bits of the encoding, rank decoded
    # from it (see utils/bits.decode_rank; identical for dense inserts)
    idx = (enc_flat >> jnp.uint32(32 - p)).astype(jnp.int32)
    flagged = (enc_flat & jnp.uint32(1)) == 1
    stored = ((enc_flat >> jnp.uint32(1)) & jnp.uint32(0x3F)).astype(jnp.uint8)
    flag_rank = stored + jnp.uint8(25 - p)
    shifted = enc_flat << jnp.uint32(p)
    clz = jnp.minimum(
        jnp.where(shifted == 0, jnp.uint32(32), jax.lax.clz(shifted).astype(jnp.uint32)),
        jnp.uint32(32 - p),
    )
    plain_rank = (clz + jnp.uint32(1)).astype(jnp.uint8)
    rank = jnp.where(flagged, flag_rank, plain_rank)

    if identity_pool:
        # pool mode: dense ids ARE register rows -- direct scatter-max, no
        # remap gather and no sort (measured ~105ms vs ~420ms for the
        # sort+searchsorted formulation at 8.5M lanes, BENCHNOTES.md §5)
        flat_slot = jnp.where(lanes, safe_taxa * m + idx, pm)
        reg_flat = jnp.concatenate([reg.reshape(-1), jnp.zeros(m, jnp.uint8)])
        reg_flat = reg_flat.at[flat_slot].max(jnp.where(lanes, rank, jnp.uint8(0)))
        return (reg_flat[:pm].reshape(pool, m), kmer_counts, read_counts) + sp

    if pm <= (1 << 22):
        # sort-based segment max over GLOBAL slot keys -- no per-lane
        # dense->pool remap (a gather with computed indices runs ~10x slower
        # than the sort on this XLA:TPU; see lookup/hash_lookup.py notes).
        # Key = (dense_taxon * m + idx) << 6 | rank in u64; the per-pool-slot
        # maxima are read back with a searchsorted over the POOL's slot grid,
        # which is where the dense->pool translation happens (P*m probes of a
        # sorted array instead of B*W gather lanes).
        slot64 = (
            safe_taxa.astype(jnp.uint64) * jnp.uint64(m) + idx.astype(jnp.uint64)
        )
        comb = jnp.where(
            lanes,
            (slot64 << jnp.uint64(6)) | rank.astype(jnp.uint64),
            jnp.uint64(0xFFFFFFFFFFFFFFFF),
        )
        cs = jax.lax.sort(comb)
        grid = (
            pool_rows.astype(jnp.uint64)[:, None] * jnp.uint64(m)
            + jnp.arange(m, dtype=jnp.uint64)[None, :]
        ).reshape(-1)
        bounds = (grid + jnp.uint64(1)) << jnp.uint64(6)
        last = jnp.searchsorted(cs, bounds, side="left", method="sort").astype(jnp.int32) - 1
        got = jnp.take(cs, jnp.maximum(last, 0))
        ok = ((got >> jnp.uint64(6)) == grid) & (last >= 0)
        segmax = jnp.where(ok, got & jnp.uint64(0x3F), 0).astype(jnp.uint8)
        reg = jnp.maximum(reg.reshape(-1), segmax).reshape(pool, m)
        return (reg, kmer_counts, read_counts) + sp

    # large pools: plain 1-D element-gather remap + scatter-max
    prow = jnp.take(lut1d, safe_taxa)
    flat_slot = jnp.where(lanes, prow * m + idx, pm)
    reg_flat = jnp.concatenate([reg.reshape(-1), jnp.zeros(m, jnp.uint8)])
    reg_flat = reg_flat.at[flat_slot].max(jnp.where(lanes, rank, jnp.uint8(0)))
    return (reg_flat[:pm].reshape(pool, m), kmer_counts, read_counts) + sp


_update = functools.partial(
    jax.jit,
    donate_argnums=(0, 1, 2),
    static_argnames=("p", "sparse_cap", "counts_only", "identity_pool"),
)(update_core)


class DeviceCounters:
    def __init__(
        self,
        n_taxa: int,
        p: int = 12,
        pool_dense: np.ndarray | None = None,
        sparse_cap: int = 1 << 17,
        counts_only: bool = False,
        host_stats: bool = False,
    ):
        """pool_dense: the dense taxon ids that can ever be COUNTED -- the
        distinct database values (misses count under 0). None falls back to
        the full taxonomy (small taxonomies only). sparse_cap: per-span
        buffer slots for the sparse-exact stats (0 = estimate-compat only,
        no sparse tracking). counts_only: accumulate read/k-mer counters but
        no HLL registers (--exact mode: the distinct-k-mer sets fold on host
        while the counters stay device-resident). host_stats: keep the
        sparse-regime tracking but compute the per-span stats on HOST from
        the fetched planes -- still bit-exact, used when ids exceed the
        device packing's 2^25 taxon field (sparse_exact.TAXON_BITS)."""
        self.p = p
        self.m = 1 << p
        self.n_taxa = n_taxa
        self.counts_only = counts_only
        self.host_stats = host_stats and not counts_only
        self.sparse_cap = 0 if (counts_only or self.host_stats) else sparse_cap
        sparse_cap = self.sparse_cap
        self.tracker = (
            SparseTracker() if (sparse_cap > 0 or self.host_stats) else None
        )
        if counts_only:
            pool = np.zeros(1, dtype=np.int64)  # register plane unused
        elif pool_dense is None:
            pool = np.arange(n_taxa, dtype=np.int64)
        else:
            pool = np.unique(np.concatenate([[0], np.asarray(pool_dense, np.int64)]))
        # register rows == id space (value-pool mode): registers update by
        # direct scatter-max instead of the sort+probe translation
        self.identity_pool = (
            not counts_only and pool_dense is None and len(pool) == n_taxa
        )
        self.pool = pool
        lut = np.zeros(n_taxa, dtype=np.int32)  # unpooled taxa alias row 0
        lut[pool] = np.arange(len(pool), dtype=np.int32)
        # row 0 is the taxid-0 (miss) row, so an aliased write is impossible:
        # only counted taxa reach the register update and every counted taxon
        # is in the pool by construction
        self.pool_maps = (
            jnp.asarray(pool.astype(np.int32)),
            jnp.asarray(lut),
        )
        self.reg = jnp.zeros((len(pool), self.m), dtype=jnp.uint8)
        self.kmer_counts = jnp.zeros(n_taxa, dtype=jnp.int64)
        self.read_counts = jnp.zeros(n_taxa, dtype=jnp.int64)

    def state(self):
        return self.reg, self.kmer_counts, self.read_counts

    def set_state(self, state) -> None:
        self.reg, self.kmer_counts, self.read_counts = state

    def update(
        self, taxa_dense, enc, hll_lanes, call_dense, row_valid, unit_id=None
    ) -> None:
        """Standalone (non-fused) update: python and mesh paths. Consumes the
        sparse-exact buffer synchronously (these paths fetch per-unit
        anyway); the native path fuses update_core into the classify program
        and defers the buffer fetch to span finish instead."""
        if self.tracker is not None and unit_id is None:
            unit_id = np.zeros(int(taxa_dense.shape[0]), np.uint8)
        if self.host_stats:
            self.consume_host(
                np.asarray(taxa_dense),
                np.asarray(enc),
                np.asarray(hll_lanes),
                unit_bounds=None,
                unit_id=np.asarray(unit_id),
            )
        out = _update(
            self.reg,
            self.kmer_counts,
            self.read_counts,
            self.pool_maps,
            taxa_dense,
            enc,
            hll_lanes,
            call_dense,
            row_valid,
            self.p,
            unit_id,
            self.sparse_cap if self.tracker is not None else 0,
            self.counts_only,
            self.identity_pool,
        )
        self.reg, self.kmer_counts, self.read_counts = out[:3]
        if self.tracker is not None and len(out) > 3:
            if not self.consume_sp(out[3:]):
                # buffer overflow: redo the span's stats on host from the
                # full planes (rare; these paths still hold them)
                self.consume_host(
                    np.asarray(taxa_dense),
                    np.asarray(enc),
                    np.asarray(hll_lanes),
                    unit_bounds=None,
                    unit_id=np.asarray(unit_id),
                )

    def consume_sp(self, sp) -> bool:
        """Fold one device sparse-stats buffer, fetching only its USED
        prefix (the cap can be large without a per-span transfer cost);
        False = overflow, the caller must fall back to host stats."""
        buf, n_p, n_e = sp
        n_p, n_e = int(n_p), int(n_e)
        if n_p + n_e > buf.shape[0]:
            self.tracker.overflows += 1
            return False
        return self.tracker.consume_buffer(
            np.asarray(buf[: n_p + n_e]), n_p, n_e
        )

    def consume_host(
        self, taxa_dense, enc, hll_lanes, unit_bounds=None, unit_id=None
    ) -> None:
        """Host-side sparse stats for one span (overflow fallback)."""
        th = self.m // 4
        if unit_bounds is None:
            ub = [0]
            u = np.asarray(unit_id)
            for i in range(1, len(u)):
                if u[i] != u[i - 1]:
                    ub.append(i)
            ub.append(len(u))
            unit_bounds = ub
        self.tracker.add(
            *sparse_stats_host(taxa_dense, enc, hll_lanes, unit_bounds, th)
        )

    def finalize(self, taxid_of_dense: np.ndarray) -> dict[int, ReadCounts]:
        """Fetch the device state and build the taxon_counts map.

        With sparse tracking: taxa that never went dense in any work unit
        get a SPARSE HLL holding the union of their units' distinct
        encodings -- the exact final state the reference's unit-merge fold
        produces (order-independent; see sparse_exact.py module doc)."""
        from ..hll import ExactCounter

        kmer_counts = np.asarray(self.kmer_counts)
        read_counts = np.asarray(self.read_counts)
        active = np.flatnonzero((kmer_counts > 0) | (read_counts > 0))
        pool_row = np.full(self.n_taxa, -1, np.int64)
        pool_row[self.pool] = np.arange(len(self.pool))
        regs_all = np.asarray(self.reg)  # [P, m]: one bulk transfer
        out: dict[int, ReadCounts] = {}
        for dense in active.tolist():
            nk = int(kmer_counts[dense])
            if self.counts_only:
                # --exact: the distinct-k-mer sets fold on host and merge in
                # at write_report; the device state is counters alone
                h = ExactCounter()
            elif self.tracker is not None and dense not in self.tracker.dense_ever:
                h = HLL(self.p, sparse=True)
                h.sparse_set = self.tracker.sparse_set_of(dense)
                h.n_observed = nk
            else:
                h = HLL(self.p, sparse=False)
                r = pool_row[dense]
                h.M = regs_all[r].copy() if r >= 0 else np.zeros(self.m, np.uint8)
                h.n_observed = nk
            rc = ReadCounts(h)
            rc.n_kmers = nk
            rc.n_reads = int(read_counts[dense])
            out[int(taxid_of_dense[dense])] = rc
        return out

"""End-to-end classification driver.

Streams reads in work units (greedy >= unit_size bp, replicating the
deterministic partition of classify.cpp:511-521), pads each unit into a
bucketed (B, LB) batch, runs the jitted device step, and handles text output
and per-taxon accumulation on host.

Two host paths:
  * native (default when the kuniq_native extension is built): work units
    are parsed/encoded/formatted in C++ -- the host never materializes
    per-read Python objects on the hot path
  * pure Python fallback with identical semantics
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..db import DeviceDB, load_database_dir
from ..formats.counts import (
    counts_from_vals,
    read_counts_stream_bugcompat,
    write_counts,
)
from ..formats.seqio import (
    DNASequence,
    format_sequence,
    is_fastq,
    open_maybe_compressed,
    open_output,
    read_fasta,
    read_fastq,
)
from ..formats import read_kdb
from ..report import TaxReport, DEFAULT_COLS, FULL_COLS
from ..taxonomy import Taxonomy
from .accumulate import TaxonCounter
from .device_step import StepConfig, classify_step, probe_chunk
from .output import kraken_line

from .._native_build import ensure_native

_native = ensure_native()  # None -> pure-Python host path

DEF_WORK_UNIT_SIZE = 500_000  # bp, classify.cpp:38
_LINK_WARM = False  # process-wide: the transfer ramp is paid once
_PROFILE = bool(os.environ.get("KRAKENUNIQ_TPU_PROFILE"))
_CHUNK_BYTES = 32 << 20


@dataclasses.dataclass
class ClassifyOptions:
    quick: bool = False
    min_hits: int = 1
    # NOTE (reference bug compatibility): the reference's -p flag sets
    # HLL_PRECISION but that value is never passed to any HLL constructor --
    # every counter is built at the default precision 12
    # (hyperloglogplus.hpp:87, classify.cpp:289,1094). The flag only gates
    # whether unique-k-mer report columns appear. We replicate that: counters
    # always use precision 12 unless `true_hll_precision` is set, which opts
    # into the documented behavior.
    hll_precision: int = 12
    true_hll_precision: bool = False
    exact: bool = False
    only_classified_output: bool = False
    print_sequence: bool = False
    work_unit_size: int = DEF_WORK_UNIT_SIZE
    # device batch width cap; longer reads are chunked with k-1 overlap and
    # resolved on host; composes with --device-counters/--exact (the chunked
    # reads' counts accumulate on host and merge in finalized_counts --
    # tests/test_long_reads.py)
    max_read_len: int = 1 << 15
    min_batch_reads: int = 64  # round B up to a multiple of this
    full_report: bool = False
    report_zeros: bool = False
    print_progress: bool = True
    use_native: bool = True
    # keep the entire taxon_counts state on device and fetch it once at the
    # end (fast mode; see classify/device_counters.py)
    device_counters: bool = False
    # --device-counters sparse-exact buffer slots per span (u64 each). The
    # sparse-regime tracking makes the fast mode BIT-IDENTICAL to the host
    # path (classify/sparse_exact.py); 0 opts out (estimate-level compat,
    # slightly faster). Only the USED prefix of the buffer is fetched, so a
    # large cap costs HBM (8B/slot), not transfer; a span's pair count ~=
    # its counted lanes on taxa that stay under the m/4 sparse threshold
    # within a work unit (the low-abundance tail). A span overflowing the
    # buffer falls back to host stats (counted in
    # dev_counters.tracker.overflows).
    sparse_cap: int = 1 << 21
    # units per device dispatch are grouped up to this; bigger spans amortize
    # fixed per-dispatch transport overhead but pay bucket-padded device time
    # on tail spans (measured best at 65536 with 32MB input chunks)
    device_batch_reads: int = 65536
    max_runs: int = 8  # device-side RLE run slots per read (even; overflow rows re-fetched)
    # per-span taxon dictionary capacity (taxonomies > 65536 nodes AND no
    # value pool); a span touching more distinct taxa than this is
    # re-dispatched on the wide layout. 32768 is far above any observed span.
    dict_capacity: int = 1 << 15
    # value pool (db/pool.py): index the device id space by the database's
    # LCA-closed value set instead of the full taxonomy. On whenever the
    # closure fits u16 (any real database); False forces dense taxonomy ids
    # (+ the per-span local_dict above 65536 nodes) -- the fallback path.
    value_pool: bool = True
    # multi-chip mesh: shard the database by minimizer range over mesh_db
    # devices and the read batch over mesh_data devices (mesh_data * mesh_db
    # <= len(jax.devices())). 1x1 = the single-chip path. Requires a single
    # non-UID database; accumulation runs on host (exact-compat mode).
    mesh_data: int = 1
    mesh_db: int = 1
    # out-of-core (--preload-size): HBM byte budget for resident database
    # tables. When the databases' hash tables exceed it, they are split into
    # minimizer-range chunk tables streamed through HBM serially, with hits
    # folded into a per-span device accumulator (the temporal generalization
    # the reference runs at classify.cpp:566-791). None/0 = everything
    # resident.
    preload_size: int | None = None
    # out-of-core span grouping: spans whose accumulators+inputs fit this
    # budget share one pass of the chunk tables through HBM (the analogue of
    # the reference re-reading all reads per chunk, classify.cpp:587-648)
    ooc_group_bytes: int = 2 << 30
    # double-buffer the chunk stream: plan chunks at HALF the preload
    # budget so the next chunk table uploads while the current one's probes
    # run; total resident bytes stay within --preload-size. Falls back to
    # single-buffering when half the budget cannot hold a legal chunk.
    ooc_double_buffer: bool = True
    # device spans kept in flight: the device crunches the newest span(s)
    # while the host formats/fetches the oldest; deeper pipelines hide more
    # transfer latency at the cost of per-span output buffers staying live
    pipeline_depth: int = 3
    # multi-host (DCN) input sharding: this process handles global device
    # spans s with s % n_hosts == host_id (parallel/multihost.py). The
    # kraken output holds only this host's spans (span_manifest records
    # their global order for the cross-host merge); per-taxon counter state
    # is folded across hosts via finalized_counts()/save_counter_state.
    host_id: int = 0
    n_hosts: int = 1


def _bucket(n: int, lo: int, step: int = 2) -> int:
    """Round a batch dimension up to a padding bucket (geometric by `step`).

    The native span path uses step=8 (buckets 1024 / 8192 / 65536): every
    distinct batch shape is a separate XLA compile, and on a remote-transport
    TPU a fresh classify-program compile can cost tens of seconds -- far more
    than the padded device time + transfer bytes of a coarser bucket (fetches
    are already sliced to an 8192-row grid, so download bytes don't grow)."""
    b = lo
    while b < n:
        b *= step
    return b


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _check_dense_resolve_capacity(t_size: int) -> None:
    """Dense mode packs Euler times into i32 sort keys shifted left 2 below
    a 2^30 sentinel (taxonomy/resolve.py); times run to 2*T, so dense-mode
    tree resolution silently corrupts packed event keys past 2*T = 2^28.
    Every dense-mode entry path runs this guard."""
    if 2 * t_size > (1 << 28):
        raise ValueError(
            f"taxonomy too large for dense-mode tree resolution "
            f"({t_size} nodes; Euler keys need 2*T <= 2^28) -- "
            "use the value pool (default) or split the taxonomy"
        )


def _bucket_len(n: int, lo: int) -> int:
    """Read-length padding bucket: multiples of 32 up to 512 (the W^2 tree
    resolution makes width padding quadratic), then powers of two."""
    if n <= lo:
        return lo
    if n <= 512:
        return (n + 31) // 32 * 32
    b = 512
    while b < n:
        b *= 2
    return b


class Classifier:
    def __init__(
        self,
        db_dirs: list[str],
        options: ClassifyOptions | None = None,
        uid_database: bool = False,
        _shared: "Classifier | None" = None,
    ):
        self.opts = options or ClassifyOptions()
        self.db_dirs = [os.fspath(d) for d in db_dirs]
        self._uid_database = uid_database
        if _shared is not None:
            self._adopt_loaded(_shared)
            self._configure()
            return
        self.taxonomy = Taxonomy.from_taxdb_file(os.path.join(self.db_dirs[0], "taxDB"))
        self.uid_map = None
        if uid_database:
            if self.opts.quick:
                raise ValueError("Quick mode not available when mapping UIDs")
            if len(self.db_dirs) > 1:
                raise ValueError("Cannot use more than one database with UID mapping!")
            from .uid import UidMap

            self.uid_map = UidMap(os.path.join(self.db_dirs[0], "uid_to_taxid.map"))
        self.mesh = None
        self._sharded_planes = None
        self._ooc = None  # list[ChunkedHashDB] in out-of-core mode
        n_md, n_mdb = self.opts.mesh_data, self.opts.mesh_db
        use_mesh = n_md * n_mdb > 1
        ps = self.opts.preload_size or 0

        # kdb pre-reads shared between the pool build and the loaders (the
        # joint pool needs every DB's dense values BEFORE any table is
        # built). Memory discipline: only dense values are retained across
        # DBs; keys/vals are held for at most one DB at a time.
        pre_vd: dict[str, np.ndarray] = {}

        def preload_vd(d: str) -> np.ndarray:
            if d not in pre_vd:
                from ..db.device_db import compute_vals_dense

                _, _, v = read_kdb(
                    os.path.join(
                        d, "uid_database.kdb" if uid_database else "database.kdb"
                    )
                )
                pre_vd[d] = (
                    np.zeros(len(v), np.int32)
                    if uid_database
                    else compute_vals_dense(v, self.taxonomy)
                )
            return pre_vd[d]

        def joint_pool():
            # hierarchical lookups merge into ONE taxon plane
            # (classify.cpp:927-936), so every database's table must speak
            # the same id space: a joint pool over all value sets
            from ..db.pool import build_value_pool

            return build_value_pool(
                [preload_vd(d) for d in self.db_dirs], self.taxonomy
            )

        use_ooc = False
        if ps:
            # resident-vs-stream decision: with a mesh the budget is
            # per-chip, so aggregate capacity is ps * mesh_db (the composed
            # OOC x mesh mode streams chunk GROUPS of mesh_db tables)
            capacity = ps * max(1, n_mdb)
            est_dense = self._estimate_table_bytes(uid_database, pooled=False)
            if est_dense <= capacity:
                use_ooc = False
            else:
                est_pool = self._estimate_table_bytes(uid_database, pooled=True)
                if est_pool > capacity:
                    use_ooc = True
                else:
                    # ambiguous zone: resident only if the value pool
                    # actually builds (closure <= u16) -- build it now from
                    # the dense values (ADVICE r2: the old code assumed the
                    # pool always builds and could overshoot the budget)
                    if self.opts.value_pool and not uid_database:
                        probe_pool = joint_pool()
                        use_ooc = probe_pool is None
                    else:
                        use_ooc = True

        # --- double-buffered chunk streaming (VERDICT r3 #4): when enabled,
        # chunks are planned at HALF the --preload-size budget so TWO chunk
        # tables can be resident at once -- the next chunk's upload overlaps
        # the current chunk's probes (_ooc_probe_group) while the TOTAL
        # resident bytes stay within the user's budget. If the halved budget
        # cannot hold a legal chunk table, fall back to full-budget
        # single-buffered streaming.
        self._ooc_prefetch = False

        def build_ooc_set(load_chunked_db, pool_arg, multiple=1):
            def build(budget):
                ooc = []
                for d in self.db_dirs:
                    vd = pre_vd.get(d)
                    ooc.append(
                        load_chunked_db(
                            d, budget, self.taxonomy, uid_database=uid_database,
                            pool=pool_arg, chunk_multiple=multiple,
                            preloaded=(None, None, None, vd) if vd is not None else None,
                        )
                    )
                if any(c.pool is None for c in ooc) and any(
                    c.pool is not None for c in ooc
                ):
                    ooc = [
                        load_chunked_db(
                            d, budget, self.taxonomy, uid_database=uid_database,
                            pool=None, chunk_multiple=multiple,
                        )
                        for d in self.db_dirs
                    ]
                return ooc

            if self.opts.ooc_double_buffer and ps:
                try:
                    ooc = build(max(ps // 2, 1))
                    self._ooc_prefetch = True
                    return ooc
                except ValueError:
                    self._ooc_prefetch = False
            return build(ps)

        if use_ooc and not use_mesh:
            from ..db.chunked import load_chunked_db

            pool_arg = "auto" if self.opts.value_pool else None
            if len(self.db_dirs) > 1 and pool_arg == "auto" and not uid_database:
                pool_arg = joint_pool()
            self._ooc = build_ooc_set(load_chunked_db, pool_arg)
            self._pool = self._ooc[0].pool
            ks = {cdb.k for cdb in self._ooc}
            if len(ks) != 1:
                raise ValueError(f"Different k-mer sizes in databases: {sorted(ks)}")
            self.k = self._ooc[0].k
            self.nt = self._ooc[0].nt
            self.dbs = []
        elif use_ooc and use_mesh:
            # composed mode: chunk tables planned at the PER-CHIP budget,
            # streamed through the mesh in groups of mesh_db (one chunk per
            # db-shard at a time); hits psum-merge within a group and fold
            # into the span accumulator across groups. The spatial and
            # temporal generalizations of classify.cpp:566-791 compose.
            from ..db.chunked import load_chunked_db
            from ..parallel import make_mesh

            pool_arg = "auto" if self.opts.value_pool else None
            if len(self.db_dirs) > 1 and pool_arg == "auto" and not uid_database:
                pool_arg = joint_pool()
            self._ooc = build_ooc_set(load_chunked_db, pool_arg, multiple=n_mdb)
            self._pool = self._ooc[0].pool
            ks = {cdb.k for cdb in self._ooc}
            if len(ks) != 1:
                raise ValueError(f"Different k-mer sizes in databases: {sorted(ks)}")
            self.k = self._ooc[0].k
            self.nt = self._ooc[0].nt
            self.dbs = []
            self.mesh = make_mesh(n_md, n_mdb)
        elif use_mesh:
            import jax as _jax

            from ..db.ht_cache import load_ht_cache, save_ht_cache
            from ..formats import read_index
            from ..parallel import make_mesh
            from ..parallel.partition import ShardedHashPlanes, shard_hash_tables

            self._sharded_planes = []
            self._mesh_vals_dense: list = []  # per-DB host dense values (counts files)
            ks, nts, max_bins = set(), set(), []
            # joint value pool across the hierarchy (one id space on device);
            # the pool needs only the dense values, so keys/vals are read
            # per-DB inside the build loop and released as each shard stack
            # is built (ADVICE r2: holding every DB's kdb arrays at once)
            self._pool = None
            if not uid_database and self.opts.value_pool:
                self._pool = joint_pool()
            pool_rows = None if self._pool is None else self._pool.rows
            for d in self.db_dirs:
                kdb_name = "uid_database.kdb" if uid_database else "database.kdb"
                kdb_path = os.path.join(d, kdb_name)
                taxdb_path = os.path.join(d, "taxDB")
                _idx_type, nt, h_offsets = read_index(os.path.join(d, "database.idx"))
                nts.add(nt)
                max_bins.append(
                    int(np.diff(np.asarray(h_offsets, dtype=np.int64)).max())
                )
                from ..formats.kdb import read_header

                ks.add(read_header(kdb_path).k)
                # shard-stacked tables get their own cache file per shard count
                sht_path = f"{kdb_path}.ht{n_mdb}"
                cached = load_ht_cache(sht_path, kdb_path, taxdb_path, uid_database)
                if cached is not None and cached[2] and "bounds" in cached[2]:
                    extra = cached[2]
                    c_rows = extra.get("pool_rows")
                    if (c_rows is None) != (pool_rows is None) or (
                        pool_rows is not None
                        and not np.array_equal(np.asarray(c_rows), pool_rows)
                    ):
                        cached = None  # value-space mismatch: rebuild
                if cached is not None and cached[2] and "bounds" in cached[2]:
                    planes_host, lb, extra = cached
                    sp = ShardedHashPlanes(
                        planes=tuple(_jax.device_put(p) for p in planes_host),
                        lb=lb,
                        bounds=[tuple(b) for b in extra["bounds"]],
                        store_raw=uid_database,
                    )
                    h_vd = pre_vd.pop(d, None)
                    if h_vd is None and not uid_database:
                        h_vd = preload_vd(d)
                        pre_vd.pop(d, None)
                    self._mesh_vals_dense.append(None if uid_database else h_vd)
                else:
                    _hdr, h_keys, h_vals = read_kdb(kdb_path)
                    h_vd = pre_vd.pop(d, None)
                    if h_vd is None:
                        if uid_database:
                            h_vd = np.zeros(len(h_vals), np.int32)
                        else:
                            from ..db.device_db import compute_vals_dense

                            h_vd = compute_vals_dense(h_vals, self.taxonomy)
                    self._mesh_vals_dense.append(None if uid_database else h_vd)
                    table_vals = (
                        self._pool.pool_index(h_vd) if self._pool is not None else h_vd
                    )
                    sink: list = []
                    sp = shard_hash_tables(
                        h_keys, h_vals, table_vals, np.asarray(h_offsets), n_mdb,
                        hash_sink=sink, store_raw=uid_database,
                    )
                    del h_keys, h_vals, table_vals  # release before the next DB
                    host_stacks, lb, bounds = sink[0]
                    extra = {"bounds": [list(b) for b in bounds]}
                    if pool_rows is not None:
                        extra["pool_rows"] = pool_rows
                    save_ht_cache(
                        sht_path, host_stacks, lb, kdb_path, taxdb_path, uid_database,
                        extra=extra,
                    )
                self._sharded_planes.append(sp)
            if len(ks) != 1:
                raise ValueError(f"Different k-mer sizes in databases: {sorted(ks)}")
            if len(nts) != 1:
                raise ValueError(f"Different minimizer sizes in databases: {sorted(nts)}")
            self.mesh = make_mesh(n_md, n_mdb)
            self.dbs = []
            self.k, self.nt = ks.pop(), nts.pop()
            self._mesh_n_iter = max(
                1, int(np.ceil(np.log2(max(max_bins) + 1))) + 1
            )
        else:
            self.dbs: list[DeviceDB] = []
            pool_arg = "auto" if self.opts.value_pool else None
            if len(self.db_dirs) > 1 and pool_arg == "auto" and not uid_database:
                pool_arg = joint_pool()  # None if closure > u16
            for d in self.db_dirs:
                vd = pre_vd.pop(d, None)
                db, _ = load_database_dir(
                    d, taxonomy=self.taxonomy, uid_database=uid_database,
                    pool=pool_arg,
                    preloaded=(None, None, None, vd) if vd is not None else None,
                )
                self.dbs.append(db)
            if any(db.pool is None for db in self.dbs) and any(
                db.pool is not None for db in self.dbs
            ):
                # a bsearch fallback dropped one DB's pool; mixed id spaces
                # are invalid -- reload everything dense (rare failure path)
                self.dbs = [
                    load_database_dir(
                        d, taxonomy=self.taxonomy, uid_database=uid_database,
                        pool=None,
                    )[0]
                    for d in self.db_dirs
                ]
            ks = {db.k for db in self.dbs}
            if len(ks) != 1:
                raise ValueError(f"Different k-mer sizes in databases: {sorted(ks)}")
            self.k = self.dbs[0].k
            nts = {db.nt for db in self.dbs}
            if len(nts) != 1:
                raise ValueError(f"Different minimizer sizes in databases: {sorted(nts)}")
            self.nt = self.dbs[0].nt
            self._pool = self.dbs[0].pool
        self._configure()

    @classmethod
    def with_shared_db(
        cls, other: "Classifier", options: ClassifyOptions
    ) -> "Classifier":
        """A new Classifier reusing `other`'s loaded database state (host
        arrays AND the uploaded device planes) under different run options.
        The device tables are multi-GB at reference scale -- sharing them is
        the difference between an option swap and a ~90s reload."""
        if (options.mesh_data * options.mesh_db > 1) != (other.mesh is not None):
            raise ValueError("cannot share DB state across mesh configurations")
        if bool(options.preload_size) and other._ooc is None and other.dbs:
            raise ValueError("cannot share resident DB state into out-of-core mode")
        return cls(other.db_dirs, options, other._uid_database, _shared=other)

    def _adopt_loaded(self, other: "Classifier") -> None:
        for name in (
            "taxonomy", "uid_map", "mesh", "_sharded_planes", "_ooc", "dbs",
            "k", "nt", "_pool", "_mesh_vals_dense", "_mesh_n_iter",
            "_mesh_common", "_mesh_dev_planes",
        ):
            if hasattr(other, name):
                setattr(self, name, getattr(other, name))

    def reset_counters(self) -> None:
        """Zero all accumulation state so the same loaded Classifier can run
        another input from scratch (bench warm passes)."""
        self._init_counters()
        self.total_sequences = 0
        self.total_bases = 0
        self.total_classified = 0

    def _configure(self) -> None:
        tax = self.taxonomy
        pool = getattr(self, "_pool", None)
        self._pool = pool
        if pool is not None:
            # pool mode: the device id space is the database's LCA-closed
            # value set (db/pool.py) -- resolve tables are [P]-sized, RLE
            # rows and the HLL feed carry u16 pool ids at any taxonomy size,
            # and the tie-LCA walk runs on the closure parent chain
            self._taxids_host = np.ascontiguousarray(pool.taxids, dtype=np.uint32)
            self._taxid_table = jax.device_put(pool.taxids)
            self._tin = jax.device_put(pool.tin)
            self._tout = jax.device_put(pool.tout)
            self._parent = jax.device_put(pool.parent)
            self._root_dense = np.int32(pool.root)
            step_depth = pool.max_depth
        else:
            _check_dense_resolve_capacity(tax.size)
            self._taxids_host = np.ascontiguousarray(tax.taxids, dtype=np.uint32)
            self._taxid_table = jax.device_put(tax.taxids.astype(np.uint32))
            self._tin = jax.device_put(tax.tin)
            self._tout = jax.device_put(tax.tout)
            self._parent = jax.device_put(tax.parent)
            self._root_dense = np.int32(
                tax.dense_index(np.asarray([1], dtype=np.uint32))[0]
            )
            step_depth = tax.max_depth
        if self._ooc is not None:
            use_hash = False
            lookup_mode = "acc"
            hash_lbs = ()
            raw_dbs = tuple(cdb.store_raw for cdb in self._ooc)
            self._db_planes = None  # chunk tables stream through _ooc_probe
        elif self.mesh is not None:
            use_hash = True
            lookup_mode = "hash"
            hash_lbs = ()
            raw_dbs = ()
            self._db_planes = None  # lookups go through the sharded fns
        else:
            use_hash = all(db.hash_table is not None for db in self.dbs)
            lookup_mode = "hash" if use_hash else "bsearch"
            hash_lbs = tuple(db.hash_lb for db in self.dbs) if use_hash else ()
            raw_dbs = tuple(db.store_raw for db in self.dbs) if use_hash else ()
            if use_hash:
                self._db_planes = tuple(db.hash_table for db in self.dbs)
            else:
                self._db_planes = tuple(
                    (db.keys, db.vals, db.vals_dense, db.offsets, db.bin_start)
                    for db in self.dbs
                )
        effective_p = self.opts.hll_precision if self.opts.true_hll_precision else 12
        self._cfg = StepConfig(
            k=self.k,
            nt=self.nt,
            n_iter=(
                1
                if self._ooc is not None
                else self._mesh_n_iter
                if self.mesh is not None
                else max(db.search_iters for db in self.dbs)
            ),
            max_depth=step_depth,
            hll_p=effective_p,
            quick=self.opts.quick,
            min_hits=self.opts.min_hits,
            with_kmers=self.opts.exact,
            max_runs=(
                self.opts.max_runs + (self.opts.max_runs & 1)  # even (paired u16 lens)
                if (_native is not None and self.opts.use_native)
                else 0
            ),
            lookup_mode=lookup_mode,
            hash_lbs=hash_lbs,
            raw_dbs=raw_dbs,
        )
        # compact RLE rows (dense taxon ids, 40B/read): the device->host link
        # is the pipeline bottleneck, so fetch bytes are the cost model; UID
        # runs carry uids (not taxa) and stay on the wide layout. Taxonomies
        # past 65536 nodes (the real NCBI taxDB is ~2.4M) keep the compact
        # layout through a per-span local taxon dictionary (device_step.py).
        if self._cfg.max_runs > 0 and self.uid_map is None:
            if pool is not None or tax.size <= 0xFFFF:
                # pool ids / dense ids AND the u16 sentinel fit as-is
                self._cfg = dataclasses.replace(self._cfg, dense_runs=True)
            else:
                # per-span taxon dictionary; under a mesh the per-data-shard
                # dictionaries are all_gathered into one span-global lut
                # (device_step.py), so the host contract is unchanged
                self._cfg = dataclasses.replace(
                    self._cfg,
                    dense_runs=True,
                    local_dict=True,
                    dict_capacity=self.opts.dict_capacity,
                )
        # the native span path ships bit-packed codes/ambig (5x fewer bytes)
        # and materializes only the outputs its mode reads back (each dropped
        # output saves dispatch-time buffer registration and lets XLA DCE the
        # phase that produced it)
        # non-UID modes carry taxa_dense (the original-id "taxa" plane costs
        # a ~90ms full-batch element-gather to materialize; overflow rows are
        # mapped back through taxid_table on host)
        # device-counters sparse tracking: ids past the device packing's
        # 2^25 taxon field fall back to HOST-computed per-span stats --
        # slower (three extra planes fetched) but still bit-exact
        from .sparse_exact import TAXON_BITS

        self._dc_host_stats = False
        if (
            self.opts.device_counters
            and not self.opts.exact
            and self.opts.sparse_cap > 0
        ):
            if self.uid_map is not None:
                too_big = len(self.uid_map) + 1 >= (1 << TAXON_BITS)
            else:
                too_big = pool is None and tax.size >= (1 << TAXON_BITS)
            if too_big:
                self._dc_host_stats = True
                print(
                    "note: id space exceeds the device sparse-stats packing "
                    f"(2^{TAXON_BITS}); sparse-regime tracking runs on host "
                    "(slower, still bit-exact)",
                    file=sys.stderr,
                )
        if self._cfg.max_runs > 0:
            if self.uid_map is not None:
                # with device counters the uid-keyed accumulation is fused
                # into the dispatch; only the planes the host still reads
                # (uid resolve + RLE overflow) come back
                if self.opts.device_counters:
                    span_outputs = ("packed", "taxa", "ambig")
                    if self.mesh is not None or self._dc_host_stats:
                        span_outputs = span_outputs + ("enc", "hll_lanes")
                else:
                    span_outputs = ("packed", "taxa", "ambig", "hll_pairs")
            elif self.opts.exact:
                # the distinct-k-mer sets always fold on host from the canon
                # plane; device counters (counts-only) ride the same dispatch
                span_outputs = ("packed", "taxa", "ambig", "hll_lanes", "canon")
                if self.opts.device_counters and self.mesh is not None:
                    span_outputs = span_outputs + ("taxa_dense", "enc", "call_dense")
            elif self.opts.device_counters:
                span_outputs = ("packed", "taxa_dense", "ambig")
                if self.mesh is not None:
                    # mesh runs the counter update as a separate program on
                    # the sharded outputs (no fused classify_and_count)
                    span_outputs = span_outputs + ("enc", "hll_lanes", "call_dense")
                elif self._dc_host_stats:
                    span_outputs = span_outputs + ("enc", "hll_lanes")
            elif self._cfg.dense_runs:
                span_outputs = ("packed", "taxa_dense", "ambig", "hll_enc", "hll_dense")
            else:
                span_outputs = ("packed", "taxa_dense", "ambig", "hll_pairs")
            if self._cfg.local_dict and self._cfg.dense_runs:
                span_outputs = span_outputs + ("lut",)
        else:
            span_outputs = None
        self._cfg_packed = dataclasses.replace(
            self._cfg, packed_input=True, outputs=span_outputs
        )
        # dictionary-overflow fallback program: the same span on the wide
        # (global-id) layout; compiled only if a span ever touches more than
        # dict_capacity distinct taxa
        self._cfg_packed_wide = None
        if self._cfg_packed.local_dict and span_outputs is not None:
            wide_outputs = tuple(
                k for k in span_outputs if k not in ("hll_enc", "hll_dense", "lut")
            )
            if "hll_enc" in span_outputs:
                wide_outputs = wide_outputs + ("hll_pairs",)
            self._cfg_packed_wide = dataclasses.replace(
                self._cfg_packed,
                dense_runs=False,
                local_dict=False,
                outputs=wide_outputs,
            )
        # sparse-exact overflow fallback: re-run the span for the full
        # per-lane feed and compute the unit stats on host (rare); UID runs
        # track in raw-uid space, so the raw plane comes back instead
        self._fb_id_key = "taxa" if self.uid_map is not None else "taxa_dense"
        self._cfg_sparse_fb = dataclasses.replace(
            self._cfg_packed, outputs=(self._fb_id_key, "enc", "hll_lanes")
        )
        self._sharded_fn = self._sharded_fn_packed = None
        self._sharded_fn_long = None  # long-read (lookup-only) program, lazy
        self._sharded_probe_fns = {}  # (db_i, packed) -> jitted probe fn
        if self.mesh is not None:
            # id-space tables for the sharded program: pool arrays when the
            # value pool engaged (the host-side copies of _taxid_table etc.)
            if self._pool is not None:
                self._mesh_common = (
                    self._pool.taxids,
                    self._pool.tin,
                    self._pool.tout,
                    self._pool.parent,
                    self._root_dense,
                )
            else:
                self._mesh_common = (
                    tax.taxids.astype(np.uint32),
                    tax.tin,
                    tax.tout,
                    tax.parent,
                    self._root_dense,
                )
            if self._ooc is not None:
                # composed OOC x mesh: the finish pass is the acc-mode
                # classify program; probe programs are built lazily per
                # (database, packedness) in _mesh_probe_fn
                from ..parallel.mesh import make_sharded_acc_classify_fn

                self._sharded_fn_packed = make_sharded_acc_classify_fn(
                    self.mesh, *self._mesh_common, self._cfg_packed
                )
                self._sharded_fn = make_sharded_acc_classify_fn(
                    self.mesh, *self._mesh_common, self._cfg
                )
            else:
                from ..parallel import make_sharded_classify_fn

                self._sharded_fn_packed, self._mesh_dev_planes = make_sharded_classify_fn(
                    self.mesh,
                    self._sharded_planes,
                    *self._mesh_common,
                    self._cfg_packed,
                    dev_planes=getattr(self, "_mesh_dev_planes", None),
                )
                self._sharded_fn, _ = make_sharded_classify_fn(
                    self.mesh,
                    self._sharded_planes,
                    *self._mesh_common,
                    self._cfg,
                    dev_planes=self._mesh_dev_planes,
                )
        self._effective_p = effective_p
        self._init_counters()
        self.total_sequences = 0
        self.total_bases = 0
        self.total_classified = 0

    def _init_counters(self) -> None:
        effective_p = self._effective_p
        pool, tax = self._pool, self.taxonomy
        self.counter = TaxonCounter(effective_p, exact=self.opts.exact)
        self.dev_counters = None
        if self.opts.device_counters:
            from .device_counters import DeviceCounters
            from .sparse_exact import TAXON_BITS

            sparse_cap = self.opts.sparse_cap
            if self.opts.exact:
                # --exact x --device-counters: read/k-mer counters accumulate
                # on device; the khset-equivalent distinct-k-mer sets fold on
                # host from the canon plane the exact path fetches anyway
                # (classify.cpp:44-56 runs exact counting in every mode)
                n = pool.size if pool is not None else tax.size
                self.dev_counters = DeviceCounters(
                    n, effective_p, counts_only=True
                )
            elif self._uid_database:
                # UID databases: k-mer counters and registers key on the RAW
                # stored uid (the reference counts under the uid value,
                # classify.cpp:939,953-959); read counts key on the
                # host-resolved taxid and fold through self.counter
                n_uid = len(self.uid_map) + 1
                uid_vals = self._uid_value_set()
                self.dev_counters = DeviceCounters(
                    n_uid, effective_p, pool_dense=uid_vals,
                    sparse_cap=sparse_cap, host_stats=self._dc_host_stats,
                )
            elif pool is not None:
                # pool mode: the device id space IS the value closure --
                # registers and counters are pool-width, the remap is the
                # identity, and bincounts run at length P instead of T
                self.dev_counters = DeviceCounters(
                    pool.size, effective_p, sparse_cap=sparse_cap
                )
            else:
                # registers only ever accumulate under DB values; restrict
                # the plane to the value set so it scales with the database,
                # not the taxonomy (a 2.4M-node taxDB would otherwise cost
                # 10GB of HBM)
                if self._ooc is not None:
                    vds = [c.vals_dense for c in self._ooc]
                elif self.mesh is not None:
                    vds = self._mesh_vals_dense
                else:
                    vds = [np.asarray(db.vals_dense) for db in self.dbs]
                reg_pool = np.unique(
                    np.concatenate([np.unique(v) for v in vds if v is not None])
                )
                self.dev_counters = DeviceCounters(
                    tax.size, effective_p, pool_dense=reg_pool,
                    sparse_cap=sparse_cap, host_stats=self._dc_host_stats,
                )

    def _round_mesh(self, b: int) -> int:
        """Round a batch height up so it splits evenly over mesh_data shards
        (any count, not just powers of two)."""
        n_md = self.opts.mesh_data
        return b if n_md <= 1 else _round_up(b, n_md)

    # ------------------------------------------------------------ out-of-core

    def _uid_value_set(self) -> np.ndarray:
        """Distinct raw uid values stored in the UID database (bounds the
        device register plane)."""
        if self.dbs:
            return np.unique(np.asarray(self.dbs[0].vals))
        _, _, vals = read_kdb(os.path.join(self.db_dirs[0], "uid_database.kdb"))
        return np.unique(vals)

    def _estimate_table_bytes(self, uid_database: bool, pooled: bool = True) -> int:
        """Resident-table HBM estimate across databases, from the kdb headers
        alone (dense values are bounded by the taxonomy size). `pooled`
        narrows the value field to the pool cap -- valid only if the value
        pool actually builds; callers in the ambiguous zone must check both
        estimates (ADVICE r2)."""
        from ..db.chunked import table_bytes
        from ..db.pool import POOL_CAP
        from ..formats.kdb import read_header

        max_val = self.taxonomy.size - 1
        if pooled and self.opts.value_pool and not uid_database:
            max_val = min(max_val, POOL_CAP)  # pool mode narrows the value field
        total = 0
        for d in self.db_dirs:
            name = "uid_database.kdb" if uid_database else "database.kdb"
            hdr = read_header(os.path.join(d, name))
            total += table_bytes(hdr.key_ct, max_val, uid_database)
        return total

    def _probe_cfg(self, db_i: int, packed: bool) -> "StepConfig":
        """Static config for probe_chunk against database db_i's chunks."""
        cdb = self._ooc[db_i]
        return StepConfig(
            k=self.k,
            nt=self.nt,
            n_iter=1,
            max_depth=self.taxonomy.max_depth,
            lookup_mode="hash",
            hash_lbs=(cdb.lb,),
            raw_dbs=(cdb.store_raw,),
            packed_input=packed,
        )

    def _mesh_probe_fn(self, db_i: int, packed: bool):
        """Lazily-compiled sharded probe program for database db_i's chunk
        groups (OOC x mesh)."""
        key = (db_i, packed)
        if key not in self._sharded_probe_fns:
            from ..parallel.mesh import make_sharded_probe_fn

            cdb = self._ooc[db_i]
            self._sharded_probe_fns[key] = make_sharded_probe_fn(
                self.mesh,
                self._probe_cfg(db_i, packed),
                tuple(p.ndim for p in cdb.chunk_planes[0]),
            )
        return self._sharded_probe_fns[key]

    def _ooc_probe_group(self, spans: list, packed: bool) -> None:
        """Stream every chunk table through HBM ONCE for a group of spans:
        the outer-chunk/inner-reads loop of classify.cpp:587-648, with the
        on-disk hit merge replaced by a donated device accumulator. Each
        entry of `spans` is a dict with codes/ambig/lengths device arrays and
        an `acc` that this fills.

        Under a mesh, chunks stream in GROUPS of mesh_db -- one chunk per
        db-shard resident simultaneously, probed with a psum merge -- so the
        temporal loop shortens by the mesh width while each span batch stays
        data-sharded (the OOC x mesh composition)."""
        mesh = self.mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            acc_sh = NamedSharding(mesh, P("data", None))
        for st in spans:
            if st["acc"] is None:
                b = st["codes"].shape[0]
                lb_len = st["codes"].shape[1] * 16 if packed else st["codes"].shape[1]
                shape = (b, lb_len - self.k + 1)
                if mesh is not None:
                    st["acc"] = jax.device_put(np.zeros(shape, np.uint32), acc_sh)
                else:
                    st["acc"] = jnp.zeros(shape, jnp.uint32)
        n_g = self.opts.mesh_db if mesh is not None else 1
        for db_i, cdb in enumerate(self._ooc):
            if mesh is None:
                pcfg = self._probe_cfg(db_i, packed)
                # double-buffered stream: device_put is asynchronous, so
                # issuing chunk i+1's upload BEFORE dispatching chunk i's
                # probes overlaps the host->HBM transfer with compute; the
                # chunk planner already halved the budget so both tables fit
                # (ooc_double_buffer). Single-buffered mode uploads lazily.
                n_c = len(cdb.chunk_planes)
                pending = (
                    tuple(jax.device_put(p) for p in cdb.chunk_planes[0])
                    if n_c
                    else None
                )
                for ci in range(n_c):
                    dev = pending
                    if self._ooc_prefetch and ci + 1 < n_c:
                        pending = tuple(
                            jax.device_put(p) for p in cdb.chunk_planes[ci + 1]
                        )
                    elif ci + 1 < n_c:
                        pending = None
                    for st in spans:
                        st["acc"] = probe_chunk(
                            st["acc"], dev, st["codes"], st["ambig"], st["lengths"], pcfg
                        )
                    if pending is None and ci + 1 < n_c:
                        pending = tuple(
                            jax.device_put(p) for p in cdb.chunk_planes[ci + 1]
                        )
                    del dev  # refcount drop; freed once the last probe retires
                continue
            from jax.sharding import NamedSharding, PartitionSpec as P

            fn = self._mesh_probe_fn(db_i, packed)
            n_planes = len(cdb.chunk_planes[0])
            db_shs = [
                NamedSharding(
                    mesh, P("db", *([None] * cdb.chunk_planes[0][p_i].ndim))
                )
                for p_i in range(n_planes)
            ]
            assert len(cdb.chunk_planes) % n_g == 0  # chunk_multiple=n_g
            starts = list(range(0, len(cdb.chunk_planes), n_g))

            def put_group(g):
                group = cdb.chunk_planes[g : g + n_g]
                return tuple(
                    jax.device_put(
                        np.stack([gp[p_i] for gp in group]), db_shs[p_i]
                    )
                    for p_i in range(n_planes)
                )

            # same double-buffering as the single-chip stream, at group
            # granularity: group g+1's (sharded) upload is issued before
            # group g's probes dispatch
            pending = put_group(starts[0]) if starts else None
            for gi, g in enumerate(starts):
                stacked = pending
                pending = (
                    put_group(starts[gi + 1])
                    if self._ooc_prefetch and gi + 1 < len(starts)
                    else None
                )
                for st in spans:
                    st["acc"] = fn(
                        st["acc"], *stacked, st["codes"], st["ambig"], st["lengths"]
                    )
                if pending is None and gi + 1 < len(starts):
                    pending = put_group(starts[gi + 1])
                del stacked

    def _sharded_acc_alt(self, cfg2: "StepConfig"):
        """Lazily-compiled acc-mode sharded finish program for a fallback
        config (OOC x mesh: long reads, wide layout, sparse-stats refetch)."""
        if cfg2 == self._cfg:
            return self._sharded_fn
        if cfg2 == self._cfg_packed:
            return self._sharded_fn_packed
        fns = self.__dict__.setdefault("_sharded_acc_alt_fns", {})
        if cfg2 not in fns:
            from ..parallel.mesh import make_sharded_acc_classify_fn

            fns[cfg2] = make_sharded_acc_classify_fn(
                self.mesh, *self._mesh_common, cfg2
            )
        return fns[cfg2]

    def _ooc_device_step(self, codes, ambig, lengths, cfg: "StepConfig"):
        """Single-span out-of-core step (python/long-read paths): chunk loop
        then the finish pass. The native span path groups spans instead
        (_run_native)."""
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            codes = jax.device_put(codes, NamedSharding(self.mesh, P("data", None)))
            ambig = jax.device_put(ambig, NamedSharding(self.mesh, P("data", None)))
            lengths = jax.device_put(lengths, NamedSharding(self.mesh, P("data")))
        st = {"codes": codes, "ambig": ambig, "lengths": lengths, "acc": None}
        self._ooc_probe_group([st], packed=cfg.packed_input)
        if self.mesh is not None:
            return dict(self._sharded_acc_alt(cfg)(st["acc"], codes, ambig, lengths))
        return classify_step(
            st["acc"],
            self._taxid_table,
            self._tin,
            self._tout,
            self._parent,
            self._root_dense,
            codes,
            ambig,
            lengths,
            cfg,
        )

    # ------------------------------------------------------------ unit input

    def _work_units(self, path: str):
        """Greedy >= unit_size bp batches in read order (classify.cpp:511-521)."""
        fastq = is_fastq(path)
        with open_maybe_compressed(path, "rt") as fh:
            reader = read_fastq(fh) if fastq else read_fasta(fh)
            unit: list[DNASequence] = []
            total_nt = 0
            for dna in reader:
                unit.append(dna)
                total_nt += len(dna.seq)
                if total_nt >= self.opts.work_unit_size:
                    yield unit, fastq
                    unit, total_nt = [], 0
            if unit:
                yield unit, fastq

    def _native_chunks(self, path: str):
        """Parse the input in large byte chunks; yields (buf, offs, multi,
        fastq) containing only complete records."""
        fastq = is_fastq(path)
        with open_maybe_compressed(path, "rb") as fh:
            carry = b""
            while True:
                chunk = fh.read(_CHUNK_BYTES)
                eof = not chunk
                buf = carry + chunk
                if not buf:
                    break
                n, offs, multi = _native.parse_unit(buf, fastq)
                if n == 0:
                    if eof:
                        break
                    carry = buf
                    continue
                if not eof:
                    # drop the last (possibly incomplete) record, carry it over
                    last_start = int(offs[n - 1, 2]) - 1  # hdr_off - 1 ('>'/'@')
                    if n == 1:
                        carry = buf
                        continue
                    offs = offs[: n - 1]
                    carry = buf[last_start:]
                else:
                    carry = b""
                yield buf, offs, multi, fastq
                if eof:
                    break

    # ------------------------------------------------------------- main loop

    def run(
        self,
        input_paths: list[str],
        kraken_fh=None,
        classified_fh=None,
        unclassified_fh=None,
    ) -> None:
        t0 = time.time()
        use_native = (
            _native is not None
            and self.opts.use_native
            and not self.opts.print_sequence  # -s needs Python records
        )
        # global device-span numbering for multi-host input sharding
        # (parallel/multihost.py); continues across input files
        self._span_counter = 0
        self.span_manifest = []  # [(global_span_idx, byte_start, byte_end)]
        for path in input_paths:
            if use_native:
                self._run_native(path, kraken_fh, classified_fh, unclassified_fh)
            else:
                for unit, fastq in self._work_units(path):
                    idx = self._span_counter
                    self._span_counter += 1
                    if idx % self.opts.n_hosts != self.opts.host_id:
                        continue
                    with self._manifest_span(idx, kraken_fh):
                        self._process_unit(
                            unit, fastq, kraken_fh, classified_fh, unclassified_fh
                        )
                    self._progress()
        self._elapsed = time.time() - t0

    def _manifest_span(self, span_idx: int, kraken_fh):
        """Context recording the kraken-output byte range of one global span
        (multi-host merge manifest; no-op single-host or for un-tellable
        sinks)."""
        import contextlib

        @contextlib.contextmanager
        def cm():
            track = self.opts.n_hosts > 1 and kraken_fh is not None
            b0 = None
            if track:
                try:
                    b0 = kraken_fh.tell()
                except (OSError, AttributeError):
                    b0 = None
            yield
            if b0 is not None:
                self.span_manifest.append((span_idx, b0, kraken_fh.tell()))

        return cm()

    def _progress(self):
        if self.opts.print_progress:
            pct = 100.0 * self.total_classified / max(self.total_sequences, 1)
            sys.stderr.write(
                f"\r Processed {self.total_sequences} sequences ({pct:.2f}% classified)"
            )

    # ------------------------------------------------------------ native path

    @property
    def _PIPELINE_DEPTH(self) -> int:
        # spans in flight; absorbs device-link transfer jitter
        return self.opts.pipeline_depth

    def _warm_link(self):
        """Absorb the device link's first-transfer ramp (observed: the first
        sizeable download of a process can stall seconds where the sustained
        rate is ~30MB/s) before it can hit a mid-pipeline fetch. Once per
        process: the ramp is a transport property, not a Classifier one."""
        global _LINK_WARM
        if _LINK_WARM:
            return
        _LINK_WARM = True
        try:
            # pure transfers (device_put + fetch), deliberately compile-free:
            # remote-compile latency is unbounded under contention and would
            # serialize here before the first span
            x = jax.device_put(np.zeros(1 << 20, dtype=np.uint32))  # 4MB
            _ = np.asarray(x)
        except Exception:
            pass

    def _iter_native_spans(self, path):
        """Parse and cut the input into device-batch span descriptors, in
        read order: ("span", buf, span_offs, unit_bounds, fastq), or
        ("fallback", buf, offs, None, fastq) for byte chunks that need Python
        records (multi-line FASTA / overlong reads)."""
        for buf, offs, multi, fastq in self._native_chunks(path):
            overlong = bool((np.abs(offs[:, 5]) > self.opts.max_read_len).any())
            if multi or overlong:
                yield ("fallback", buf, offs, None, fastq)
                continue
            # split records into work units by cumulative sequence length,
            # then group consecutive units into one device dispatch
            seq_lens = offs[:, 5]
            target = self.opts.work_unit_size
            bounds = [0]
            acc = 0
            for i in range(len(offs)):
                acc += int(seq_lens[i])
                if acc >= target:
                    bounds.append(i + 1)
                    acc = 0
            if bounds[-1] != len(offs):
                bounds.append(len(offs))
            i = 0
            max_reads = self.opts.device_batch_reads
            from .sparse_exact import MAX_UNITS

            while i < len(bounds) - 1:
                j = i + 1
                # cap units per span: sparse-exact group keys carry the unit
                # index in UNIT_BITS bits (sparse_exact.py)
                while (
                    j < len(bounds) - 1
                    and bounds[j + 1] - bounds[i] <= max_reads
                    and j - i < MAX_UNITS
                ):
                    j += 1
                span = offs[bounds[i] : bounds[j]]
                unit_bounds = [b - bounds[i] for b in bounds[i : j + 1]]
                yield ("span", buf, span, unit_bounds, fastq)
                i = j

    def _python_fallback_chunk(
        self, buf, offs, fastq, kraken_fh, classified_fh, unclassified_fh
    ) -> None:
        """Route one parsed byte chunk through the Python-record path (rare:
        multi-line FASTA or overlong reads)."""
        from io import StringIO

        text = buf.decode("ascii", "replace")
        reader = read_fastq(StringIO(text)) if fastq else read_fasta(StringIO(text))
        recs = list(reader)[: len(offs)]
        unit: list[DNASequence] = []
        total_nt = 0
        for dna in recs:
            unit.append(dna)
            total_nt += len(dna.seq)
            if total_nt >= self.opts.work_unit_size:
                self._process_unit(unit, fastq, kraken_fh, classified_fh, unclassified_fh)
                unit, total_nt = [], 0
        if unit:
            self._process_unit(unit, fastq, kraken_fh, classified_fh, unclassified_fh)
        self._progress()

    def _run_native(self, path, kraken_fh, classified_fh, unclassified_fh) -> None:
        from collections import deque

        if _PROFILE:
            t_w = time.time()
        self._warm_link()
        if _PROFILE:
            sys.stderr.write(f"\n[warm_link {1e3*(time.time()-t_w):.0f}ms]")
            self._prof_last = time.time()
        if self._ooc is not None:
            return self._run_native_ooc(path, kraken_fh, classified_fh, unclassified_fh)
        pending = deque()  # spans in flight, ordered; bounded by _PIPELINE_DEPTH

        def finish(idx_st):
            idx, st = idx_st
            with self._manifest_span(idx, kraken_fh):
                self._finish_native_span(st, kraken_fh, classified_fh, unclassified_fh)

        for kind, buf, offs, unit_bounds, fastq in self._iter_native_spans(path):
            idx = self._span_counter
            self._span_counter += 1
            if idx % self.opts.n_hosts != self.opts.host_id:
                continue
            if kind == "fallback":
                # flush any in-flight spans first to keep output ordered
                while pending:
                    finish(pending.popleft())
                with self._manifest_span(idx, kraken_fh):
                    self._python_fallback_chunk(
                        buf, offs, fastq, kraken_fh, classified_fh, unclassified_fh
                    )
                continue
            st = self._start_native_span(buf, offs, unit_bounds, fastq)
            pending.append((idx, st))
            # overlap: the device crunches the newest span(s) while the
            # host formats the oldest one
            while len(pending) > self._PIPELINE_DEPTH:
                finish(pending.popleft())
            self._progress()
        while pending:
            finish(pending.popleft())
        self._progress()

    def _run_native_ooc(self, path, kraken_fh, classified_fh, unclassified_fh) -> None:
        """Out-of-core drive: spans accumulate into a group until the group
        budget fills, then every chunk table makes ONE pass through HBM for
        the whole group (classify.cpp:587-648's outer-chunk loop) and the
        group is finished span by span."""
        from collections import deque

        group: list = []  # [(global_span_idx, span state), ...]
        group_bytes = 0

        def finish(idx, st):
            with self._manifest_span(idx, kraken_fh):
                self._finish_native_span(st, kraken_fh, classified_fh, unclassified_fh)

        def flush():
            nonlocal group, group_bytes
            if not group:
                return
            self._ooc_probe_group([st for _i, st in group], packed=True)
            out_q = deque()
            for idx, st in group:
                out_q.append((idx, self._dispatch_ooc_finish(st)))
                while len(out_q) > self._PIPELINE_DEPTH:
                    finish(*out_q.popleft())
            while out_q:
                finish(*out_q.popleft())
            group, group_bytes = [], 0
            self._progress()

        for kind, buf, offs, unit_bounds, fastq in self._iter_native_spans(path):
            idx = self._span_counter
            self._span_counter += 1
            if idx % self.opts.n_hosts != self.opts.host_id:
                continue
            if kind == "fallback":
                flush()  # keep output ordered
                with self._manifest_span(idx, kraken_fh):
                    self._python_fallback_chunk(
                        buf, offs, fastq, kraken_fh, classified_fh, unclassified_fh
                    )
                continue
            st = self._start_ooc_span(buf, offs, unit_bounds, fastq)
            if st is None:
                continue
            group.append((idx, st))
            group_bytes += st["bytes"]
            if group_bytes >= self.opts.ooc_group_bytes:
                flush()
        flush()
        self._progress()

    def _start_native_span(self, buf, offs, unit_bounds, fastq):
        """Encode and dispatch one device batch spanning several work units;
        device-side accumulation is also enqueued here. Returns the state for
        _finish_native_span."""
        opts = self.opts
        n_span = len(offs)
        if n_span == 0:
            return None
        seq_lens = np.ascontiguousarray(offs[:, 5].astype(np.int32))
        max_len = int(seq_lens.max())
        if max_len > opts.max_read_len:
            raise NotImplementedError(
                f"reads longer than {opts.max_read_len} bp are not supported yet"
            )
        lb = _bucket_len(max(max_len, self.k), max(128, self.k))
        # batch height buckets: coarse (x8) to keep the compile-variant count
        # at <= 3 per read-length bucket (see _bucket); rounded so the batch
        # splits evenly over mesh_data shards
        b = self._round_mesh(_bucket(n_span, 1024, step=8))
        offs_c = np.ascontiguousarray(offs)
        t0 = time.time() if _PROFILE else 0
        if _PROFILE:
            gap = t0 - getattr(self, "_prof_last", t0)
            self._prof_last = t0
            sys.stderr.write(f"\n[gap {1e3*gap:.0f}ms]")
        codes, ambig_arr, lengths = _native.encode_unit_packed(buf, offs_c, lb, b)
        t1 = time.time() if _PROFILE else 0
        if self.mesh is not None:
            out = dict(self._sharded_fn_packed(codes, ambig_arr, lengths))
            if self.dev_counters is not None:
                self._mesh_counter_update(out, n_span, b, unit_bounds)
        elif self.dev_counters is not None:
            # accumulation fused into the classify program: one dispatch,
            # scatters overlapped with the lookup gathers. UID runs count
            # k-mers under the raw uid plane and resolve read calls on host,
            # so device-side read counting is disabled (n_valid=0).
            from .device_step import classify_and_count

            out, state, sp = classify_and_count(
                *self.dev_counters.state(),
                self.dev_counters.pool_maps,
                self._db_planes,
                self._taxid_table,
                self._tin,
                self._tout,
                self._parent,
                self._root_dense,
                codes,
                ambig_arr,
                lengths,
                np.int32(0 if self.uid_map is not None else n_span),
                self._unit_id_rows(unit_bounds, b),
                self._cfg_packed,
                self.dev_counters.p,
                self.dev_counters.sparse_cap,
                self.dev_counters.counts_only,
                self.dev_counters.identity_pool,
            )
            self.dev_counters.set_state(state)
            if sp:
                out = dict(out)
                out["_sp"] = sp  # fetched at span finish (overlapped)
        else:
            out = classify_step(
                self._db_planes,
                self._taxid_table,
                self._tin,
                self._tout,
                self._parent,
                self._root_dense,
                codes,
                ambig_arr,
                lengths,
                self._cfg_packed,
            )
        self._slice_and_prefetch(out, b, n_span)
        if _PROFILE:
            t2 = time.time()
            sys.stderr.write(
                f"\n[span b={b} lb={lb}] encode {1e3*(t1-t0):.0f}ms dispatch {1e3*(t2-t1):.0f}ms"
            )

        def redispatch(cfg2):
            # fallback re-dispatch (dictionary overflow -> wide layout,
            # sparse-buffer overflow -> full-feed stats cfg)
            if self.mesh is not None:
                return dict(self._sharded_alt(cfg2)(codes, ambig_arr, lengths))
            return classify_step(
                self._db_planes,
                self._taxid_table,
                self._tin,
                self._tout,
                self._parent,
                self._root_dense,
                codes,
                ambig_arr,
                lengths,
                cfg2,
            )

        return (
            buf, offs_c, unit_bounds, fastq, out, seq_lens, n_span,
            self._cfg_packed, redispatch,
        )

    def _slice_and_prefetch(self, out: dict, b: int, n_span: int) -> None:
        """Fetch only the rows that hold reads: tail spans land in a padded
        height bucket, and transfer bytes -- not device flops -- are the
        span cost. Rows are rounded to a coarse grid so the device-side
        slice program compiles once per (bucket, grid) pair. taxa/ambig
        stay full-height (they are row-gathered on demand). Then force the
        (possibly lazy) transport to start moving the packed matrix now, so
        the host-side finish of the PREVIOUS span genuinely overlaps this
        span's device work."""
        if self._cfg.max_runs > 0:
            fetch_rows = min(b, -(-n_span // 8192) * 8192)
            if fetch_rows < b:
                slice_keys = ("packed", "hll_pairs", "hll_enc", "hll_dense", "hll_lanes", "canon")
                if self.opts.exact:
                    slice_keys = slice_keys + ("taxa",)
                for key in slice_keys:
                    if key in out:
                        out[key] = out[key][:fetch_rows]
        # start D2H for EVERY plane this mode will read, not just the packed
        # matrix: the exact-compat hll feed is ~6B/lane (tens of MB/span)
        # and the device link is the pipeline bottleneck -- with
        # _PIPELINE_DEPTH spans in flight the transfers overlap the newer
        # spans' device time instead of serializing at finish
        keys = ("packed", "hll_pairs", "hll_enc", "hll_dense", "call")
        if self.opts.exact:
            # the exact path reads these planes in full every span; other
            # modes row-gather them on demand (overflow rows only), so
            # forcing their transfer would cost, not save
            keys = keys + ("taxa", "hll_lanes", "canon")
        for key in keys:
            try:
                out[key].copy_to_host_async()
            except (AttributeError, KeyError):
                pass

    def _sharded_alt(self, cfg2: "StepConfig"):
        """Lazily-compiled sharded program for a fallback config (wide
        layout / sparse-stats refetch); cfg2 is frozen, so it keys a cache."""
        fns = self.__dict__.setdefault("_sharded_alt_fns", {})
        if cfg2 not in fns:
            from ..parallel import make_sharded_classify_fn

            fns[cfg2], _ = make_sharded_classify_fn(
                self.mesh,
                self._sharded_planes,
                *self._mesh_common,
                cfg2,
                dev_planes=self._mesh_dev_planes,
            )
        return fns[cfg2]

    def _mesh_counter_update(self, out: dict, n_span: int, b: int, unit_bounds) -> None:
        """Separate counter-update program over the sharded step outputs
        (mesh runs have no fused classify_and_count)."""
        if self.uid_map is not None:
            row_valid = np.zeros(b, dtype=bool)  # read calls resolve on host
            self.dev_counters.update(
                np.asarray(out["taxa"]).astype(np.int32), out["enc"],
                out["hll_lanes"], np.zeros(b, np.int32), row_valid,
                unit_id=self._unit_id_rows(unit_bounds, b),
            )
            return
        row_valid = np.zeros(b, dtype=bool)
        row_valid[:n_span] = True
        self.dev_counters.update(
            out["taxa_dense"], out["enc"], out["hll_lanes"],
            out["call_dense"], row_valid,
            unit_id=self._unit_id_rows(unit_bounds, b),
        )

    @staticmethod
    def _unit_id_rows(unit_bounds, b: int) -> np.ndarray:
        """Per-row work-unit index (uint8 [b]); padded rows inherit the last
        unit (they hold no counted lanes)."""
        ub = np.asarray(unit_bounds, np.int64)
        ids = np.repeat(
            np.arange(len(ub) - 1, dtype=np.uint8), np.diff(ub)
        )
        if len(ids) < b:
            last = ids[-1] if len(ids) else np.uint8(0)
            ids = np.concatenate([ids, np.full(b - len(ids), last, np.uint8)])
        return ids

    def _start_ooc_span(self, buf, offs, unit_bounds, fastq):
        """Encode and upload one span for the out-of-core group; the chunk
        probes and the finish dispatch happen at group flush."""
        n_span = len(offs)
        if n_span == 0:
            return None
        seq_lens = np.ascontiguousarray(offs[:, 5].astype(np.int32))
        max_len = int(seq_lens.max())
        lb = _bucket_len(max(max_len, self.k), max(128, self.k))
        b = self._round_mesh(_bucket(n_span, 1024, step=8))
        offs_c = np.ascontiguousarray(offs)
        codes, ambig_arr, lengths = _native.encode_unit_packed(buf, offs_c, lb, b)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            row_sh = NamedSharding(self.mesh, P("data", None))
            codes_d = jax.device_put(codes, row_sh)
            ambig_d = jax.device_put(ambig_arr, row_sh)
            lengths_d = jax.device_put(lengths, NamedSharding(self.mesh, P("data")))
        else:
            codes_d = jax.device_put(codes)
            ambig_d = jax.device_put(ambig_arr)
            lengths_d = jax.device_put(lengths)
        w = lb - self.k + 1
        return {
            "buf": buf,
            "offs": offs_c,
            "unit_bounds": unit_bounds,
            "fastq": fastq,
            "seq_lens": seq_lens,
            "n_span": n_span,
            "b": b,
            "codes": codes_d,
            "ambig": ambig_d,
            "lengths": lengths_d,
            "acc": None,
            # device bytes this span pins across the chunk loop
            "bytes": codes.nbytes + ambig_arr.nbytes + lengths.nbytes + b * w * 4,
        }

    def _dispatch_ooc_finish(self, st: dict):
        """Run the finish pass (resolve/HLL/RLE from the merged word plane)
        for one probed span; returns the _finish_native_span state tuple."""
        if self.mesh is not None:
            out = dict(
                self._sharded_fn_packed(
                    st["acc"], st["codes"], st["ambig"], st["lengths"]
                )
            )
            if self.dev_counters is not None:
                self._mesh_counter_update(
                    out, st["n_span"], st["b"], st["unit_bounds"]
                )
            self._slice_and_prefetch(out, st["b"], st["n_span"])

            def redispatch_mesh(cfg2):
                return dict(
                    self._sharded_acc_alt(cfg2)(
                        st["acc"], st["codes"], st["ambig"], st["lengths"]
                    )
                )

            return (
                st["buf"], st["offs"], st["unit_bounds"], st["fastq"], out,
                st["seq_lens"], st["n_span"], self._cfg_packed, redispatch_mesh,
            )
        if self.dev_counters is not None:
            from .device_step import classify_and_count

            out, state, sp = classify_and_count(
                *self.dev_counters.state(),
                self.dev_counters.pool_maps,
                st["acc"],
                self._taxid_table,
                self._tin,
                self._tout,
                self._parent,
                self._root_dense,
                st["codes"],
                st["ambig"],
                st["lengths"],
                np.int32(0 if self.uid_map is not None else st["n_span"]),
                self._unit_id_rows(st["unit_bounds"], st["b"]),
                self._cfg_packed,
                self.dev_counters.p,
                self.dev_counters.sparse_cap,
                self.dev_counters.counts_only,
                self.dev_counters.identity_pool,
            )
            self.dev_counters.set_state(state)
            if sp:
                out = dict(out)
                out["_sp"] = sp
        else:
            out = classify_step(
                st["acc"],
                self._taxid_table,
                self._tin,
                self._tout,
                self._parent,
                self._root_dense,
                st["codes"],
                st["ambig"],
                st["lengths"],
                self._cfg_packed,
            )
        self._slice_and_prefetch(out, st["b"], st["n_span"])

        def redispatch(cfg2):
            return classify_step(
                st["acc"],
                self._taxid_table,
                self._tin,
                self._tout,
                self._parent,
                self._root_dense,
                st["codes"],
                st["ambig"],
                st["lengths"],
                cfg2,
            )

        return (
            st["buf"],
            st["offs"],
            st["unit_bounds"],
            st["fastq"],
            out,
            st["seq_lens"],
            st["n_span"],
            self._cfg_packed,
            redispatch,
        )

    def _finish_native_span(self, st, kraken_fh, classified_fh, unclassified_fh):
        if st is None:
            return
        buf, offs_c, unit_bounds, fastq, out, seq_lens, n_span, cfg, redispatch = st
        opts = self.opts

        # id_map: u16 ids in the compact rows / hll_dense feed -> taxids.
        # With a span-local dictionary, fetch it and map through it; a
        # dictionary overflow (span touched > dict_capacity taxa) re-runs
        # the span on the wide layout (rare).
        id_map = self._taxids_host
        if cfg.dense_runs and cfg.local_dict:
            lut = np.asarray(out["lut"])
            n_u = int(lut[-1])
            if n_u > cfg.dict_capacity:
                cfg = self._cfg_packed_wide
                out = dict(redispatch(cfg))
            else:
                id_map = self._taxids_host[lut[:n_u].astype(np.int64)]

        r = cfg.max_runs
        dense = cfg.dense_runs
        compact = dense and not opts.quick
        # compact dense row: runs(R) | call_dense<<16|n_runs;  quick dense
        # row: runs(R) | call | hits<<16|n_runs;  wide row: run_vals(R) |
        # lens2(R/2) | call | n_kmers | meta
        meta0 = r if dense else r + r // 2
        t0 = time.time() if _PROFILE else 0
        packed = np.asarray(out["packed"])[:n_span]
        if _PROFILE:
            sys.stderr.write(f" fetch {1e3*(time.time()-t0):.0f}ms")
        if compact:
            meta_w = packed[:, r]
            calls = id_map[(meta_w >> np.uint32(16)).astype(np.int64)]
            n_runs = meta_w & np.uint32(0xFFFF)
            n_kmers = np.maximum(seq_lens - (self.k - 1), 0).astype(np.int32)
        elif dense:
            calls = packed[:, meta0].copy()
            n_kmers = np.maximum(seq_lens - (self.k - 1), 0).astype(np.int32)
            n_runs = packed[:, meta0 + 1] & np.uint32(0xFFFF)
        else:
            calls = packed[:, meta0].copy()
            n_kmers = packed[:, meta0 + 1].astype(np.int32)
            n_runs = packed[:, meta0 + 2] & np.uint32(0xFFFF)

        if self.uid_map is not None:
            taxa_full = np.asarray(out["taxa"])
            calls = self._resolve_uid_calls(taxa_full, n_kmers, calls, n_span)

        if self.dev_counters is not None:
            # registers/counts accumulated on device at dispatch time; fold
            # in the sparse-exact stats buffer (if tracking is on)
            sp = out.get("_sp")
            if sp is not None:
                if not self.dev_counters.consume_sp(sp):
                    fb = dict(redispatch(self._cfg_sparse_fb))
                    self.dev_counters.consume_host(
                        np.asarray(fb[self._fb_id_key])[:n_span].astype(np.int64),
                        np.asarray(fb["enc"])[:n_span],
                        np.asarray(fb["hll_lanes"])[:n_span],
                        unit_bounds=unit_bounds,
                    )
            if self.dev_counters.host_stats and self.mesh is None:
                # ids exceed the device sparse-stats packing: per-span
                # regime stats computed on host (mesh/python paths consume
                # inside update() instead)
                plane = np.asarray(
                    out["taxa" if self.uid_map is not None else "taxa_dense"]
                )[:n_span].astype(np.int64)
                self.dev_counters.consume_host(
                    plane,
                    np.asarray(out["enc"])[:n_span],
                    np.asarray(out["hll_lanes"])[:n_span],
                    unit_bounds=unit_bounds,
                )
            if opts.exact:
                # device holds the counters; the khset-equivalent sets fold
                # on host from the canon plane (span-wide: set union needs
                # no per-unit structure)
                taxa_full = np.asarray(out["taxa"])[:n_span]
                row_ok = np.asarray(out["hll_lanes"])[:n_span]
                canon = np.asarray(out["canon"])[:n_span]
                self.counter.process_sets(taxa_full[row_ok], canon[row_ok])
            if self.uid_map is not None:
                # read counts key on the host-resolved taxid; fold them
                # through the host counter (merged at write_report)
                self.counter.process_unit(
                    np.empty(0, np.uint32), np.empty(0, np.uint32), calls
                )
        elif opts.exact:
            taxa_full = np.asarray(out["taxa"])
            hll_lanes = np.asarray(out["hll_lanes"])
            canon = np.asarray(out["canon"])
            for s_, e_ in zip(unit_bounds[:-1], unit_bounds[1:]):
                row_ok = hll_lanes[s_:e_]
                self.counter.process_unit(
                    taxa_full[s_:e_][row_ok], canon[s_:e_][row_ok], calls[s_:e_]
                )
        elif dense:
            # per-unit accumulation (preserves work-unit HLL semantics);
            # 6B/lane feed: u32 encodings + u16 dense taxa (0xFFFF sentinel)
            hd = np.asarray(out["hll_dense"])[:n_span]
            he = np.asarray(out["hll_enc"])[:n_span]
            for s_, e_ in zip(unit_bounds[:-1], unit_bounds[1:]):
                m = hd[s_:e_] != np.uint16(0xFFFF)
                counted_taxa = id_map[hd[s_:e_][m].astype(np.int64)]
                self.counter.process_unit(counted_taxa, he[s_:e_][m], calls[s_:e_])
        else:
            # per-unit accumulation (preserves work-unit HLL semantics); the
            # pair id half is a DENSE taxon unless a raw (UID) DB is in play
            pairs = np.asarray(out["hll_pairs"])[:n_span]
            for s_, e_ in zip(unit_bounds[:-1], unit_bounds[1:]):
                flat = pairs[s_:e_].reshape(-1)
                flat = flat[flat != np.uint64(0xFFFFFFFFFFFFFFFF)]
                counted_taxa = (flat >> np.uint64(32)).astype(np.uint32)
                if self.uid_map is None:
                    counted_taxa = self._taxids_host[counted_taxa.astype(np.int64)]
                counted = (flat & np.uint64(0xFFFFFFFF)).astype(np.uint32)
                self.counter.process_unit(counted_taxa, counted, calls[s_:e_])

        if kraken_fh is not None:
            # rows whose run count overflowed the device RLE buffer: gather
            # just those rows on device, transfer them, and format in C++
            if opts.quick:
                ov_rows = np.empty(0, dtype=np.int64)
            else:
                ov_rows = np.flatnonzero(n_runs > r).astype(np.int64)
            ov_lines = []
            if len(ov_rows):
                if "taxa" in out:
                    taxa_rows = np.ascontiguousarray(np.asarray(out["taxa"][ov_rows]))
                else:
                    # dense plane: map the few overflow rows on host
                    dense_rows = np.asarray(out["taxa_dense"][ov_rows])
                    taxa_rows = np.ascontiguousarray(
                        self._taxids_host[dense_rows.astype(np.int64)]
                    )
                ambig_rows = np.ascontiguousarray(
                    np.asarray(out["ambig"][ov_rows]).astype(np.uint8)
                )
                sub = _native.kraken_lines(
                    buf,
                    np.ascontiguousarray(offs_c[ov_rows, 0]),
                    np.ascontiguousarray(offs_c[ov_rows, 1]),
                    np.ascontiguousarray(calls[ov_rows], dtype=np.uint32),
                    np.ascontiguousarray(seq_lens[ov_rows]),
                    np.ascontiguousarray(n_kmers[ov_rows]),
                    taxa_rows,
                    ambig_rows,
                    False,
                    np.ascontiguousarray(n_kmers[ov_rows]),  # hits unused (not quick)
                    False,
                )
                ov_lines = sub.splitlines(keepends=True)
                assert len(ov_lines) == len(ov_rows)
            if self.uid_map is not None:
                packed = packed.copy()
                packed[:, meta0] = calls
            lines = _native.kraken_lines_rle(
                buf,
                np.ascontiguousarray(offs_c[:n_span, 0]),
                np.ascontiguousarray(offs_c[:n_span, 1]),
                np.ascontiguousarray(packed),
                r,
                seq_lens,
                bool(opts.quick),
                bool(opts.only_classified_output),
                ov_rows,
                ov_lines,
                bool(dense),
                self.k,
                id_map if dense else None,
            )
            if hasattr(kraken_fh, "buffer"):
                kraken_fh.buffer.write(lines)
            else:
                try:
                    kraken_fh.write(lines)
                except TypeError:
                    kraken_fh.write(lines.decode())
        if _PROFILE:
            self._prof_last = time.time()
            sys.stderr.write(f" finish {1e3*(self._prof_last-t0):.0f}ms")

        if classified_fh is not None or unclassified_fh is not None:
            for i in range(n_span):
                fh = classified_fh if calls[i] else unclassified_fh
                if fh is None:
                    continue
                hdr = buf[offs_c[i, 2] : offs_c[i, 2] + offs_c[i, 3]].decode()
                seq = buf[offs_c[i, 4] : offs_c[i, 4] + offs_c[i, 5]].decode()
                if fastq:
                    quals = buf[offs_c[i, 6] : offs_c[i, 6] + offs_c[i, 7]].decode()
                    fh.write(f"@{hdr}\n{seq}\n+\n{quals}\n")
                else:
                    fh.write(f">{hdr}\n{seq}\n")

        self.total_classified += int(np.count_nonzero(calls))
        self.total_sequences += n_span
        self.total_bases += int(seq_lens.sum())

    # ------------------------------------------------------------ shared core

    def _device_step(self, codes, ambig, lengths):
        if self._ooc is not None:
            return self._ooc_device_step(codes, ambig, lengths, self._cfg)
        if self.mesh is not None:
            return dict(self._sharded_fn(codes, ambig, lengths))
        return classify_step(
            self._db_planes,
            self._taxid_table,
            self._tin,
            self._tout,
            self._parent,
            self._root_dense,
            codes,
            ambig,
            lengths,
            self._cfg,
        )

    def _resolve_uid_calls(self, taxa, n_kmers, calls, n_unit):
        if self.uid_map is None:
            return calls
        from .uid import resolve_uids

        out = np.empty(n_unit, dtype=np.uint32)
        for i in range(n_unit):
            row = taxa[i, : int(n_kmers[i])]
            hits: dict[int, int] = {}
            for u in row[row != 0].tolist():
                hits[u] = hits.get(u, 0) + 1
            out[i] = resolve_uids(hits, self.uid_map, self.taxonomy.lca_fold)
        return out

    # ---------------------------------------------------------- long reads

    def _classify_long_read(self, seq: str):
        """Classify one read longer than max_read_len: chunk with k-1 overlap,
        run the device step in lookup-only mode, resolve on host.

        Returns (taxa u32[W], ambig bool[W], enc u32[W], call int, hits int,
        processed bool[W], canon u64[W] | None (--exact))."""
        import dataclasses as _dc

        from ..kmer import encode_batch

        k = self.k
        opts = self.opts
        payload = opts.max_read_len - (k - 1)
        starts = list(range(0, max(1, len(seq) - k + 1), payload))
        chunks = [seq[st : st + opts.max_read_len] for st in starts]
        lb = _bucket_len(max(len(c) for c in chunks), max(128, k))
        b = self._round_mesh(_bucket(len(chunks), 8))
        enc_b = encode_batch(chunks, lb=lb, batch=b)
        cfg2 = _dc.replace(self._cfg, resolve=False, max_runs=0, quick=False)
        if self._ooc is not None:
            out = self._ooc_device_step(enc_b.codes, enc_b.ambig, enc_b.lengths, cfg2)
        elif self.mesh is not None:
            if self._sharded_fn_long is None:
                from ..parallel import make_sharded_classify_fn

                self._sharded_fn_long, _ = make_sharded_classify_fn(
                    self.mesh,
                    self._sharded_planes,
                    *self._mesh_common,
                    cfg2,
                    dev_planes=self._mesh_dev_planes,
                )
            out = dict(self._sharded_fn_long(enc_b.codes, enc_b.ambig, enc_b.lengths))
        else:
            out = classify_step(
                self._db_planes,
                self._taxid_table,
                self._tin,
                self._tout,
                self._parent,
                self._root_dense,
                enc_b.codes,
                enc_b.ambig,
                enc_b.lengths,
                cfg2,
            )
        taxa_rows = np.asarray(out["taxa"])
        ambig_rows = np.asarray(out["ambig"])
        enc_rows = np.asarray(out["enc"])
        canon_rows = np.asarray(out["canon"]) if "canon" in out else None
        parts_t, parts_a, parts_e, parts_c = [], [], [], []
        for i, c in enumerate(chunks):
            w = len(c) - k + 1
            parts_t.append(taxa_rows[i, :w])
            parts_a.append(ambig_rows[i, :w])
            parts_e.append(enc_rows[i, :w])
            if canon_rows is not None:
                parts_c.append(canon_rows[i, :w])
        taxa = np.concatenate(parts_t)
        ambig = np.concatenate(parts_a)
        enc = np.concatenate(parts_e)
        canon = np.concatenate(parts_c) if canon_rows is not None else None

        hit = taxa != 0
        if opts.quick:
            cum = np.cumsum(hit)
            reach = np.flatnonzero(cum >= opts.min_hits)
            if len(reach):
                stop = int(reach[0])
                processed = np.zeros(len(taxa), bool)
                processed[: stop + 1] = True
                hits = opts.min_hits
                call = int(taxa[stop])
            else:
                processed = np.ones(len(taxa), bool)
                hits = int(cum[-1]) if len(cum) else 0
                call = 0
        else:
            processed = np.ones(len(taxa), bool)
            hits = int(hit.sum())
            counts: dict[int, int] = {}
            for t in taxa[hit].tolist():
                counts[t] = counts.get(t, 0) + 1
            if self.uid_map is not None:
                from .uid import resolve_uids

                call = int(resolve_uids(counts, self.uid_map, self.taxonomy.lca_fold))
            else:
                call = int(self.taxonomy.resolve_tree_host(counts))
        return taxa, ambig, enc, call, hits, processed, canon

    # ------------------------------------------------------------ python path

    def _process_unit(self, unit, fastq, kraken_fh, classified_fh, unclassified_fh) -> None:
        from ..kmer import encode_batch

        opts = self.opts
        long_idx = {i for i, d in enumerate(unit) if len(d.seq) > opts.max_read_len}
        short_seqs = ["" if i in long_idx else d.seq for i, d in enumerate(unit)]
        max_len = max((len(s) for s in short_seqs), default=1)
        lb = _bucket_len(max(max_len, self.k), max(128, self.k))
        b = self._round_mesh(_bucket(len(unit), opts.min_batch_reads))
        enc = encode_batch(short_seqs, lb=lb, batch=b)

        out = self._device_step(enc.codes, enc.ambig, enc.lengths)
        taxa = np.asarray(out["taxa"])
        ambig = np.asarray(out["ambig"])
        enc_arr = np.asarray(out["enc"])
        hll_lanes = np.asarray(out["hll_lanes"])
        calls = np.asarray(out["call"]).astype(np.uint32)[: len(unit)].copy()
        hits = np.asarray(out["hits"]).astype(np.int64)[: len(unit)].copy()
        n_kmers = np.asarray(out["n_kmers"]).astype(np.int64)[: len(unit)].copy()
        if self.uid_map is not None:
            calls = self._resolve_uid_calls(taxa, n_kmers, calls, len(unit))

        long_results = {}
        for i in sorted(long_idx):
            long_results[i] = self._classify_long_read(unit[i].seq)
            calls[i] = long_results[i][3]
            hits[i] = long_results[i][4]
            n_kmers[i] = len(long_results[i][0])

        # per-taxon accumulation in read order (work-unit HLL semantics).
        # Sparse-exact + long reads: the unit's short and long lanes must
        # land in ONE unit-local counter per taxon for the sparse/dense
        # decision to match the reference, so such units route entirely
        # through the host counter (merged into the device state at
        # write_report -- the final HLL fold is order-independent, see
        # sparse_exact.py).
        use_dev = self.dev_counters is not None and not (
            long_idx and self.dev_counters.tracker is not None
        )
        if use_dev:
            b_rows = out["call_dense"].shape[0]
            if self.uid_map is not None:
                # k-mer counters/registers key on the raw uid plane; read
                # calls resolve on host and fold through self.counter
                self.dev_counters.update(
                    np.asarray(out["taxa"]).astype(np.int32), out["enc"],
                    out["hll_lanes"], np.zeros(b_rows, np.int32),
                    np.zeros(b_rows, dtype=bool),
                )
                self.counter.process_unit(
                    np.empty(0, np.uint32), np.empty(0, np.uint32), calls
                )
            else:
                row_valid = np.zeros(b_rows, dtype=bool)
                row_valid[: len(unit)] = True
                for i in long_idx:
                    # long reads accumulate through the host-side counter below
                    # (their lanes live in chunk rows, not this unit's planes);
                    # their zero-length placeholder rows hold no counted lanes
                    row_valid[i] = False
                self.dev_counters.update(
                    out["taxa_dense"], out["enc"], out["hll_lanes"], out["call_dense"], row_valid
                )
            if opts.exact:
                # device holds counters; distinct sets fold on host
                short_ok = hll_lanes[: len(unit)].copy()
                for i in long_idx:
                    short_ok[i] = False
                canon_out = np.asarray(out["canon"])[: len(unit)]
                self.counter.process_sets(
                    taxa[: len(unit)][short_ok], canon_out[short_ok]
                )
            for i in sorted(long_idx):
                t_l, a_l, e_l, call_l, _, proc, c_l = long_results[i]
                lanes = proc & ~a_l
                self.counter.process_unit(
                    t_l[lanes],
                    (c_l if opts.exact else e_l)[lanes],
                    # UID read counts were already folded from `calls` above
                    np.empty(0, np.uint32)
                    if self.uid_map is not None
                    else np.asarray([call_l], dtype=np.uint32),
                )
        else:
            canon_out = np.asarray(out["canon"]) if opts.exact else None
            taxa_parts, enc_parts = [], []
            for i in range(len(unit)):
                if i in long_results:
                    t_l, a_l, e_l, _, _, proc, c_l = long_results[i]
                    lanes = proc & ~a_l
                    taxa_parts.append(t_l[lanes])
                    enc_parts.append((c_l if opts.exact else e_l)[lanes])
                else:
                    lanes = hll_lanes[i]
                    taxa_parts.append(taxa[i][lanes])
                    enc_parts.append(
                        (canon_out[i] if opts.exact else enc_arr[i])[lanes]
                    )
            self.counter.process_unit(
                np.concatenate(taxa_parts) if taxa_parts else np.empty(0, np.uint32),
                np.concatenate(enc_parts) if enc_parts else np.empty(0, np.uint32),
                calls,
            )

        for i, dna in enumerate(unit):
            call = int(calls[i])
            self.total_classified += call != 0
            if unclassified_fh is not None and not call:
                unclassified_fh.write(format_sequence(dna, fastq))
            if classified_fh is not None and call:
                classified_fh.write(format_sequence(dna, fastq))
            if kraken_fh is not None:
                if not call and opts.only_classified_output:
                    continue
                if i in long_results:
                    t_l, a_l = long_results[i][0], long_results[i][1]
                    row_t, row_a = t_l, a_l
                    nk = len(t_l)
                else:
                    nk = int(n_kmers[i])
                    row_t, row_a = taxa[i, :nk], ambig[i, :nk]
                kraken_fh.write(
                    kraken_line(
                        dna.id,
                        call,
                        len(dna.seq),
                        row_t,
                        row_a,
                        quick=opts.quick,
                        hits=int(hits[i]),
                        sequence=dna.seq if opts.print_sequence else None,
                    )
                )
        self.total_sequences += len(unit)
        self.total_bases += sum(len(d.seq) for d in unit)

    # --------------------------------------------------------------- reports

    def report_stats(self, fh=sys.stderr) -> None:
        seconds = getattr(self, "_elapsed", 0.0) or 1e-9
        fh.write("\r")
        fh.write(
            "%d sequences (%.2f Mbp) processed in %.3fs (%.1f Kseq/m, %.2f Mbp/m).\n"
            % (
                self.total_sequences,
                self.total_bases / 1.0e6,
                seconds,
                self.total_sequences / 1.0e3 / (seconds / 60),
                self.total_bases / 1.0e6 / (seconds / 60),
            )
        )
        n = max(self.total_sequences, 1)
        fh.write(
            "  %d sequences classified (%.2f%%)\n"
            % (self.total_classified, self.total_classified * 100.0 / n)
        )
        fh.write(
            "  %d sequences unclassified (%.2f%%)\n"
            % (
                self.total_sequences - self.total_classified,
                (self.total_sequences - self.total_classified) * 100.0 / n,
            )
        )

    def ensure_counts_files(self) -> None:
        """Generate <db>.kdb.counts once per DB and feed genome sizes into the
        taxonomy (classify.cpp:260-285). The histogram over the DB value
        column runs on host: one bulk fetch of the (already-resident) dense
        values beats compiling a one-off device bincount program."""
        for i, d in enumerate(self.db_dirs):
            path = os.path.join(d, "database.kdb") + ".counts"  # "<kdb path>.counts"
            if not (os.path.exists(path) and os.path.getsize(path) > 0):
                if self.mesh is not None:
                    vd = self._mesh_vals_dense[i]  # None for UID tables
                elif self._ooc is not None:
                    vd = self._ooc[i].vals_dense  # None for UID tables
                else:
                    vd = np.asarray(self.dbs[i].vals_dense)
                counts = None
                if vd is not None:
                    hist = np.bincount(vd, minlength=self.taxonomy.size)
                    active = np.flatnonzero(hist)
                    counts = {
                        int(self.taxonomy.taxids[a]): int(hist[a]) for a in active
                    }
                    # values whose taxid was missing from the taxonomy land on
                    # dense 0 with vals != 0; fall back to the host histogram
                    if (vd == 0).any() and 0 in counts:
                        counts = None
                if counts is None:
                    _, _, vals = read_kdb(os.path.join(d, "database.kdb"))
                    counts = counts_from_vals(vals)
                write_counts(path, counts)
            # feed each counts file into the (possibly shared) taxonomy ONCE:
            # set_genome_sizes accumulates, so a second write_report -- or a
            # with_shared_db sibling -- would double every genome size
            fed = getattr(self.taxonomy, "_counts_fed", None)
            if fed is None:
                fed = self.taxonomy._counts_fed = set()
            key = os.path.abspath(path)
            if key not in fed:
                fed.add(key)
                self.taxonomy.set_genome_sizes(read_counts_stream_bugcompat(path))

    def finalized_counts(self) -> dict:
        """The final {taxid: ReadCounts} map: host-fold state merged with the
        device-counter state (if any). Fresh objects each call -- safe to
        fold further (multi-host merge, parallel/multihost.py)."""
        counts = self.counter.counts
        if self.dev_counters is None:
            # copy the host-counter state so the promise above holds: callers
            # (multi-host merge_counts) fold iadd into the returned objects,
            # which must never alias the classifier's live TaxonCounter state
            return {tid: rc.copy() for tid, rc in counts.items()}
        if self.dev_counters is not None:
            # _taxids_host is the device-id -> taxid map for the id space in
            # play (pool taxids in pool mode, the full taxonomy otherwise);
            # UID counters key on the raw uid value itself (classify.cpp:939)
            id_map = (
                np.arange(self.dev_counters.n_taxa, dtype=np.uint32)
                if self.uid_map is not None
                else self._taxids_host
            )
            dev_counts = self.dev_counters.finalize(id_map)
            # long reads (chunked on host) accumulated in self.counter;
            # ReadCounts.iadd handles the sparse-into-dense HLL merge
            for tid, rc in counts.items():
                if tid in dev_counts:
                    dev_counts[tid].iadd(rc)
                else:
                    dev_counts[tid] = rc.copy()
            counts = dev_counts
        return counts

    def write_report(self, fh, extra_counts: list | None = None) -> None:
        """`extra_counts`: other hosts' finalized counts (dicts or state-file
        paths, parallel/multihost.py) folded in before reporting."""
        self.ensure_counts_files()
        counts = self.finalized_counts()
        if extra_counts:
            from ..parallel.multihost import load_counter_state, merge_counts

            if self.dev_counters is None:
                # self.counter.counts objects are cached on the counter;
                # don't mutate them during the cross-host fold
                counts = {t: rc.copy() for t, rc in counts.items()}
            for other in extra_counts:
                if isinstance(other, (str, os.PathLike)):
                    other = load_counter_state(os.fspath(other))
                merge_counts(counts, other)
        rep = TaxReport(
            self.taxonomy,
            counts,
            show_zeros=self.opts.report_zeros,
        )
        if self.opts.hll_precision > 0:
            rep.set_cols(FULL_COLS if self.opts.full_report else DEFAULT_COLS)
        else:
            from ..report import NO_HLL_COLS

            rep.set_cols(NO_HLL_COLS)
        rep.write(fh)

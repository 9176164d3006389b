"""Device-resident k-mer database.

The database (sorted canonical-k-mer -> LCA-taxid pairs plus the minimizer
offset table, reference krakendb.cpp:60-78/528-593) is treated like model
weights: loaded once into HBM as three planes
  keys  uint64 [N]   sorted within each minimizer bin
  vals  uint32 [N]   LCA taxid (original id space)
  vals_dense int32 [N]  taxid remapped into the dense taxonomy index space
and the bin offset table (4^nt + 1 entries, shard-relative).

A `DeviceDB` may represent the whole database (single chip) or one
minimizer-range shard (multi-chip): `bin_start` is the first minimizer bin
owned and `offsets` is relative to `key_start`.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import read_kdb, read_index
from ..taxonomy import Taxonomy
from .hash_table import build_hash_table
from .pool import ValuePool, build_value_pool


@dataclasses.dataclass
class DeviceDB:
    # In hash mode (the default) these four planes stay HOST-side numpy --
    # only the compact hash table occupies HBM (24B/key instead of 40B);
    # they are device arrays only when use_hash=False (bsearch lookups).
    keys: object  # uint64 [N]
    vals: object  # uint32 [N]
    vals_dense: object  # int32 [N]
    offsets: object  # int64 [bins_owned + 1], relative to key_start
    k: int
    nt: int
    idx_type: int
    key_ct: int
    max_bin: int  # largest bin size (bounds the binary-search trip count)
    bin_start: int = 0  # first minimizer bin owned by this shard
    key_start: int = 0  # global pair index of keys[0]
    # hash table planes (db/hash_table.py); the default device lookup path:
    # CHD (disp4 u32 [2^(lg-2),4], rows u32 [2^lr,4]) normally, fused
    # (u32 [nb,4],) as build fallback, (ptags u32 [nb,2],
    # confirm u32 [nb*2,2]) for raw-valued (UID) databases
    hash_table: tuple | None = None
    hash_lb: int = 0
    store_raw: bool = False  # hash value word = raw DB value (UID databases)
    # LCA-closed value dictionary (db/pool.py): when set, the hash table's
    # value words are POOL ids and the classify step runs entirely in pool
    # space (resolve tables, RLE rows, HLL feed); None = dense taxonomy ids
    pool: ValuePool | None = None

    @property
    def n_bins(self) -> int:
        return int(self.offsets.shape[0]) - 1

    @property
    def search_iters(self) -> int:
        return max(1, int(np.ceil(np.log2(self.max_bin + 1))) + 1)


def compute_vals_dense(vals: np.ndarray, taxonomy: Taxonomy) -> np.ndarray:
    """Dense-index the value column, warning on taxa the taxonomy lacks."""
    vals_dense = taxonomy.dense_index(vals)
    unknown = (vals_dense == 0) & (vals != 0)
    if unknown.any():
        import sys

        print(
            f"warning: {int(unknown.sum())} DB values reference taxa missing "
            f"from the taxonomy (treated as unclassified)",
            file=sys.stderr,
        )
    return vals_dense


def _device_put_planes(keys, vals, vals_dense, offsets, device=None):
    put = (lambda x: jax.device_put(x, device)) if device is not None else jax.device_put
    return put(keys), put(vals), put(vals_dense), put(offsets)


def build_device_db(
    keys: np.ndarray,
    vals: np.ndarray,
    offsets: np.ndarray,
    k: int,
    nt: int,
    taxonomy: Taxonomy | None,
    idx_type: int = 2,
    device=None,
    use_hash: bool = True,
    store_raw: bool = False,
    cached_hash: tuple | None = None,  # (host_planes, lb) from ht_cache
    hash_sink: list | None = None,  # appended with (host_planes, lb) on build
    pool: ValuePool | str | None = "auto",  # "auto" = build own; None = dense ids
    vals_dense: np.ndarray | None = None,  # precomputed dense values (cache paths)
) -> DeviceDB:
    offsets = np.asarray(offsets, dtype=np.int64)
    bin_sizes = np.diff(offsets)
    max_bin = int(bin_sizes.max()) if len(bin_sizes) else 0
    if vals_dense is not None:
        pass
    elif store_raw:
        # UID databases: values are set ids, not taxids -- no dense mapping
        vals_dense = np.zeros(len(vals), dtype=np.int32)
    elif taxonomy is not None:
        vals_dense = compute_vals_dense(vals, taxonomy)
    else:
        vals_dense = np.zeros(len(vals), dtype=np.int32)
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    vals = np.ascontiguousarray(vals, dtype=np.uint32)
    vals_dense = np.ascontiguousarray(vals_dense, dtype=np.int32)
    if store_raw or not use_hash or taxonomy is None:
        pool = None
    elif pool == "auto":
        pool = build_value_pool([vals_dense], taxonomy)  # None if > u16
    table_vals = pool.pool_index(vals_dense) if pool is not None else vals_dense
    htable, hlb = (None, 0)
    if use_hash:
        if cached_hash is not None:
            host_planes, hlb = cached_hash
            htable = tuple(jax.device_put(p, device) for p in host_planes)
        else:
            from .hash_table import HashBuildError

            try:
                htable, hlb, host_planes = build_hash_table(
                    keys, vals, table_vals, store_raw=store_raw, keep_host=True
                )
            except HashBuildError as e:
                # never hard-fail on valid input: the bsearch planes answer
                # every query the hash table would (krakendb.cpp:250-321's
                # always-works search); slower but correct
                import sys

                print(
                    f"warning: hash-table build failed ({e}); "
                    "falling back to binary-search lookup",
                    file=sys.stderr,
                )
                use_hash = False
                pool = None  # bsearch planes answer in dense-id space
            else:
                if device is not None:
                    htable = tuple(jax.device_put(p, device) for p in host_planes)
                if hash_sink is not None:
                    hash_sink.append((host_planes, hlb))
    if use_hash:
        # the sorted planes stay on host: the lookup never touches them, and
        # dropping them from HBM nearly doubles the database capacity per chip
        dk, dv, dvd, doff = keys, vals, vals_dense, offsets
    else:
        dk, dv, dvd, doff = _device_put_planes(keys, vals, vals_dense, offsets, device)
    return DeviceDB(
        keys=dk,
        vals=dv,
        vals_dense=dvd,
        offsets=doff,
        k=k,
        nt=nt,
        idx_type=idx_type,
        key_ct=len(keys),
        max_bin=max_bin,
        hash_table=htable,
        hash_lb=hlb,
        store_raw=store_raw,
        pool=pool if htable is not None else None,
    )


def load_database_dir(
    db_dir: str | os.PathLike,
    taxonomy: Taxonomy | None = None,
    uid_database: bool = False,
    device=None,
    pool: ValuePool | str | None = "auto",
    preloaded: tuple | None = None,  # (hdr, keys, vals, vals_dense) if already read
) -> tuple[DeviceDB, Taxonomy]:
    """Load a reference-layout database directory onto the device.

    Expects `database.kdb` (or `uid_database.kdb`), `database.idx`, `taxDB`
    (scripts/krakenuniq:135-138, 199). `pool`: "auto" builds this database's
    own value pool (db/pool.py); a ValuePool instance shares one id space
    across hierarchical databases; None disables pooled values. `preloaded`
    skips re-reading the kdb when the caller already holds its arrays (the
    multi-DB joint-pool path reads them for the pool build)."""
    from .ht_cache import load_ht_cache, save_ht_cache

    db_dir = os.fspath(db_dir)
    kdb_name = "uid_database.kdb" if uid_database else "database.kdb"
    taxdb_path = os.path.join(db_dir, "taxDB")
    if taxonomy is None:
        taxonomy = Taxonomy.from_taxdb_file(taxdb_path)
    kdb_path = os.path.join(db_dir, kdb_name)
    if preloaded is not None:
        hdr, keys, vals, vals_dense = preloaded
    else:
        hdr = keys = vals = vals_dense = None
    if keys is None:
        hdr, keys, vals = read_kdb(kdb_path)
    idx_type, nt, offsets = read_index(os.path.join(db_dir, "database.idx"))
    if vals_dense is None:
        vals_dense = (
            np.zeros(len(vals), np.int32)
            if uid_database
            else compute_vals_dense(vals, taxonomy)
        )
    if uid_database:
        pool = None
    elif pool == "auto":
        pool = build_value_pool([vals_dense], taxonomy)
    # dense/pool values depend on the taxonomy, so the cache is keyed on both
    # files; the cached table's value space (pool rows) must equal the pool
    # in use -- a multi-DB joint pool differs from the single-DB one. Dense
    # (pool-less) tables cache separately so alternating modes don't evict
    # each other's multi-GB builds
    ht_path = kdb_path + (".ht" if pool is not None else ".ht_dense")
    cached = load_ht_cache(ht_path, kdb_path, taxdb_path, uid_database)
    if cached is not None:
        extra = cached[2] or {}
        cached_rows = extra.get("pool_rows")
        want_rows = None if pool is None else pool.rows
        if (cached_rows is None) != (want_rows is None) or (
            want_rows is not None
            and not np.array_equal(np.asarray(cached_rows), want_rows)
        ):
            cached = None  # value-space mismatch: rebuild
        else:
            cached = cached[:2]
    sink: list = []
    db = build_device_db(
        keys, vals, offsets, k=hdr.k, nt=nt, taxonomy=taxonomy, idx_type=idx_type,
        device=device, store_raw=uid_database, cached_hash=cached, hash_sink=sink,
        pool=pool, vals_dense=vals_dense,
    )
    if cached is None and sink:
        host_planes, hlb = sink[0]
        save_ht_cache(
            ht_path, host_planes, hlb, kdb_path, taxdb_path, uid_database,
            extra=(
                {"pool_rows": db.pool.rows} if db.pool is not None else None
            ),
        )
    return db, taxonomy

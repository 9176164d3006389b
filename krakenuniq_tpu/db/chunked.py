"""Out-of-core database chunking: the `--preload-size` engine.

The reference classifies databases far larger than RAM by splitting the
sorted pair array into minimizer-range chunks that fit a byte budget and
streaming them through memory serially (krakendb.cpp:407-526,
classify.cpp:566-791). The TPU equivalent implemented here: the device hash
table (db/hash_table.py) is built per minimizer-range chunk on host, each
chunk sized so its table fits the `--preload-size` HBM budget, and the
classify pipeline streams the chunk tables through HBM, folding per-k-mer
hits into a persistent device accumulator (classify/device_step.probe_chunk).

Correctness rests on the same invariant the reference's chunk merge asserts
(classify.cpp:447): each k-mer lives in exactly one chunk -- and our probe
is EXACT (hash_table.py), so probing a chunk that does not own a k-mer's
minimizer range simply misses. The cross-chunk merge is therefore a
precedence select (take the first nonzero word), which doubles as the
hierarchical multi-DB merge rule (classify.cpp:927-936) when chunks of later
databases are probed after earlier ones.

Chunks are cut along minimizer-bin boundaries exactly like the reference's
`upper_bound` partitioner (krakendb.cpp:430-461), with all chunk tables
built at one common bucket width so the probe program compiles once.
"""

from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np

from .hash_table import (
    BUCKET_SLOTS,
    CHD_MAX_LOAD,
    HashBuildError,
    build_hash_table,
    chd_min_lr,
    chd_table_bytes,
)

# fused-fallback rows are 16B/bucket; raw (UID) two-level is 24B/bucket;
# the default CHD layout prices at 17B per 2-slot row (chd_table_bytes)
_FUSED_BYTES_PER_BUCKET = 4 * 4
_RAW_BYTES_PER_BUCKET = 4 * 2 + 8 * 2
_CHUNK_LOAD_FACTOR = 0.6


def table_bytes(n_keys: int, max_value: int, store_raw: bool) -> int:
    """HBM bytes of a single (unchunked) table over n_keys."""
    if store_raw:
        lb = max(
            4,
            int(np.ceil(np.log2(max(n_keys, 2) / (BUCKET_SLOTS * _CHUNK_LOAD_FACTOR)))),
        )
        return (1 << lb) * _RAW_BYTES_PER_BUCKET
    return chd_table_bytes(chd_min_lr(n_keys, max_value))


def plan_chunks(
    offsets: np.ndarray,
    budget_bytes: int,
    max_value: int,
    store_raw: bool,
    min_chunks: int = 1,
    chunk_multiple: int = 1,
) -> tuple[list[tuple[int, int]], int]:
    """Cut minimizer bins into chunks whose hash tables fit budget_bytes.

    Returns ([(bin_lo, bin_hi)), ...], common_lb). Mirrors the reference's
    largest-range-that-fits binary search (krakendb.cpp:430-461), realized as
    the smallest equal-key chunk count whose largest chunk fits the budget.
    `min_chunks` forces a finer cut (retry path after a placement stall);
    `chunk_multiple` rounds the count up so chunks group evenly over a mesh
    "db" axis (the OOC x mesh composition).
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    total = int(offsets[-1])
    if store_raw:
        per_bucket = _RAW_BYTES_PER_BUCKET
        lb_budget = max(4, int(np.floor(np.log2(max(budget_bytes, 1) / per_bucket))))
        lb_floor = 4
        min_table = (1 << lb_floor) * per_bucket
        cap = int((1 << lb_budget) * BUCKET_SLOTS * _CHUNK_LOAD_FACTOR)
    else:
        # CHD layout (db/hash_table.py): 2^lr 16B rows + 2^(lr-2) disp words
        lb_budget = max(4, int(np.floor(np.log2(max(budget_bytes, 1) / 17))))
        lb_floor = max(4, int(max_value).bit_length())
        min_table = chd_table_bytes(lb_floor)
        cap = int((1 << lb_budget) * 2 * CHD_MAX_LOAD)
    if lb_budget < lb_floor:
        raise ValueError(
            f"--preload-size {budget_bytes} is below the minimum chunk table "
            f"(width 2^{lb_floor} = {min_table} bytes)"
        )
    max_bin = int(np.diff(offsets).max()) if len(offsets) > 1 else total
    if max_bin > cap:
        raise ValueError(
            f"--preload-size {budget_bytes} cannot hold the largest minimizer "
            f"bin ({max_bin} keys); chunks cut along bin boundaries "
            "(krakendb.cpp:430-461) need a larger budget"
        )
    from ..parallel.partition import partition_bins_equal_keys

    n_chunks = max(min_chunks, -(-total // cap)) if total else max(1, min_chunks)
    n_chunks = -(-n_chunks // chunk_multiple) * chunk_multiple
    while True:
        bounds = partition_bins_equal_keys(offsets, n_chunks)
        sizes = [int(offsets[hi] - offsets[lo]) for lo, hi in bounds]
        if max(sizes) <= cap:
            break
        n_chunks += chunk_multiple  # bin granularity overflowed a chunk; cut finer
    if store_raw:
        lb = max(
            max(
                4,
                int(np.ceil(np.log2(max(s, 2) / (BUCKET_SLOTS * _CHUNK_LOAD_FACTOR)))),
            )
            for s in sizes
        )
    else:
        lb = max(chd_min_lr(s, max_value) for s in sizes)
    return bounds, min(lb, lb_budget)


@dataclasses.dataclass
class ChunkedHashDB:
    """Host-resident chunk tables for one database, streamed through HBM.

    chunk_planes[i] is the host plane tuple of chunk i -- (disp4, rows) CHD
    planes for dense tables, (ptags, confirm) for raw (UID) tables -- all
    built at the common width `lb` so the probe program compiles once per
    database.
    """

    chunk_planes: list[tuple]
    lb: int
    bounds: list  # minimizer-bin range per chunk (bookkeeping/repr)
    k: int
    nt: int
    store_raw: bool
    key_ct: int
    vals_dense: np.ndarray | None  # host dense values (counts-file generation)
    pool: object | None = None  # ValuePool when chunk value words are pool ids

    @property
    def n_chunks(self) -> int:
        return len(self.chunk_planes)

    def chunk_bytes(self) -> int:
        return sum(p.nbytes for p in self.chunk_planes[0])


def build_chunked_db(
    keys: np.ndarray,
    vals: np.ndarray,
    vals_dense: np.ndarray,
    offsets: np.ndarray,
    budget_bytes: int,
    k: int,
    nt: int,
    store_raw: bool = False,
    chunk_multiple: int = 1,
) -> ChunkedHashDB:
    """Build per-chunk hash tables on host. Keys must be the bin-sorted pair
    array (so each chunk's keys are a contiguous slice).

    A chunk whose placement stalls at the planned width restarts the whole
    set: one bit wider if the budget allows (halves the load), else cut
    finer at the same width (fewer keys per chunk). Uniform width keeps the
    probe program at one compile per database."""
    values_for_fit = vals if store_raw else vals_dense
    vmax = int(np.asarray(values_for_fit).max()) if len(keys) else 0
    offsets = np.asarray(offsets, dtype=np.int64)

    def width_bytes(w: int) -> int:
        return (1 << w) * _RAW_BYTES_PER_BUCKET if store_raw else chd_table_bytes(w)

    min_chunks = 1
    lb_bump = 0
    while True:
        bounds, lb = plan_chunks(
            offsets, budget_bytes, vmax, store_raw, min_chunks, chunk_multiple
        )
        if width_bytes(lb + lb_bump) <= budget_bytes:
            lb = min(lb + lb_bump, 30)
        else:
            lb_bump = 0  # replanned cut changed the base width; restart bumps
        chunk_planes = []
        ok = True
        for lo, hi in bounds:
            klo, khi = int(offsets[lo]), int(offsets[hi])
            try:
                _, _, host = build_hash_table(
                    keys[klo:khi],
                    vals[klo:khi],
                    vals_dense[klo:khi],
                    force_lb=lb,
                    store_raw=store_raw,
                    keep_host=True,
                    to_device=False,
                    layout="chd",
                )
            except HashBuildError:
                ok = False
                if width_bytes(lb + 1) <= budget_bytes:
                    lb_bump += 1
                else:
                    min_chunks = len(bounds) + chunk_multiple
                break
            chunk_planes.append(host)
        if ok:
            break
    return ChunkedHashDB(
        chunk_planes=chunk_planes,
        lb=lb,
        bounds=[tuple(b) for b in bounds],
        k=k,
        nt=nt,
        store_raw=store_raw,
        key_ct=len(keys),
        vals_dense=None if store_raw else vals_dense,
    )


def load_chunked_db(
    db_dir: str | os.PathLike,
    budget_bytes: int,
    taxonomy,
    uid_database: bool = False,
    pool="auto",
    preloaded: tuple | None = None,  # (hdr, keys, vals, vals_dense) if already read
    chunk_multiple: int = 1,
) -> ChunkedHashDB:
    """Load a reference-layout DB dir as a chunked (out-of-core) table set,
    with an on-disk cache of the built chunk planes (`<kdb>.htc`). `pool`:
    "auto" builds the database's own value pool (db/pool.py), a ValuePool
    shares a joint id space (hierarchical multi-DB), None stores dense ids.
    `chunk_multiple` > 1 pads the chunk count to a multiple (mesh streaming
    probes chunks in groups of mesh_db; padding chunks are empty tables)."""
    from ..formats import read_index, read_kdb
    from .device_db import compute_vals_dense
    from .ht_cache import load_ht_cache, save_ht_cache
    from .pool import build_value_pool

    db_dir = os.fspath(db_dir)
    kdb_name = "uid_database.kdb" if uid_database else "database.kdb"
    kdb_path = os.path.join(db_dir, kdb_name)
    taxdb_path = os.path.join(db_dir, "taxDB")
    if preloaded is not None:
        hdr, keys, vals, vals_dense = preloaded
    else:
        hdr = keys = vals = vals_dense = None
    if keys is None:
        hdr, keys, vals = read_kdb(kdb_path)
    _idx_type, nt, offsets = read_index(os.path.join(db_dir, "database.idx"))
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
    table_vals = pool.pool_index(vals_dense) if pool is not None else vals_dense
    pool_rows = None if pool is None else pool.rows

    htc_path = kdb_path + ".htc"
    cached = load_ht_cache(htc_path, kdb_path, taxdb_path, uid_database)
    if cached is not None:
        planes, lb, extra = cached
        c_rows = (extra or {}).get("pool_rows")
        space_ok = (c_rows is None) == (pool_rows is None) and (
            pool_rows is None or np.array_equal(np.asarray(c_rows), pool_rows)
        )
        if (
            extra
            and extra.get("budget") == budget_bytes
            and extra.get("chunk_multiple", 1) == chunk_multiple
            and space_ok
        ):
            per = 2  # CHD (disp4, rows) and raw (ptags, confirm) both
            chunk_planes = [
                tuple(planes[i * per : (i + 1) * per])
                for i in range(len(planes) // per)
            ]
            return ChunkedHashDB(
                chunk_planes=chunk_planes,
                lb=lb,
                bounds=[tuple(b) for b in extra["bounds"]],
                k=hdr.k,
                nt=nt,
                store_raw=uid_database,
                key_ct=len(keys),
                vals_dense=None if uid_database else vals_dense,
                pool=pool,
            )

    cdb = build_chunked_db(
        keys, vals, table_vals, offsets, budget_bytes, hdr.k, nt,
        store_raw=uid_database, chunk_multiple=chunk_multiple,
    )
    cdb.vals_dense = None if uid_database else vals_dense
    cdb.pool = pool
    flat = tuple(p for planes in cdb.chunk_planes for p in planes)
    extra = {
        "budget": budget_bytes,
        "bounds": [list(b) for b in cdb.bounds],
        "chunk_multiple": chunk_multiple,
    }
    if pool_rows is not None:
        extra["pool_rows"] = pool_rows
    save_ht_cache(
        htc_path, flat, cdb.lb, kdb_path, taxdb_path, uid_database, extra=extra
    )
    print(
        f"out-of-core: {kdb_name} split into {cdb.n_chunks} chunk tables of "
        f"{cdb.chunk_bytes() / 1e6:.0f}MB (budget {budget_bytes / 1e6:.0f}MB)",
        file=sys.stderr,
    )
    return cdb

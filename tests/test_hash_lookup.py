"""Hash-table lookup vs binary-search lookup: identical results."""

import numpy as np
import pytest

from krakenuniq_tpu.db.hash_table import build_hash_table, BUCKET_SLOTS
from krakenuniq_tpu.lookup.hash_lookup import hash_lookup_kmers
from krakenuniq_tpu.utils.bits import murmur3_finalizer


@pytest.mark.parametrize("n", [10, 1000, 50000])
@pytest.mark.parametrize("layout", ["auto", "fused"])
def test_build_and_lookup(rng, n, layout):
    keys = np.unique(rng.integers(0, 1 << 62, size=n, dtype=np.uint64))
    vals = rng.integers(1, 1 << 31, size=len(keys), dtype=np.uint32)
    vals_dense = rng.integers(1, 1 << 20, size=len(keys)).astype(np.int32)
    planes, lb = build_hash_table(keys, vals, vals_dense, layout=layout)
    if layout == "fused":
        # fused layout: every key's dense value is stored exactly once in
        # the low lb-1 bits of an occupied slot's value word
        assert len(planes) == 1
        fused = np.asarray(planes[0]).reshape(-1, 2)  # [nb*slots, (tag, val)]
        occupied = (fused != 0).any(axis=1)
        assert occupied.sum() == len(keys)
        tax_mask = np.uint32((1 << (lb - 1)) - 1)
        np.testing.assert_array_equal(
            np.sort(fused[occupied, 1] & tax_mask),
            np.sort(vals_dense.astype(np.uint32)),
        )
    else:
        # CHD layout: (disp4, rows); every key's value is stored exactly
        # once in the low lb bits of an occupied 2-word slot
        assert len(planes) == 2 and planes[0].shape[1] == 4
        rows = np.asarray(planes[1]).reshape(-1, 2)  # [2^lb * 2, (hi, lo)]
        occupied = (rows != 0).any(axis=1)
        assert occupied.sum() == len(keys)
        v_mask = np.uint32((1 << lb) - 1)
        np.testing.assert_array_equal(
            np.sort(rows[occupied, 1] & v_mask),
            np.sort(vals_dense.astype(np.uint32)),
        )

    # queries: all keys + misses
    misses = rng.integers(0, 1 << 62, size=1000, dtype=np.uint64)
    misses = misses[~np.isin(misses, keys)]
    q = np.concatenate([keys, misses])
    w = np.asarray(
        hash_lookup_kmers(planes, murmur3_finalizer(q), np.ones(len(q), bool), lb)
    )
    np.testing.assert_array_equal(w[: len(keys)].astype(np.int32), vals_dense)
    assert (w[len(keys):] == 0).all()
    # invalid lanes return 0
    w2 = hash_lookup_kmers(
        planes, murmur3_finalizer(q[: len(keys)]),
        np.zeros(len(keys), bool), lb,
    )
    assert (np.asarray(w2) == 0).all()


def test_chd_numpy_fallback_matches_native(rng, monkeypatch):
    """The vectorized numpy placement (no native extension) yields a table
    the probe answers identically."""
    import krakenuniq_tpu.db.hash_table as ht

    keys = np.unique(rng.integers(0, 1 << 62, size=20000, dtype=np.uint64))
    vals = rng.integers(1, 1 << 16, size=len(keys), dtype=np.uint32)
    vd = rng.integers(1, 1 << 15, size=len(keys)).astype(np.int32)
    monkeypatch.setattr(
        ht, "_chd_place", lambda *a, **k: ht._chd_place_numpy(*a, **k)
    )
    planes, lb = build_hash_table(keys, vals, vd)
    assert len(planes) == 2
    w = np.asarray(
        hash_lookup_kmers(
            planes, murmur3_finalizer(keys), np.ones(len(keys), bool), lb
        )
    )
    np.testing.assert_array_equal(w.astype(np.int32), vd)


def test_store_raw_values(rng):
    """UID databases store the raw 32-bit value word instead of dense ids,
    in the two-level (ptags, confirm) layout."""
    keys = np.unique(rng.integers(0, 1 << 62, size=5000, dtype=np.uint64))
    vals = rng.integers(1, 1 << 31, size=len(keys), dtype=np.uint32)
    vals_dense = np.zeros(len(keys), dtype=np.int32)
    planes, lb = build_hash_table(keys, vals, vals_dense, store_raw=True)
    assert len(planes) == 2
    w = np.asarray(
        hash_lookup_kmers(planes, murmur3_finalizer(keys), np.ones(len(keys), bool), lb)
    )
    np.testing.assert_array_equal(w, vals)


def test_value_fit_grows_table(rng):
    """Dense values wider than the taxon field force a larger lb."""
    keys = np.unique(rng.integers(0, 1 << 62, size=100, dtype=np.uint64))
    vals = np.arange(1, len(keys) + 1, dtype=np.uint32)
    vals_dense = vals.astype(np.int32).copy()
    vals_dense[0] = (1 << 22) - 1  # needs a 22-bit value field -> lr >= 22
    planes, lb = build_hash_table(keys, vals, vals_dense)
    assert lb >= 22
    w = np.asarray(
        hash_lookup_kmers(planes, murmur3_finalizer(keys), np.ones(len(keys), bool), lb)
    )
    np.testing.assert_array_equal(w.astype(np.int32), vals_dense)


def test_zero_hash_key_is_exact(rng):
    """The single key whose murmur hash equals the empty tag still resolves
    (it is pinned to its first-choice bucket at build time)."""
    # invert the finalizer to find the key with hash 0
    def unmix(h):
        h = np.uint64(h)
        inv1 = np.uint64(pow(0xFF51AFD7ED558CCD, -1, 1 << 64))
        inv2 = np.uint64(pow(0xC4CEB9FE1A85EC53, -1, 1 << 64))

        def unshift(x):
            x ^= x >> np.uint64(33)
            return x

        h = unshift(h)
        h = np.uint64((int(h) * int(inv2)) % (1 << 64))
        h = unshift(h)
        h = np.uint64((int(h) * int(inv1)) % (1 << 64))
        h = unshift(h)
        return np.uint64((int(h) - 1) % (1 << 64))

    k0 = unmix(0)
    assert murmur3_finalizer(np.asarray([k0]))[0] == 0
    keys = np.unique(
        np.concatenate([[k0], rng.integers(0, 1 << 62, size=500, dtype=np.uint64)])
    )
    vals = np.arange(1, len(keys) + 1, dtype=np.uint32)
    vd = np.arange(1, len(keys) + 1, dtype=np.int32)
    planes, lb = build_hash_table(keys, vals, vd)
    pos = int(np.searchsorted(keys, k0))
    w = hash_lookup_kmers(
        planes, murmur3_finalizer(np.asarray([k0])), np.ones(1, bool), lb
    )
    assert int(np.asarray(w)[0]) == int(vd[pos])


def test_matches_bsearch_on_golden():
    import os

    from krakenuniq_tpu.db import load_database_dir
    from krakenuniq_tpu.kmer import encode_batch, ops as kops
    from krakenuniq_tpu.lookup import lookup_kmers
    from krakenuniq_tpu.formats.seqio import read_sequences

    data = os.path.join(os.path.dirname(__file__), "golden", "data")
    if not os.path.exists(os.path.join(data, "database.kdb")):
        pytest.skip("golden fixture missing")
    db, tax = load_database_dir(data)
    reads = [d.seq for d in read_sequences(os.path.join(data, "reads.fa"))][:64]
    enc = encode_batch(reads, lb=256, batch=64)
    canon, bins, ambig = kops.kmer_pipeline(enc.codes, enc.ambig, db.k, db.nt)
    valid = ~np.asarray(ambig)
    t1, td1 = lookup_kmers(
        db.keys, db.vals, db.vals_dense, db.offsets, canon, bins, valid,
        db.search_iters, 0,
    )
    h = murmur3_finalizer(np.asarray(canon))
    w = np.asarray(hash_lookup_kmers(db.hash_table, h, valid, db.hash_lb))
    # hash words are POOL ids when the value pool engaged (db/pool.py)
    if db.pool is not None:
        np.testing.assert_array_equal(
            np.asarray(td1), db.pool.rows[w].astype(np.int32)
        )
        np.testing.assert_array_equal(
            np.asarray(t1), db.pool.taxids.astype(np.uint32)[w]
        )
    else:
        np.testing.assert_array_equal(np.asarray(td1), w.astype(np.int32))
        np.testing.assert_array_equal(
            np.asarray(t1), tax.taxids.astype(np.uint32)[w]
        )


def test_ht_disk_cache(tmp_path):
    """Second load of a DB dir reuses the on-disk hash table; touching a
    dependency invalidates it."""
    import os
    import shutil

    from krakenuniq_tpu.db import load_database_dir
    from krakenuniq_tpu.db.ht_cache import load_ht_cache

    data = os.path.join(os.path.dirname(__file__), "golden", "data")
    if not os.path.exists(os.path.join(data, "database.kdb")):
        pytest.skip("golden fixture missing")
    d = tmp_path / "db"
    d.mkdir()
    for name in ("database.kdb", "database.idx", "taxDB"):
        shutil.copy(os.path.join(data, name), d / name)

    db1, _ = load_database_dir(str(d))
    ht_path = str(d / "database.kdb.ht")
    assert os.path.exists(ht_path)
    cached = load_ht_cache(ht_path, str(d / "database.kdb"), str(d / "taxDB"), False)
    assert cached is not None and cached[1] == db1.hash_lb

    db2, _ = load_database_dir(str(d))
    assert db2.hash_lb == db1.hash_lb
    np.testing.assert_array_equal(
        np.asarray(db2.hash_table[0]), np.asarray(db1.hash_table[0])
    )

    # staleness: rewrite taxDB with different mtime/size -> cache miss
    with open(d / "taxDB", "a") as fh:
        fh.write("\n")
    assert load_ht_cache(ht_path, str(d / "database.kdb"), str(d / "taxDB"), False) is None


def test_high_load_placement(rng):
    """Placement succeeds at load factors near the two-choice threshold:
    force_lb pinning the table so the load is ~0.85 of slots."""
    lb = 14
    n = int((1 << lb) * BUCKET_SLOTS * 0.85)
    keys = np.unique(rng.integers(0, 1 << 62, size=int(n * 1.2), dtype=np.uint64))[:n]
    assert len(keys) == n
    vals = rng.integers(1, 1 << 16, size=n, dtype=np.uint32)
    vals_dense = rng.integers(1, 1 << (lb - 1), size=n).astype(np.int32)
    planes, got_lb = build_hash_table(keys, vals, vals_dense, force_lb=lb)
    assert got_lb == lb
    w = np.asarray(
        hash_lookup_kmers(planes, murmur3_finalizer(keys), np.ones(n, bool), lb)
    )
    np.testing.assert_array_equal(w.astype(np.int32), vals_dense)


def test_skewed_shard_stack_grows(rng):
    """shard_hash_tables survives adversarially skewed shards: the common lb
    grows until every shard places, and every key still resolves."""
    from krakenuniq_tpu.parallel.partition import shard_hash_tables

    # skew: nearly all keys land in the first minimizer bin, so equal-key
    # partitioning cannot split them and one shard carries ~everything
    n = 30000
    keys = np.sort(np.unique(rng.integers(0, 1 << 62, size=n, dtype=np.uint64)))
    n = len(keys)
    vals = rng.integers(1, 1 << 16, size=n, dtype=np.uint32)
    vals_dense = rng.integers(1, 1 << 12, size=n).astype(np.int32)
    n_bins = 64
    offsets = np.zeros(n_bins + 1, dtype=np.uint64)
    offsets[1:] = n - (n_bins - 1)  # bin 0 holds all but one key per tail bin
    offsets[-n_bins + 1 :] = np.arange(n - (n_bins - 1) + 1, n + 1)
    sharded = shard_hash_tables(keys, vals, vals_dense, offsets, 4)
    assert sharded.n_shards == 4
    # every key resolves through its shard's table
    hit = np.zeros(n, dtype=np.int64)
    for s in range(4):
        w = np.asarray(
            hash_lookup_kmers(
                sharded.shard_planes(s),
                murmur3_finalizer(keys),
                np.ones(n, bool),
                sharded.lb,
            )
        )
        hit += w.astype(np.int64)
    np.testing.assert_array_equal(hit, vals_dense.astype(np.int64))


def test_bsearch_fallback_on_hash_failure(monkeypatch, rng, tmp_path):
    """build_device_db falls back to bsearch planes when the hash build
    raises, and classification-by-lookup still answers correctly."""
    from krakenuniq_tpu.db import device_db as dd
    from krakenuniq_tpu.db.hash_table import HashBuildError

    def boom(*a, **k):
        raise HashBuildError("synthetic failure")

    monkeypatch.setattr(dd, "build_hash_table", boom)
    keys = np.sort(np.unique(rng.integers(0, 1 << 62, size=500, dtype=np.uint64)))
    vals = rng.integers(1, 100, size=len(keys), dtype=np.uint32)
    offsets = np.array([0, len(keys)], dtype=np.int64)
    db = dd.build_device_db(keys, vals, offsets, k=31, nt=0, taxonomy=None)
    assert db.hash_table is None  # bsearch planes in place instead
    assert np.asarray(db.keys).shape == keys.shape

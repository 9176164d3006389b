"""Hash-table lookup vs binary-search lookup: identical results."""

import numpy as np
import pytest

from krakenuniq_tpu.db.hash_table import build_hash_table, BUCKET_SLOTS, EMPTY_KEY
from krakenuniq_tpu.lookup.hash_lookup import hash_lookup_kmers
from krakenuniq_tpu.utils.bits import murmur3_finalizer


@pytest.mark.parametrize("n", [10, 1000, 50000])
def test_build_and_lookup(rng, n):
    keys = np.unique(rng.integers(0, 1 << 62, size=n, dtype=np.uint64))
    vals = rng.integers(1, 1 << 31, size=len(keys), dtype=np.uint32)
    vals_dense = rng.integers(1, 1 << 20, size=len(keys)).astype(np.int32)
    table, lb = build_hash_table(keys, vals, vals_dense)
    # every key is stored exactly once
    flat = table[:, :BUCKET_SLOTS].ravel()
    stored = np.sort(flat[flat != EMPTY_KEY])
    np.testing.assert_array_equal(stored, keys)

    # queries: all keys + misses
    misses = rng.integers(0, 1 << 62, size=1000, dtype=np.uint64)
    misses = misses[~np.isin(misses, keys)]
    q = np.concatenate([keys, misses])
    t, td = hash_lookup_kmers(
        table, q, murmur3_finalizer(q), np.ones(len(q), bool), lb
    )
    t, td = np.asarray(t), np.asarray(td)
    np.testing.assert_array_equal(t[: len(keys)], vals)
    np.testing.assert_array_equal(td[: len(keys)], vals_dense)
    assert (t[len(keys):] == 0).all()
    # invalid lanes return 0
    t2, _ = hash_lookup_kmers(
        table, q[: len(keys)], murmur3_finalizer(q[: len(keys)]),
        np.zeros(len(keys), bool), lb,
    )
    assert (np.asarray(t2) == 0).all()


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
    t2, td2 = hash_lookup_kmers(db.hash_table, canon, h, valid, db.hash_lb)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(td1), np.asarray(td2))

"""Hash-table lookup vs binary-search lookup: identical results."""

import numpy as np
import pytest

from krakenuniq_tpu.db.hash_table import build_hash_table, BUCKET_SLOTS
from krakenuniq_tpu.lookup.hash_lookup import hash_lookup_kmers
from krakenuniq_tpu.utils.bits import murmur3_finalizer


@pytest.mark.parametrize("n", [10, 1000, 50000])
def test_build_and_lookup(rng, n):
    keys = np.unique(rng.integers(0, 1 << 62, size=n, dtype=np.uint64))
    vals = rng.integers(1, 1 << 31, size=len(keys), dtype=np.uint32)
    vals_dense = rng.integers(1, 1 << 20, size=len(keys)).astype(np.int32)
    (ptags, confirm), lb = build_hash_table(keys, vals, vals_dense)
    # every key's full hash is stored exactly once in the confirm plane
    confirm = np.asarray(confirm)
    full = confirm[:, 0].astype(np.uint64) | (confirm[:, 1].astype(np.uint64) << np.uint64(32))
    stored = np.sort(full[full != 0])
    np.testing.assert_array_equal(stored, np.sort(murmur3_finalizer(keys)))

    # queries: all keys + misses
    misses = rng.integers(0, 1 << 62, size=1000, dtype=np.uint64)
    misses = misses[~np.isin(misses, keys)]
    q = np.concatenate([keys, misses])
    t, td = hash_lookup_kmers(
        ptags, confirm, murmur3_finalizer(q), np.ones(len(q), bool), lb
    )
    t, td = np.asarray(t), np.asarray(td)
    np.testing.assert_array_equal(t[: len(keys)], vals)
    np.testing.assert_array_equal(td[: len(keys)], vals_dense)
    assert (t[len(keys):] == 0).all()
    # invalid lanes return 0
    t2, _ = hash_lookup_kmers(
        ptags, confirm, murmur3_finalizer(q[: len(keys)]),
        np.zeros(len(keys), bool), lb,
    )
    assert (np.asarray(t2) == 0).all()


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
    (ptags, confirm), lb = build_hash_table(keys, vals, vd)
    pos = int(np.searchsorted(keys, k0))
    t, td = hash_lookup_kmers(
        ptags, confirm, murmur3_finalizer(np.asarray([k0])), np.ones(1, bool), lb
    )
    assert int(np.asarray(t)[0]) == int(vals[pos])
    assert int(np.asarray(td)[0]) == int(vd[pos])


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
    ptags, confirm = db.hash_table
    t2, td2 = hash_lookup_kmers(ptags, confirm, h, valid, db.hash_lb)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(td1), np.asarray(td2))

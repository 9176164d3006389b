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
    # every key's value word (dense) is stored exactly once in the confirm
    # plane, alongside the low 32 bits of its murmur hash
    confirm = np.asarray(confirm)
    occupied = (confirm != 0).any(axis=1)
    np.testing.assert_array_equal(
        np.sort(confirm[occupied, 1]), np.sort(vals_dense.astype(np.uint32))
    )
    np.testing.assert_array_equal(
        np.sort(confirm[occupied, 0]),
        np.sort((murmur3_finalizer(keys) & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
    )

    # queries: all keys + misses
    misses = rng.integers(0, 1 << 62, size=1000, dtype=np.uint64)
    misses = misses[~np.isin(misses, keys)]
    q = np.concatenate([keys, misses])
    w = np.asarray(
        hash_lookup_kmers(ptags, confirm, murmur3_finalizer(q), np.ones(len(q), bool), lb)
    )
    np.testing.assert_array_equal(w[: len(keys)].astype(np.int32), vals_dense)
    assert (w[len(keys):] == 0).all()
    # invalid lanes return 0
    w2 = hash_lookup_kmers(
        ptags, confirm, murmur3_finalizer(q[: len(keys)]),
        np.zeros(len(keys), bool), lb,
    )
    assert (np.asarray(w2) == 0).all()


def test_store_raw_values(rng):
    """UID databases store the raw 32-bit value word instead of dense ids."""
    keys = np.unique(rng.integers(0, 1 << 62, size=5000, dtype=np.uint64))
    vals = rng.integers(1, 1 << 31, size=len(keys), dtype=np.uint32)
    vals_dense = np.zeros(len(keys), dtype=np.int32)
    (ptags, confirm), lb = build_hash_table(keys, vals, vals_dense, store_raw=True)
    w = np.asarray(
        hash_lookup_kmers(
            ptags, confirm, murmur3_finalizer(keys), np.ones(len(keys), bool), lb
        )
    )
    np.testing.assert_array_equal(w, vals)


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
    w = hash_lookup_kmers(
        ptags, confirm, murmur3_finalizer(np.asarray([k0])), np.ones(1, bool), lb
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
    ptags, confirm = db.hash_table
    w = np.asarray(hash_lookup_kmers(ptags, confirm, h, valid, db.hash_lb))
    np.testing.assert_array_equal(np.asarray(td1), w.astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(t1), tax.taxids.astype(np.uint32)[w]
    )

"""Differential tests: device k-mer ops vs numpy bits oracle vs brute-force
reference-semantics oracle."""

import numpy as np
import pytest

import reference_oracle as oracle
from krakenuniq_tpu.utils import bits
from krakenuniq_tpu.kmer import encode, ops


def random_kmers(rng, n, k):
    return rng.integers(0, 1 << (2 * k), size=n, dtype=np.uint64)


@pytest.mark.parametrize("k", [5, 15, 21, 31])
def test_revcomp_canonical_oracle(rng, k):
    kmers = random_kmers(rng, 200, k)
    got_rc = bits.reverse_complement(kmers, k)
    got_canon = bits.canonical_representation(kmers, k)
    for km, rc, cn in zip(kmers.tolist(), got_rc.tolist(), got_canon.tolist()):
        assert rc == oracle.revcomp(km, k)
        assert cn == oracle.canon(km, k)
    # revcomp is an involution
    np.testing.assert_array_equal(bits.reverse_complement(got_rc, k), kmers)


@pytest.mark.parametrize("k,nt", [(21, 12), (31, 15), (11, 5), (31, 9)])
def test_bin_key_oracle(rng, k, nt):
    kmers = random_kmers(rng, 100, k)
    got = bits.bin_key(kmers, k, nt)
    for km, b in zip(kmers.tolist(), got.tolist()):
        assert b == oracle.bin_key(km, k, nt)


@pytest.mark.parametrize("k", [15, 31])
def test_device_matches_numpy(rng, k):
    kmers = random_kmers(rng, 512, k)
    np.testing.assert_array_equal(
        np.asarray(ops.reverse_complement(kmers, k)), bits.reverse_complement(kmers, k)
    )
    np.testing.assert_array_equal(
        np.asarray(ops.canonical_representation(kmers, k)),
        bits.canonical_representation(kmers, k),
    )


def test_murmur_finalizer(rng):
    keys = rng.integers(0, 1 << 63, size=100, dtype=np.uint64)
    got = bits.murmur3_finalizer(keys)
    for kk, h in zip(keys.tolist(), got.tolist()):
        assert h == oracle.murmur64(kk)


@pytest.mark.parametrize("k,nt", [(21, 12), (31, 15), (9, 5)])
def test_kmer_pipeline_vs_scanner(rng, k, nt):
    # random sequences with ambiguous bases sprinkled in
    alphabet = np.array(list("ACGTacgtNRY-"))
    probs = np.array([0.23, 0.23, 0.23, 0.23, 0.01, 0.01, 0.01, 0.01, 0.01, 0.01, 0.01, 0.01])
    seqs = [
        "".join(rng.choice(alphabet, size=int(n), p=probs))
        for n in rng.integers(k, 120, size=16)
    ] + ["A" * (k - 1), "ACGT" * ((k + 3) // 4)]
    lb = max(len(s) for s in seqs)
    batch = encode.encode_batch(seqs, lb=lb)
    canon, bins, ambig = ops.kmer_pipeline(batch.codes, batch.ambig, k, nt)
    canon, bins, ambig = map(np.asarray, (canon, bins, ambig))

    for i, s in enumerate(seqs):
        expect = oracle.scan_kmers(s, k)
        w = len(s) - k + 1
        for j, (km, amb) in enumerate(expect):
            assert bool(ambig[i, j]) == amb, (i, j, s)
            if not amb:
                ck = oracle.canon(km, k)
                assert int(canon[i, j]) == ck, (i, j, s)
                assert int(bins[i, j]) == oracle.bin_key(ck, k, nt), (i, j)
        # padding region must be flagged ambiguous
        if w > 0:
            assert ambig[i, max(w, 0):].all()


def test_encode_batch_basic():
    b = encode.encode_batch(["ACGT", "NNAA"], lb=6)
    np.testing.assert_array_equal(b.codes[0], [0, 1, 2, 3, 0, 0])
    np.testing.assert_array_equal(b.ambig[0], [False, False, False, False, True, True])
    np.testing.assert_array_equal(b.ambig[1], [True, True, False, False, True, True])
    assert b.lengths.tolist() == [4, 4]

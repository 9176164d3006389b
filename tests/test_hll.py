"""Batched HLL vs one-at-a-time oracle: identical states and estimates."""

import numpy as np
import pytest

import reference_oracle as oracle
from krakenuniq_tpu.hll import HLL, ReadCounts, ExactCounter
from krakenuniq_tpu.utils import bits


def states_equal(batch: HLL, orc: oracle.OracleHLL):
    assert batch.sparse == orc.sparse
    assert batch.n_observed == orc.n_observed
    if batch.sparse:
        assert set(batch.sparse_set.tolist()) == orc.sparse_set
    else:
        np.testing.assert_array_equal(batch.M, np.asarray(orc.M, dtype=np.uint8))
    assert batch.ertl_cardinality() == orc.ertl()


@pytest.mark.parametrize("p", [10, 12, 14])
@pytest.mark.parametrize("n", [0, 1, 50, 2000])
def test_insert_matches_oracle(rng, p, n):
    # duplicates included to exercise distinct-count logic
    items = rng.integers(0, n // 2 + 2, size=n, dtype=np.uint64)
    h = HLL(p)
    h.insert_items(items)
    orc = oracle.OracleHLL(p)
    for it in items.tolist():
        orc.insert(it)
    states_equal(h, orc)


def test_switch_boundary_exact(rng):
    """Insert exactly threshold distinct values, then more -- the switch point
    is where the reference switches."""
    p = 10  # threshold 256
    thr = (1 << p) // 4
    distinct = rng.integers(0, 1 << 62, size=thr + 5, dtype=np.uint64)
    # case 1: exactly threshold distinct, last insert fills the set -> stays sparse
    h1, o1 = HLL(p), oracle.OracleHLL(p)
    h1.insert_items(distinct[:thr])
    for it in distinct[:thr].tolist():
        o1.insert(it)
    states_equal(h1, o1)
    assert h1.sparse  # filled exactly on the last insert
    # case 2: one more insert (even a duplicate) flips to dense
    h1.insert_items(distinct[:1])
    o1.insert(int(distinct[0]))
    states_equal(h1, o1)
    assert not h1.sparse


@pytest.mark.parametrize("sizes", [(10, 10), (300, 10), (10, 300), (300, 300), (0, 50), (50, 0)])
def test_merge_matches_oracle(rng, sizes):
    p = 10
    n1, n2 = sizes
    a_items = rng.integers(0, 1 << 62, size=n1, dtype=np.uint64)
    b_items = rng.integers(0, 1 << 62, size=n2, dtype=np.uint64)
    ha, hb = HLL(p), HLL(p)
    ha.insert_items(a_items)
    hb.insert_items(b_items)
    oa, ob = oracle.OracleHLL(p), oracle.OracleHLL(p)
    for it in a_items.tolist():
        oa.insert(it)
    for it in b_items.tolist():
        ob.insert(it)
    ha.merge(hb)
    oa.merge(ob)
    states_equal(ha, oa)


def test_unit_partition_determinism(rng):
    """Splitting a stream into units and merging reproduces the one-shot
    stream state when each unit stays sparse, and a deterministic dense state
    otherwise."""
    p = 12
    items = rng.integers(0, 1 << 40, size=5000, dtype=np.uint64)
    whole = oracle.OracleHLL(p)
    for it in items.tolist():
        whole.insert(it)
    merged = HLL(p)
    for start in range(0, len(items), 700):
        unit = HLL(p)
        unit.insert_items(items[start : start + 700])
        merged.merge(unit)
    # units each stay sparse (700 < 1024 threshold at p=12), so merged sparse
    # set == whole's... unless whole itself went dense. Compare estimates via
    # oracle of the same unit structure instead:
    omerged = oracle.OracleHLL(p)
    for start in range(0, len(items), 700):
        u = oracle.OracleHLL(p)
        for it in items[start : start + 700].tolist():
            u.insert(it)
        omerged.merge(u)
    states_equal(merged, omerged)


def test_estimate_accuracy(rng):
    """Sanity: estimates within a few % for 100k distinct items."""
    items = rng.integers(0, 1 << 62, size=100_000, dtype=np.uint64)
    n_distinct = len(np.unique(items))
    h = HLL(12)
    h.insert_items(items)
    est = h.ertl_cardinality()
    assert abs(est - n_distinct) / n_distinct < 0.05
    est_h = h.heule_cardinality()
    assert abs(est_h - n_distinct) / n_distinct < 0.05
    est_f = h.flajolet_cardinality()
    assert abs(est_f - n_distinct) / n_distinct < 0.10


def test_exact_counter(rng):
    items = rng.integers(0, 1000, size=5000, dtype=np.uint64)
    c = ExactCounter()
    c.insert_items(items[:2000])
    c2 = ExactCounter()
    c2.insert_items(items[2000:])
    c.merge(c2)
    assert c.cardinality() == len(np.unique(items))


def test_read_counts():
    rc = ReadCounts(HLL(12))
    rc.increment_read_count()
    rc.n_kmers += 10
    rc.kmers.insert_items(np.arange(10, dtype=np.uint64))
    rc2 = ReadCounts(HLL(12))
    rc2.n_kmers = 5
    rc2.kmers.insert_items(np.arange(5, 10, dtype=np.uint64))
    rc.iadd(rc2)
    assert rc.n_reads == 1 and rc.n_kmers == 15
    assert rc.unique_kmer_count() == 10
    assert rc.sort_key() == (1, 15)

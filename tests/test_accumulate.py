"""Differential test: the vectorized TaxonCounter fold must produce state
bit-identical to the straightforward object-per-taxon fold (the reference's
unit-merge structure, classify.cpp:525-543)."""

import numpy as np
import pytest

from krakenuniq_tpu.classify.accumulate import TaxonCounter
from krakenuniq_tpu.hll import HLL, ExactCounter, ReadCounts


class OracleCounter:
    """The pre-vectorization implementation: fresh per-unit HLL per taxon,
    merged object-by-object (kept verbatim as the semantics oracle)."""

    def __init__(self, hll_precision=12, exact=False):
        self.hll_precision = hll_precision
        self.exact = exact
        self.counts = {}

    def _new_container(self):
        return ExactCounter() if self.exact else HLL(self.hll_precision)

    def process_unit(self, taxa_flat, enc_flat, calls):
        unit = {}
        if len(taxa_flat):
            order = np.argsort(taxa_flat, kind="stable")
            t_sorted = taxa_flat[order]
            e_sorted = enc_flat[order]
            bounds = np.flatnonzero(np.diff(t_sorted)) + 1
            starts = np.concatenate([[0], bounds])
            ends = np.concatenate([bounds, [len(t_sorted)]])
            for s, e in zip(starts.tolist(), ends.tolist()):
                taxon = int(t_sorted[s])
                rc = ReadCounts(self._new_container())
                rc.n_kmers = e - s
                if self.exact:
                    rc.kmers.insert_items(e_sorted[s:e])
                else:
                    rc.kmers.insert_encodings(e_sorted[s:e])
                unit[taxon] = rc
        for c in calls.tolist():
            c = int(c)
            rc = unit.get(c)
            if rc is None:
                rc = ReadCounts(self._new_container())
                unit[c] = rc
            rc.increment_read_count()
        for taxon in sorted(unit):
            g = self.counts.get(taxon)
            if g is None:
                self.counts[taxon] = unit[taxon]
            else:
                g.iadd(unit[taxon])


def _assert_equal_counts(got: dict, want: dict, exact: bool):
    assert set(got) == set(want)
    for t in want:
        g, w = got[t], want[t]
        assert g.n_reads == w.n_reads, t
        assert g.n_kmers == w.n_kmers, t
        if exact:
            np.testing.assert_array_equal(np.sort(g.kmers.kmers), np.sort(w.kmers.kmers))
            continue
        assert g.kmers.n_observed == w.kmers.n_observed, t
        assert g.kmers.sparse == w.kmers.sparse, t
        if w.kmers.sparse:
            np.testing.assert_array_equal(
                np.sort(g.kmers.sparse_set), np.sort(w.kmers.sparse_set)
            )
        else:
            np.testing.assert_array_equal(g.kmers.M, w.kmers.M)
        assert g.kmers.cardinality() == w.kmers.cardinality(), t


def _run_both(units, exact=False, p=12):
    a = TaxonCounter(p, exact=exact)
    b = OracleCounter(p, exact=exact)
    for taxa, enc, calls in units:
        a.process_unit(taxa, enc, calls)
        b.process_unit(taxa, enc, calls)
    _assert_equal_counts(a.counts, b.counts, exact)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_units_small(seed):
    rng = np.random.default_rng(seed)
    units = []
    for _ in range(12):
        n = int(rng.integers(0, 2000))
        taxa = rng.integers(1, 40, size=n).astype(np.uint32)
        enc = rng.integers(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
        calls = rng.integers(0, 40, size=int(rng.integers(1, 200))).astype(np.uint32)
        units.append((taxa, enc, calls))
    _run_both(units)


def test_dense_transition_and_mixed_units():
    """Units that push some taxa over the m/4 switch, then keep feeding both
    dense and sparse taxa."""
    rng = np.random.default_rng(7)
    p = 12
    th = (1 << p) // 4
    units = []
    # unit 0: taxon 5 goes dense (3*th distinct), taxon 6 stays sparse
    n5 = 3 * th
    taxa = np.concatenate([np.full(n5, 5), np.full(50, 6)]).astype(np.uint32)
    enc = rng.integers(0, 2**32, size=len(taxa), dtype=np.uint64).astype(np.uint32)
    units.append((taxa, enc, np.array([5, 6, 6], np.uint32)))
    # unit 1: more of both (dense taxon gets sparse-unit merge; sparse grows)
    taxa = np.concatenate([np.full(100, 5), np.full(80, 6)]).astype(np.uint32)
    enc = rng.integers(0, 2**32, size=len(taxa), dtype=np.uint64).astype(np.uint32)
    units.append((taxa, enc, np.array([6], np.uint32)))
    # unit 2: taxon 6 now ALSO goes dense (promotion of accumulated sparse)
    taxa = np.full(2 * th, 6, np.uint32)
    enc = rng.integers(0, 2**32, size=len(taxa), dtype=np.uint64).astype(np.uint32)
    units.append((taxa, enc, np.empty(0, np.uint32)))
    _run_both(units, p=p)


@pytest.mark.parametrize("tail_dup", [True, False])
def test_threshold_boundary(tail_dup):
    """Exactly m/4 distinct encodings: dense iff an insert FOLLOWS the one
    that filled the set (hyperloglogplus.cpp:496-498)."""
    p = 12
    th = (1 << p) // 4
    rng = np.random.default_rng(3)
    uniq = rng.choice(2**32, size=th, replace=False).astype(np.uint32)
    if tail_dup:
        # duplicates after the last first-occurrence -> switch fires
        enc = np.concatenate([uniq, uniq[:5]])
    else:
        # the last element IS the final distinct value -> stays sparse
        enc = np.concatenate([uniq[:5], uniq])[-th:]
        enc = uniq  # all distinct, last new at final position
    taxa = np.full(len(enc), 9, np.uint32)
    a = TaxonCounter(p)
    b = OracleCounter(p)
    a.process_unit(taxa, enc, np.empty(0, np.uint32))
    b.process_unit(taxa, enc, np.empty(0, np.uint32))
    _assert_equal_counts(a.counts, b.counts, exact=False)
    assert a.counts[9].kmers.sparse == (not tail_dup)


def test_compaction_equivalence():
    """Many small sparse units for one taxon: pending-list compaction must
    not change the final set."""
    rng = np.random.default_rng(11)
    units = []
    for _ in range(60):
        n = 400
        taxa = np.full(n, 3, np.uint32)
        enc = rng.integers(0, 5000, size=n, dtype=np.uint64).astype(np.uint32)
        units.append((taxa, enc, np.array([3], np.uint32)))
    _run_both(units)


def test_exact_mode():
    rng = np.random.default_rng(5)
    units = []
    for _ in range(8):
        n = int(rng.integers(1, 3000))
        taxa = rng.integers(1, 20, size=n).astype(np.uint32)
        kmers = rng.integers(0, 2**62, size=n, dtype=np.uint64)
        calls = rng.integers(0, 20, size=64).astype(np.uint32)
        units.append((taxa, kmers, calls))
    _run_both(units, exact=True)


def test_calls_only_taxa():
    units = [
        (np.empty(0, np.uint32), np.empty(0, np.uint32), np.array([0, 0, 7], np.uint32))
    ]
    _run_both(units)

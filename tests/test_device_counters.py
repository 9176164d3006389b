"""Device-resident counters (--device-counters): read/k-mer counts exact and,
with the sparse-exact tracking (classify/sparse_exact.py), the full HLL state
-- sparse or dense -- is bit-identical to the host/reference path, so reports
match byte for byte."""

import io
import os

import numpy as np
import pytest

from krakenuniq_tpu.classify import Classifier, ClassifyOptions

DATA = os.path.join(os.path.dirname(__file__), "golden", "data")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "kraken.out")), reason="golden fixture missing"
)


def _run_pair(**dev_kw):
    reads = os.path.join(DATA, "reads.fa")
    ka, kb = io.StringIO(), io.StringIO()
    ca = Classifier([DATA], ClassifyOptions(print_progress=False))
    ca.run([reads], kraken_fh=ka)
    cb = Classifier(
        [DATA], ClassifyOptions(print_progress=False, device_counters=True, **dev_kw)
    )
    cb.run([reads], kraken_fh=kb)
    return ca, ka, cb, kb


def test_device_counters_bit_exact():
    """Sparse tracking on (default): per-taxon HLL STATE equals the host
    path's -- same mode, same sparse set / registers -- and the report is
    byte-identical."""
    ca, ka, cb, kb = _run_pair()
    assert ka.getvalue() == kb.getvalue()

    host = ca.counter.counts
    dev = cb.dev_counters.finalize(cb._taxids_host)
    assert set(host) == set(dev)
    saw_sparse = saw_dense = False
    for taxid in host:
        assert host[taxid].n_reads == dev[taxid].n_reads, taxid
        assert host[taxid].n_kmers == dev[taxid].n_kmers, taxid
        h, d = host[taxid].kmers, dev[taxid].kmers
        if h is None or h.n_observed == 0:
            assert d.n_observed == 0
            continue
        assert h.n_observed == d.n_observed, taxid
        assert h.sparse == d.sparse, taxid
        if h.sparse:
            saw_sparse = True
            np.testing.assert_array_equal(
                np.sort(h.sparse_set), np.sort(d.sparse_set), err_msg=str(taxid)
            )
        else:
            saw_dense = True
            np.testing.assert_array_equal(h.M, d.M, err_msg=str(taxid))
    assert saw_sparse, "fixture should exercise sparse-regime taxa"

    ra, rb = io.StringIO(), io.StringIO()
    ca.write_report(ra)
    cb.write_report(rb)
    assert ra.getvalue() == rb.getvalue()


def test_device_counters_report_matches_golden():
    """The fast mode reproduces the reference-built golden report exactly."""
    c = Classifier([DATA], ClassifyOptions(print_progress=False, device_counters=True))
    c.run([os.path.join(DATA, "reads.fa")])
    rep = io.StringIO()
    c.write_report(rep)
    golden = open(os.path.join(DATA, "report.tsv")).read()
    assert rep.getvalue() == golden


def test_device_counters_approx_mode():
    """sparse_cap=0 opts out of the sparse tracking: registers still match a
    dense-converted host HLL (estimate-level compat, the pre-sparse-exact
    behavior)."""
    ca, ka, cb, kb = _run_pair(sparse_cap=0)
    assert ka.getvalue() == kb.getvalue()
    host = ca.counter.counts
    dev = cb.dev_counters.finalize(cb._taxids_host)
    assert set(host) == set(dev)
    for taxid in host:
        assert host[taxid].n_reads == dev[taxid].n_reads, taxid
        assert host[taxid].n_kmers == dev[taxid].n_kmers, taxid
        h = host[taxid].kmers
        if h is None or h.n_observed == 0:
            assert dev[taxid].kmers.n_observed == 0
            continue
        hd = h.copy()
        if hd.sparse:
            hd.sparse = False
            hd.M = np.zeros(hd.m, np.uint8)
            if len(hd.sparse_set):
                hd._registers_max(hd.sparse_set)
        np.testing.assert_array_equal(hd.M, dev[taxid].kmers.M, err_msg=str(taxid))


def test_device_counters_exact_mode():
    """--exact x --device-counters: counters on device, khset-equivalent
    sets folded on host; output and report byte-identical to the plain
    --exact run (classify.cpp:44-56 runs exact counting in every mode)."""
    reads = os.path.join(DATA, "reads.fa")
    ka, kb = io.StringIO(), io.StringIO()
    ca = Classifier([DATA], ClassifyOptions(print_progress=False, exact=True))
    ca.run([reads], kraken_fh=ka)
    cb = Classifier(
        [DATA],
        ClassifyOptions(print_progress=False, exact=True, device_counters=True),
    )
    cb.run([reads], kraken_fh=kb)
    assert ka.getvalue() == kb.getvalue()
    ra, rb = io.StringIO(), io.StringIO()
    ca.write_report(ra)
    cb.write_report(rb)
    assert ra.getvalue() == rb.getvalue()
    host = ca.counter.counts
    dev = cb.dev_counters.finalize(cb._taxids_host)
    merged = dict(dev)
    for t, rc in cb.counter.counts.items():
        if t in merged:
            merged[t] = merged[t].copy().iadd(rc)
        else:
            merged[t] = rc
    assert set(host) <= set(merged)
    for t in host:
        assert host[t].n_reads == merged[t].n_reads, t
        assert host[t].n_kmers == merged[t].n_kmers, t
        np.testing.assert_array_equal(
            np.sort(host[t].kmers.kmers), np.sort(merged[t].kmers.kmers)
        )


def test_device_counters_uid_mode():
    """--uid x --device-counters: k-mer counters and HLL registers key on the
    raw uid (classify.cpp:939), read counts on the host-resolved taxid;
    byte-identical output and report."""
    if not os.path.exists(os.path.join(DATA, "uid_database.kdb")):
        pytest.skip("uid fixture missing")
    reads = os.path.join(DATA, "reads.fa")
    ka, kb = io.StringIO(), io.StringIO()
    ca = Classifier(
        [DATA], ClassifyOptions(print_progress=False), uid_database=True
    )
    ca.run([reads], kraken_fh=ka)
    cb = Classifier(
        [DATA],
        ClassifyOptions(print_progress=False, device_counters=True),
        uid_database=True,
    )
    cb.run([reads], kraken_fh=kb)
    assert ka.getvalue() == kb.getvalue()
    ra, rb = io.StringIO(), io.StringIO()
    ca.write_report(ra)
    cb.write_report(rb)
    assert ra.getvalue() == rb.getvalue()


def test_device_counters_host_stats_fallback(monkeypatch):
    """Id spaces past the device sparse-stats packing (2^TAXON_BITS) fall
    back to host-computed per-span stats -- still bit-exact. Forced here by
    shrinking the packing limit below the fixture's taxonomy."""
    from krakenuniq_tpu.classify import sparse_exact

    monkeypatch.setattr(sparse_exact, "TAXON_BITS", 2)
    reads = os.path.join(DATA, "reads.fa")
    ka, kb = io.StringIO(), io.StringIO()
    ca = Classifier([DATA], ClassifyOptions(print_progress=False, value_pool=False))
    ca.run([reads], kraken_fh=ka)
    cb = Classifier(
        [DATA],
        ClassifyOptions(
            print_progress=False, device_counters=True, value_pool=False
        ),
    )
    assert cb.dev_counters.host_stats
    assert cb.dev_counters.sparse_cap == 0
    cb.run([reads], kraken_fh=kb)
    assert ka.getvalue() == kb.getvalue()
    ra, rb = io.StringIO(), io.StringIO()
    ca.write_report(ra)
    cb.write_report(rb)
    assert ra.getvalue() == rb.getvalue()


def test_device_counters_overflow_fallback():
    """A tiny sparse buffer forces the host-stats fallback for every span;
    results stay bit-identical and the overflow is counted."""
    ca, ka, cb, kb = _run_pair(sparse_cap=4)
    assert ka.getvalue() == kb.getvalue()
    assert cb.dev_counters.tracker.overflows > 0
    ra, rb = io.StringIO(), io.StringIO()
    ca.write_report(ra)
    cb.write_report(rb)
    assert ra.getvalue() == rb.getvalue()

"""Device-resident counters: read/k-mer counts exact; HLL estimates match a
dense-mode host HLL bit-for-bit."""

import io
import os

import numpy as np
import pytest

from krakenuniq_tpu.classify import Classifier, ClassifyOptions

DATA = os.path.join(os.path.dirname(__file__), "golden", "data")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "kraken.out")), reason="golden fixture missing"
)


def test_device_counters_vs_host():
    reads = os.path.join(DATA, "reads.fa")
    ka, kb = io.StringIO(), io.StringIO()

    ca = Classifier([DATA], ClassifyOptions(print_progress=False))
    ca.run([reads], kraken_fh=ka)
    cb = Classifier([DATA], ClassifyOptions(print_progress=False, device_counters=True))
    cb.run([reads], kraken_fh=kb)

    # kraken output identical (calls don't depend on the counter mode)
    assert ka.getvalue() == kb.getvalue()

    host = ca.counter.counts
    dev = cb.dev_counters.finalize(cb.taxonomy.taxids)
    assert set(host) == set(dev)
    for taxid in host:
        assert host[taxid].n_reads == dev[taxid].n_reads, taxid
        assert host[taxid].n_kmers == dev[taxid].n_kmers, taxid
        # register-level equality against a dense-converted host HLL
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


def test_device_counters_report_sane():
    c = Classifier([DATA], ClassifyOptions(print_progress=False, device_counters=True))
    c.run([os.path.join(DATA, "reads.fa")])
    rep = io.StringIO()
    c.write_report(rep)
    lines = rep.getvalue().splitlines()
    assert lines[0].startswith("%\treads")
    # reads/taxReads columns equal the golden report exactly
    golden = open(os.path.join(DATA, "report.tsv")).read().splitlines()
    assert len(lines) == len(golden)
    for got, want in zip(lines[1:], golden[1:]):
        g, w = got.split("\t"), want.split("\t")
        assert g[1] == w[1] and g[2] == w[2], (got, want)  # reads, taxReads
        assert g[6] == w[6]  # taxID

"""Golden differential tests: our classifier vs the compiled reference
binaries' outputs on a reference-built database (fixture under
tests/golden/data, regenerate with tests/golden/regen.sh)."""

import io
import os

import numpy as np
import pytest

from krakenuniq_tpu.classify import Classifier, ClassifyOptions

DATA = os.path.join(os.path.dirname(__file__), "golden", "data")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "kraken.out")), reason="golden fixture missing"
)


def run_classifier(reads, opts=None):
    c = Classifier([DATA], options=opts or ClassifyOptions(print_progress=False))
    kraken = io.StringIO()
    classified = io.StringIO()
    unclassified = io.StringIO()
    c.run(
        [os.path.join(DATA, reads)],
        kraken_fh=kraken,
        classified_fh=classified,
        unclassified_fh=unclassified,
    )
    return c, kraken.getvalue(), classified.getvalue(), unclassified.getvalue()


def read_golden(name):
    with open(os.path.join(DATA, name)) as f:
        return f.read()


def diff_lines(got: str, want: str, label: str):
    g, w = got.splitlines(), want.splitlines()
    assert len(g) == len(w), f"{label}: line count {len(g)} vs {len(w)}"
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b]
    assert not bad, f"{label}: first mismatch at line {bad[0][0]}:\n got: {bad[0][1]}\nwant: {bad[0][2]} ({len(bad)} total)"


def test_kraken_output_fasta():
    _, kraken, classified, unclassified = run_classifier(
        "reads.fa", ClassifyOptions(print_progress=False)
    )
    diff_lines(kraken, read_golden("kraken.out"), "kraken.out")
    diff_lines(classified, read_golden("classified.fa"), "classified.fa")
    diff_lines(unclassified, read_golden("unclassified.fa"), "unclassified.fa")


def test_report_fasta(tmp_path):
    c, kraken, _, _ = run_classifier("reads.fa")
    out = io.StringIO()
    c.write_report(out)
    diff_lines(out.getvalue(), read_golden("report.tsv"), "report.tsv")


def test_kraken_output_fastq():
    c, kraken, _, _ = run_classifier("reads.fq")
    diff_lines(kraken, read_golden("kraken_fq.out"), "kraken_fq.out")
    out = io.StringIO()
    c.write_report(out)
    diff_lines(out.getvalue(), read_golden("report_fq.tsv"), "report_fq.tsv")


def test_quick_mode():
    _, kraken, _, _ = run_classifier(
        "reads.fa", ClassifyOptions(quick=True, min_hits=2, print_progress=False)
    )
    diff_lines(kraken, read_golden("kraken_quick.out"), "kraken_quick.out")


def test_precision_14():
    c, kraken, _, _ = run_classifier(
        "reads.fa", ClassifyOptions(hll_precision=14, print_progress=False)
    )
    diff_lines(kraken, read_golden("kraken_p14.out"), "kraken_p14.out")
    out = io.StringIO()
    c.write_report(out)
    diff_lines(out.getvalue(), read_golden("report_p14.tsv"), "report_p14.tsv")


def test_only_classified():
    _, kraken, _, _ = run_classifier(
        "reads.fa", ClassifyOptions(only_classified_output=True, print_progress=False)
    )
    diff_lines(kraken, read_golden("kraken_onlyc.out"), "kraken_onlyc.out")


def test_build_database_matches_reference():
    """Our one-pass DB builder reproduces the reference db_sort+set_lcas
    output byte-for-byte."""
    from krakenuniq_tpu.build import build_database
    from krakenuniq_tpu.formats import read_kdb, read_index
    from krakenuniq_tpu.formats.seqmap import read_seqid2taxid
    from krakenuniq_tpu.taxonomy import Taxonomy

    tax = Taxonomy.from_taxdb_file(os.path.join(DATA, "taxDB"))
    res = build_database(
        [os.path.join(DATA, "library.fna")],
        read_seqid2taxid(os.path.join(DATA, "seqid2taxid.map")),
        tax,
        k=21,
        nt=7,
    )
    _, ref_keys, ref_vals = read_kdb(os.path.join(DATA, "database.kdb"))
    _, _, ref_offsets = read_index(os.path.join(DATA, "database.idx"))
    np.testing.assert_array_equal(res.keys, ref_keys)
    np.testing.assert_array_equal(res.vals, ref_vals)
    np.testing.assert_array_equal(res.offsets, ref_offsets)

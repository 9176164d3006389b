"""Accuracy harness in the spirit of the reference's
tests/test-on-simulated-reads.sh: classify simulated reads whose names encode
the source sequence, grade per rank."""

import io
import os

import pytest

DATA = os.path.join(os.path.dirname(__file__), "golden", "data")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "kraken.out")), reason="golden fixture missing"
)


def test_grade_on_golden(tmp_path):
    """Our reads encode 'readN_taxT'; rewrite names to the randomreads
    convention (six underscores then seqid, grade_classification.cpp:101-108)
    and grade."""
    kraken_in = open(os.path.join(DATA, "kraken.out")).read().splitlines()
    rewritten = tmp_path / "kraken.renamed"
    with open(rewritten, "w") as out:
        for line in kraken_in:
            f = line.split("\t")
            if f[1].startswith("read"):
                taxid = f[1].split("_tax")[1]
                f[1] = f"a_b_c_d_e_f_seq_{taxid}"
            else:
                f[1] = "a_b_c_d_e_f_seq_311"  # junk reads: pretend viral source
            out.write("\t".join(f) + "\n")

    from krakenuniq_tpu.report.grade import grade

    per_read = io.StringIO()
    stats = io.StringIO()
    res = grade(
        os.path.join(DATA, "taxDB"),
        os.path.join(DATA, "seqid2taxid.map"),
        str(rewritten),
        per_read,
        stats,
    )
    assert res["total_reads"] == 142
    # most genome-derived reads are called at species level correctly
    assert res["correct"]["species"] >= 100
    lines = stats.getvalue().splitlines()
    assert lines[0].startswith("#rank")
    assert any(l.startswith("species") for l in lines)
    # per-read file has 9 columns
    row = per_read.getvalue().splitlines()[0].split("\t")
    assert len(row) == 9

"""CLI feature goldens: hierarchical multi-DB lookup and paired-end input."""

import io
import os

import pytest

DATA = os.path.join(os.path.dirname(__file__), "golden", "data")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "kraken_hier.out")), reason="golden fixture missing"
)


def diff_lines(got, want, label):
    g, w = got.splitlines(), want.splitlines()
    assert len(g) == len(w), f"{label}: {len(g)} vs {len(w)} lines"
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b]
    assert not bad, f"{label}: {bad[0]}"


def test_hierarchical_multi_db():
    from krakenuniq_tpu.classify import Classifier, ClassifyOptions

    c = Classifier(
        [os.path.join(DATA, "db_bact"), os.path.join(DATA, "db_viral")],
        ClassifyOptions(print_progress=False),
    )
    out = io.StringIO()
    c.run([os.path.join(DATA, "reads.fa")], kraken_fh=out)
    diff_lines(out.getvalue(), open(os.path.join(DATA, "kraken_hier.out")).read(), "hier")
    rep = io.StringIO()
    c.write_report(rep)
    diff_lines(rep.getvalue(), open(os.path.join(DATA, "report_hier.tsv")).read(), "hier report")


def test_paired_end_merge_and_classify(tmp_path, capsys):
    """Our --paired path (merge + classify) matches read_merger.pl + classify."""
    from krakenuniq_tpu.formats.seqio import merge_paired
    from krakenuniq_tpu.classify import Classifier, ClassifyOptions

    merged = tmp_path / "merged.fa"
    with open(merged, "w") as fh:
        merge_paired(
            os.path.join(DATA, "reads_r1.fq"), os.path.join(DATA, "reads_r2.fq"), fh
        )
    assert merged.read_text() == open(os.path.join(DATA, "merged_golden.fa")).read()

    c = Classifier([DATA], ClassifyOptions(print_progress=False))
    out = io.StringIO()
    c.run([str(merged)], kraken_fh=out)
    diff_lines(out.getvalue(), open(os.path.join(DATA, "kraken_paired.out")).read(), "paired")

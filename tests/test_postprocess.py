"""Post-processing tools vs goldens produced by the reference Perl scripts."""

import io
import os

import pytest

from krakenuniq_tpu.report.postprocess import (
    basic_report,
    filter_output,
    mpa_report,
    translate,
)
from krakenuniq_tpu.report.extract_reads import extract_reads

DATA = os.path.join(os.path.dirname(__file__), "golden", "data")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "postproc_report.tsv")),
    reason="golden fixture missing",
)


def golden(name):
    with open(os.path.join(DATA, name)) as f:
        return f.read()


def kraken():
    return [os.path.join(DATA, "kraken.out")]


def test_basic_report():
    out = io.StringIO()
    basic_report(DATA, kraken(), out)
    assert out.getvalue() == golden("postproc_report.tsv")


def test_translate():
    out = io.StringIO()
    translate(DATA, kraken(), out)
    assert out.getvalue() == golden("translate.txt")


def test_translate_mpa():
    out = io.StringIO()
    translate(DATA, kraken(), out, mpa_format=True)
    assert out.getvalue() == golden("translate_mpa.txt")


def test_filter():
    out = io.StringIO()
    filter_output(DATA, kraken(), out, threshold=0.2)
    assert out.getvalue() == golden("filtered.out")


def test_mpa_report():
    out = io.StringIO()
    mpa_report(DATA, kraken(), out)
    assert out.getvalue() == golden("mpa_report.tsv")


def test_extract_fasta():
    out = io.StringIO()
    n = extract_reads([21], kraken()[0], os.path.join(DATA, "reads.fa"), out, fasta_input=True)
    assert out.getvalue() == golden("extract_21.fa")
    assert n == 6


def test_extract_subtree():
    out = io.StringIO()
    extract_reads(
        [21],
        kraken()[0],
        os.path.join(DATA, "reads.fa"),
        out,
        fasta_input=True,
        taxdb_path=os.path.join(DATA, "taxDB"),
    )
    assert out.getvalue() == golden("extract_21_subtree.fa")


def test_extract_fastq():
    out = io.StringIO()
    extract_reads([311], kraken()[0], os.path.join(DATA, "reads.fq"), out)
    assert out.getvalue() == golden("extract_311.fq")


def test_extract_inverted():
    out = io.StringIO()
    extract_reads(
        [311], kraken()[0], os.path.join(DATA, "reads.fa"), out, fasta_input=True, invert=True
    )
    assert out.getvalue() == golden("extract_not311.fa")

"""CLI entry points for the post-processing tools, flag-compatible with the
reference's krakenuniq-report / -translate / -filter / -mpa-report /
-extract-reads scripts."""

from __future__ import annotations

import argparse
import sys

from .dblib import find_db


def report_main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="krakenuniq-tpu-report")
    p.add_argument("--db", required=False)
    p.add_argument("--show-zeros", action="store_true")
    p.add_argument("--taxon-counts", action="store_true")
    p.add_argument("--taxon-list", action="store_true")
    p.add_argument("files", nargs="+")
    a = p.parse_args(argv)
    if a.taxon_counts and a.taxon_list:
        print("Specify either --taxon-counts or --taxon-list, not both!", file=sys.stderr)
        return 64
    mode = "taxon-counts" if a.taxon_counts else "taxon-list" if a.taxon_list else "kraken"
    from ..report.postprocess import basic_report

    basic_report(find_db(a.db), a.files, sys.stdout, show_zeros=a.show_zeros, mode=mode)
    return 0


def translate_main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="krakenuniq-tpu-translate")
    p.add_argument("--db", required=False)
    p.add_argument("--mpa-format", action="store_true")
    p.add_argument("files", nargs="+")
    a = p.parse_args(argv)
    from ..report.postprocess import translate

    translate(find_db(a.db), a.files, sys.stdout, mpa_format=a.mpa_format)
    return 0


def filter_main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="krakenuniq-tpu-filter")
    p.add_argument("--db", required=False)
    p.add_argument("--threshold", type=float, default=0.0)
    p.add_argument("files", nargs="+")
    a = p.parse_args(argv)
    if not 0 <= a.threshold <= 1:
        print("threshold must be in the interval [0,1].", file=sys.stderr)
        return 64
    from ..report.postprocess import filter_output

    filter_output(find_db(a.db), a.files, sys.stdout, threshold=a.threshold)
    return 0


def mpa_report_main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="krakenuniq-tpu-mpa-report")
    p.add_argument("--db", required=False)
    p.add_argument("--show-zeros", action="store_true")
    p.add_argument("--header-line", action="store_true")
    p.add_argument("--intermediate-ranks", action="store_true")
    p.add_argument("files", nargs="+")
    a = p.parse_args(argv)
    from ..report.postprocess import mpa_report

    mpa_report(
        find_db(a.db),
        a.files,
        sys.stdout,
        show_zeros=a.show_zeros,
        header_line=a.header_line,
        intermediate_ranks=a.intermediate_ranks,
    )
    return 0


def extract_reads_main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="krakenuniq-tpu-extract-reads")
    p.add_argument("-a", dest="fasta_input", action="store_true", help="input is FASTA")
    p.add_argument("-f", dest="fasta_output", action="store_true", help="output FASTA")
    p.add_argument("-i", dest="invert", action="store_true")
    p.add_argument("-p", dest="paired", action="store_true")
    p.add_argument("-t", dest="taxdb", default=None, help="taxDB for subtree expansion")
    p.add_argument("-v", dest="verbose", action="store_true")
    p.add_argument("taxon", help="taxid(s), comma separated")
    p.add_argument("kraken")
    p.add_argument("seqfile")
    a = p.parse_args(argv)
    from ..report.extract_reads import extract_reads

    extract_reads(
        [int(t) for t in a.taxon.split(",")],
        a.kraken,
        a.seqfile,
        sys.stdout,
        fasta_input=a.fasta_input,
        fasta_output=a.fasta_output,
        invert=a.invert,
        taxdb_path=a.taxdb,
        paired=a.paired,
    )
    return 0

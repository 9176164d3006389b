"""Small DB/taxonomy inspection tools vs reference behavior."""

import io
import os
import sys

import numpy as np
import pytest

from krakenuniq_tpu.cli import tools

DATA = os.path.join(os.path.dirname(__file__), "golden", "data")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "query_taxdb.out")), reason="golden fixture missing"
)


def run_main(fn, argv, stdin_text=""):
    out = io.StringIO()
    old_out, old_in = sys.stdout, sys.stdin
    sys.stdout = out
    sys.stdin = io.StringIO(stdin_text)
    try:
        rc = fn(argv)
    finally:
        sys.stdout, sys.stdin = old_out, old_in
    return rc, out.getvalue()


def test_query_taxdb_matches_reference():
    rc, out = run_main(
        tools.query_taxdb_main, [os.path.join(DATA, "taxDB"), "211", "311", "22", "1"]
    )
    assert rc == 0
    assert out == open(os.path.join(DATA, "query_taxdb.out")).read()


def test_count_unique_matches_reference():
    rc, out = run_main(
        tools.count_unique_main,
        ["-k", "21", "-p", "14"],
        stdin_text=open(os.path.join(DATA, "library.fna")).read(),
    )
    assert rc == 0
    assert out.strip() == open(os.path.join(DATA, "count_unique.out")).read().strip()


def test_dump_db_kmers():
    rc, out = run_main(tools.dump_db_kmers_main, [os.path.join(DATA, "database.kdb")])
    assert rc == 0
    from krakenuniq_tpu.formats import read_kdb

    _, keys, _ = read_kdb(os.path.join(DATA, "database.kdb"))
    got = np.asarray([int(x) for x in out.split()], dtype=np.uint64)
    np.testing.assert_array_equal(got, keys)


def test_dump_taxdb_roundtrip(tmp_path):
    rc, _ = run_main(
        tools.dump_taxdb_main,
        [os.path.join(DATA, "taxDB"), str(tmp_path / "names.dmp"), str(tmp_path / "nodes.dmp")],
    )
    assert rc == 0
    from krakenuniq_tpu.taxonomy import Taxonomy

    tax = Taxonomy.from_ncbi_dumps(tmp_path / "names.dmp", tmp_path / "nodes.dmp")
    out = io.StringIO()
    tax.write_taxdb(out)
    assert out.getvalue() == open(os.path.join(DATA, "taxDB")).read()


def test_read_uid_mapping():
    rc, out = run_main(
        tools.read_uid_mapping_main, [os.path.join(DATA, "uid_to_taxid.map")]
    )
    assert rc == 0
    lines = out.splitlines()
    assert lines[0].split("\t")[0] == "1"
    rc, out = run_main(
        tools.read_uid_mapping_main, [os.path.join(DATA, "uid_to_taxid.map"), "3"]
    )
    assert rc == 0 and out.startswith("3\t")


def test_upgrade_db(tmp_path, rng):
    import shutil

    from krakenuniq_tpu.formats import read_kdb, read_index, write_index
    from krakenuniq_tpu.utils import bits

    # build a v1-ordered (plain minimizer) database from the golden DB
    _, keys, vals = __import__("krakenuniq_tpu.formats", fromlist=["read_kdb"]).read_kdb(
        os.path.join(DATA, "database.kdb")
    )
    k, nt = 21, 7
    plain = bits.bin_key(keys, k, nt, xor_mask=0)
    order = np.argsort(plain, kind="stable")
    from krakenuniq_tpu.formats import write_kdb

    db = tmp_path
    write_kdb(db / "database.kdb", keys[order], vals[order], k=k)
    counts = np.bincount(plain[order].astype(np.int64), minlength=4**nt)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.uint64)
    write_index(db / "database.idx", nt, offsets, idx_type=1)

    rc, _ = run_main(tools.upgrade_db_main, [str(db)])
    assert rc == 0
    _, k2, v2 = read_kdb(db / "database.kdb")
    _, ref_keys, ref_vals = read_kdb(os.path.join(DATA, "database.kdb"))
    np.testing.assert_array_equal(k2, ref_keys)
    np.testing.assert_array_equal(v2, ref_vals)
    idx_type, _, off2 = read_index(db / "database.idx")
    _, _, ref_off = read_index(os.path.join(DATA, "database.idx"))
    assert idx_type == 2
    np.testing.assert_array_equal(off2, ref_off)


def test_get_kmers_tool(tmp_path, capsys):
    """get_kmers equivalent: every emitted k-mer/taxa line is consistent with
    a brute-force per-sequence extraction over the fixture library."""
    from krakenuniq_tpu.cli.tools import get_kmers_main
    from krakenuniq_tpu.build.db_build import extract_canonical_kmers, resolve_seq_taxid
    from krakenuniq_tpu.formats import read_kdb, read_seqid2taxid
    from krakenuniq_tpu.formats.seqio import read_sequences

    out = tmp_path / "kmers.tsv"
    rc = get_kmers_main([
        "-d", os.path.join(DATA, "database.kdb"),
        "-m", os.path.join(DATA, "seqid2taxid.map"),
        "-F", os.path.join(DATA, "library.fna"),
        "-o", str(out),
    ])
    assert rc == 0
    hdr, _, _ = read_kdb(os.path.join(DATA, "database.kdb"))
    seqmap = read_seqid2taxid(os.path.join(DATA, "seqid2taxid.map"))
    want: dict[int, set[int]] = {}
    for dna in read_sequences(os.path.join(DATA, "library.fna")):
        t = resolve_seq_taxid(dna.id, seqmap)
        if not t:
            continue
        for km in extract_canonical_kmers(dna.seq, hdr.k).tolist():
            want.setdefault(int(km), set()).add(t)
    got = {}
    for line in open(out):
        km, taxa = line.split("\t")
        got[int(km)] = {int(x) for x in taxa.strip().split(",")}
    assert got == want and len(got) > 0

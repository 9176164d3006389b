"""Build CLI end-to-end: reference-layout DB dir in, working database out."""

import os
import shutil

import numpy as np
import pytest

from krakenuniq_tpu.cli.build_main import main as build_main

DATA = os.path.join(os.path.dirname(__file__), "golden", "data")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "library.fna")), reason="golden fixture missing"
)


def setup_db_dir(tmp_path):
    db = tmp_path / "DB"
    (db / "library").mkdir(parents=True)
    shutil.copy(os.path.join(DATA, "library.fna"), db / "library")
    shutil.copy(os.path.join(DATA, "seqid2taxid.map"), db / "library" / "library.map")
    shutil.copytree(os.path.join(DATA, "taxonomy"), db / "taxonomy")
    return db


def test_build_matches_reference_db(tmp_path):
    db = setup_db_dir(tmp_path)
    rc = build_main(["--db", str(db), "--kmer-len", "21", "--minimizer-len", "7"])
    assert rc == 0
    from krakenuniq_tpu.formats import read_kdb, read_index

    _, keys, vals = read_kdb(db / "database.kdb")
    _, ref_keys, ref_vals = read_kdb(os.path.join(DATA, "database.kdb"))
    np.testing.assert_array_equal(keys, ref_keys)
    np.testing.assert_array_equal(vals, ref_vals)
    _, _, off = read_index(db / "database.idx")
    _, _, ref_off = read_index(os.path.join(DATA, "database.idx"))
    np.testing.assert_array_equal(off, ref_off)
    assert (db / "database.kdb.counts").exists()
    # taxDB round trips (our from-dumps builder vs the reference's taxDB)
    assert (db / "taxDB").read_text() == open(os.path.join(DATA, "taxDB")).read()
    # restartability: rerun skips, exit 0
    assert build_main(["--db", str(db), "--kmer-len", "21", "--minimizer-len", "7"]) == 0


def test_build_with_sequence_taxids(tmp_path):
    db = setup_db_dir(tmp_path)
    rc = build_main(
        ["--db", str(db), "--kmer-len", "21", "--minimizer-len", "7", "--taxids-for-sequences"]
    )
    assert rc == 0
    # the map now points at pseudo-taxids above 1e9
    mapping = dict(
        line.split("\t") for line in (db / "seqid2taxid.map").read_text().splitlines()
    )
    assert all(int(v) > 1_000_000_000 for v in mapping.values())
    # taxDB contains the sequence nodes parented at the original taxa
    taxdb = (db / "taxDB").read_text()
    assert "sequence" in taxdb
    # classification against the new DB assigns reads to sequence-level taxa
    import io

    from krakenuniq_tpu.classify import Classifier, ClassifyOptions

    c = Classifier([str(db)], ClassifyOptions(print_progress=False))
    out = io.StringIO()
    c.run([os.path.join(DATA, "reads.fa")], kraken_fh=out)
    calls = [int(l.split("\t")[2]) for l in out.getvalue().splitlines() if l.startswith("C")]
    assert any(c > 1_000_000_000 for c in calls)


def test_build_max_db_size(tmp_path):
    db = setup_db_dir(tmp_path)
    rc = build_main(
        ["--db", str(db), "--kmer-len", "21", "--minimizer-len", "7",
         "--max-db-size", "0.00002"]  # ~20 KB => ~2000 pairs
    )
    assert rc == 0
    from krakenuniq_tpu.formats import read_kdb

    hdr, keys, _ = read_kdb(db / "database.kdb")
    assert hdr.key_ct < 7000


def test_shrink_existing(tmp_path):
    db = setup_db_dir(tmp_path)
    assert build_main(["--db", str(db), "--kmer-len", "21", "--minimizer-len", "7"]) == 0
    rc = build_main(["--db", str(db), "--minimizer-len", "7", "--shrink", "500"])
    assert rc == 0
    from krakenuniq_tpu.formats import read_kdb

    hdr, keys, _ = read_kdb(str(db) + "_shrunk/database.kdb")
    assert hdr.key_ct == 500
    assert np.all(np.diff(np.asarray(keys, dtype=np.int64)) != 0)


def test_contaminant_taxid_build():
    """set_lcas -T semantics: contaminant-taxid sequences claim their k-mers
    directly (golden built with the reference binary)."""
    from krakenuniq_tpu.build import build_database
    from krakenuniq_tpu.formats import read_kdb
    from krakenuniq_tpu.formats.seqmap import read_seqid2taxid
    from krakenuniq_tpu.taxonomy import Taxonomy

    d = os.path.join(DATA, "db_contam")
    tax = Taxonomy.from_taxdb_file(os.path.join(d, "taxDB"))
    res = build_database(
        [os.path.join(d, "library.fna")],
        read_seqid2taxid(os.path.join(d, "seqid2taxid.map")),
        tax,
        k=21,
        nt=7,
    )
    _, ref_keys, ref_vals = read_kdb(os.path.join(d, "database.kdb"))
    np.testing.assert_array_equal(res.keys, ref_keys)
    np.testing.assert_array_equal(res.vals, ref_vals)
    assert (res.vals == 32630).sum() > 100  # the shared block is claimed


def test_lca_order_build(tmp_path):
    """KRAKEN_LCA_ORDER: later priority groups override earlier values for
    their own k-mers."""
    from krakenuniq_tpu.build import build_database
    from krakenuniq_tpu.formats.seqmap import read_seqid2taxid
    from krakenuniq_tpu.taxonomy import Taxonomy

    tax = Taxonomy.from_taxdb_file(os.path.join(DATA, "taxDB"))
    seqmap = read_seqid2taxid(os.path.join(DATA, "seqid2taxid.map"))
    lib = os.path.join(DATA, "library.fna")
    # split the library: viral sequence as its own priority group
    from krakenuniq_tpu.formats.seqio import read_sequences

    viral = tmp_path / "viral.fna"
    with open(viral, "w") as f:
        for dna in read_sequences(lib):
            if dna.id == "seq_311":
                f.write(f">{dna.id}\n{dna.seq}\n")

    base = build_database([lib], seqmap, tax, k=21, nt=7)
    prio = build_database([lib], seqmap, tax, k=21, nt=7, lca_order=[[str(viral)]])
    # k-mers exclusive to the viral genome keep their values; all values for
    # viral k-mers must equal the group-local assignment (311)
    np.testing.assert_array_equal(base.keys, prio.keys)
    viral_only = build_database([str(viral)], seqmap, tax, k=21, nt=7)
    import numpy as _np

    pos = _np.searchsorted(_np.sort(prio.keys), _np.sort(viral_only.keys))
    order = _np.argsort(prio.keys, kind="stable")
    sorted_vals = prio.vals[order]
    assert (_np.sort(viral_only.keys) == _np.sort(prio.keys)[pos]).all()
    assert (sorted_vals[pos] == 311).all()

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
    new_db = str(tmp_path / "DB_small")
    # --new-db is mandatory for the shrink task (krakenuniq-build:351-353)
    assert build_main(["--db", str(db), "--minimizer-len", "7", "--shrink", "500"]) == 64
    # N must be positive (krakenuniq-build:348-350)
    assert build_main(
        ["--db", str(db), "--minimizer-len", "7", "--shrink", "0", "--new-db", new_db]
    ) == 64
    rc = build_main(
        ["--db", str(db), "--minimizer-len", "7", "--shrink", "500", "--new-db", new_db]
    )
    assert rc == 0
    from krakenuniq_tpu.formats import read_kdb

    hdr, keys, _ = read_kdb(os.path.join(new_db, "database.kdb"))
    assert hdr.key_ct == 500
    assert np.all(np.diff(np.asarray(keys, dtype=np.int64)) != 0)
    # taxonomy seeded from the old DB (shrink_db.sh:42-43) + taxDB copied
    assert os.path.exists(os.path.join(new_db, "taxonomy", "nodes.dmp"))
    assert os.path.exists(os.path.join(new_db, "taxDB"))
    # an existing target aborts (shrink_db.sh:33-37)
    assert build_main(
        ["--db", str(db), "--minimizer-len", "7", "--shrink", "500", "--new-db", new_db]
    ) == 1


def test_upgrade_task_dispatch(tmp_path):
    """--upgrade re-sorts a v1 (plain minimizer order) DB to v2 scrambled
    order via the build CLI (krakenuniq-build:229-230 -> upgrade_db.sh)."""
    from krakenuniq_tpu.formats import read_index, read_kdb, write_index, write_kdb
    from krakenuniq_tpu.utils.bits import bin_key

    hdr, keys, vals = read_kdb(os.path.join(DATA, "database.kdb"))
    _, nt, _ = read_index(os.path.join(DATA, "database.idx"))
    # lay the pairs out in v1 (unscrambled) minimizer order
    b1 = bin_key(np.asarray(keys), hdr.k, nt, xor_mask=0)
    order = np.lexsort((keys, b1))
    db = tmp_path / "V1DB"
    db.mkdir()
    write_kdb(db / "database.kdb", np.asarray(keys)[order], np.asarray(vals)[order], k=hdr.k)
    counts = np.bincount(b1[order].astype(np.int64), minlength=4**nt)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.uint64)
    write_index(db / "database.idx", nt, offsets, idx_type=1)
    assert build_main(["--db", str(db), "--upgrade"]) == 0
    _, k2, v2 = read_kdb(db / "database.kdb")
    _, ref_k, ref_v = read_kdb(os.path.join(DATA, "database.kdb"))
    np.testing.assert_array_equal(k2, ref_k)
    np.testing.assert_array_equal(v2, ref_v)
    idx_type, _, off2 = read_index(db / "database.idx")
    _, _, ref_off = read_index(os.path.join(DATA, "database.idx"))
    assert idx_type == 2
    np.testing.assert_array_equal(off2, ref_off)
    # idempotent: a second upgrade is a no-op success
    assert build_main(["--db", str(db), "--upgrade"]) == 0


def test_reset_taxids_reruns_lca_step(tmp_path):
    """--reset-taxids re-runs value assignment over an existing kdb
    (build_db.sh:244) and regenerates the value-derived products."""
    db = setup_db_dir(tmp_path)
    assert build_main(["--db", str(db), "--kmer-len", "21", "--minimizer-len", "7"]) == 0
    from krakenuniq_tpu.formats import read_kdb

    _, _, vals_before = read_kdb(db / "database.kdb")
    # corrupt the values; a plain rerun must keep them (skip), a
    # --reset-taxids rerun must restore them
    kdb_path = db / "database.kdb"
    raw = bytearray(kdb_path.read_bytes())
    raw[-1] ^= 0xFF
    kdb_path.write_bytes(bytes(raw))
    assert build_main(["--db", str(db), "--kmer-len", "21", "--minimizer-len", "7"]) == 0
    _, _, vals_kept = read_kdb(db / "database.kdb")
    assert not np.array_equal(np.asarray(vals_kept), np.asarray(vals_before))
    assert build_main(
        ["--db", str(db), "--kmer-len", "21", "--minimizer-len", "7", "--reset-taxids"]
    ) == 0
    _, _, vals_after = read_kdb(db / "database.kdb")
    np.testing.assert_array_equal(np.asarray(vals_after), np.asarray(vals_before))
    assert (db / "database.kdb.counts").exists()
    assert (db / "database.report.tsv").exists()


def test_build_summary_report_and_log(tmp_path):
    """build_db.sh step 6b (self-classify library -> database.report.tsv,
    :305-312) and the timestamped database-build.log (:43-47)."""
    import re

    db = setup_db_dir(tmp_path)
    rc = build_main(["--db", str(db), "--kmer-len", "21", "--minimizer-len", "7"])
    assert rc == 0
    report = (db / "database.report.tsv").read_text()
    assert report.startswith("#")  # provenance header (krakenuniq:243-246)
    body = [l for l in report.splitlines() if l and not l.startswith("#")]
    assert any(l.split("\t")[7] == "species" for l in body[1:])
    kraken = (db / "database.kraken.tsv").read_text().splitlines()
    # self-classification of the library itself: every sequence classified
    assert kraken and all(l.startswith("C") for l in kraken)
    log = (db / "database-build.log").read_text().splitlines()
    assert len(log) >= 3  # taxDB + seqmap + build + report steps
    stamp = re.compile(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\t\S")
    assert all(stamp.match(l) for l in log)
    # restart skips the report step (file exists)
    n_lines = len(log)
    assert build_main(["--db", str(db), "--kmer-len", "21", "--minimizer-len", "7"]) == 0
    log2 = (db / "database-build.log").read_text().splitlines()
    assert len(log2) == n_lines + 1  # only the final "complete" line


def _standard_fetcher():
    """Offline fixture network for the --standard task: taxonomy +
    contaminants + three refseq domains + viral-neighbors."""
    import gzip

    from tests.test_download import ASSEMBLY_SUMMARY, make_fetcher, make_taxdump

    genome = b">NC_1.1 Escherichia coli\n" + b"ACGTTGCAGTTCACGTAAGGCTA" * 8 + b"\n"
    esearch = (
        b"<eSearchResult><Count>1</Count><RetMax>0</RetMax>"
        b"<QueryKey>1</QueryKey><WebEnv>WE1</WebEnv></eSearchResult>"
    )
    vn_fa = b">kraken:taxid|562|vn1\n" + b"TTGACCATGGCAATGCAGT" * 6 + b"\n"
    return make_fetcher(
        {
            "taxdump.tar.gz": make_taxdump(),
            "UniVec": b">uv1 adapter\n" + b"CTGCAGGAATTCGATATCAAG" * 5 + b"\n",
            "emvec": gzip.compress(b">ev1\n" + b"GATCCTCTAGAGTCGACCTG" * 5 + b"\n"),
            "assembly_summary.txt": ASSEMBLY_SUMMARY.encode(),
            "GCF_001_ASM1_genomic.fna.gz": gzip.compress(genome),
            "GCF_002_ASM2_genomic.fna.gz": gzip.compress(b">h9606\nAAAA\n"),
            "esearch.fcgi": esearch,
            "efetch.fcgi": vn_fa,
        }
    )


def test_standard_dispatch(tmp_path, monkeypatch):
    """--standard (krakenuniq-build:357-364): download taxonomy+contaminants,
    refseq domains + viral-neighbors, then build -- one command."""
    import krakenuniq_tpu.build.download as dlmod

    monkeypatch.setattr(dlmod, "_default_fetch", _standard_fetcher())
    db = tmp_path / "STD"
    rc = build_main(
        ["--db", str(db), "--standard", "--kmer-len", "21", "--minimizer-len", "7"]
    )
    assert rc == 0
    assert (db / "taxonomy" / "nodes.dmp").exists()
    assert (db / "library" / "contaminants" / "UniVec.fna").exists()
    for domain in ("archaea", "bacteria", "viral"):
        assert (db / "library" / domain).is_dir()
    assert (db / "library" / "viral-neighbors").is_dir()
    assert (db / "database.kdb").exists()
    assert (db / "database.idx").exists()
    assert (db / "taxDB").exists()
    assert (db / "database.report.tsv").exists()
    log = (db / "database-build.log").read_text()
    assert "krakenuniq-tpu-download" in log


def test_download_task_dispatch(tmp_path, monkeypatch):
    """--download-taxonomy / --download-library TYPE run the download and
    exit (krakenuniq-build:128-135 task list)."""
    import krakenuniq_tpu.build.download as dlmod

    monkeypatch.setattr(dlmod, "_default_fetch", _standard_fetcher())
    db = tmp_path / "DL"
    assert build_main(["--db", str(db), "--download-taxonomy"]) == 0
    assert (db / "taxonomy" / "names.dmp").exists()
    assert not (db / "database.kdb").exists()  # download task does NOT build
    assert build_main(["--db", str(db), "--download-library", "contaminants"]) == 0
    assert (db / "library" / "contaminants" / "UniVec.map").exists()


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


def test_streaming_build_bounded_memory(tmp_path):
    """The pair-spill engine: a tiny memory budget forces many disk buckets;
    result identical to the single-bucket build, and stream_database_to_dir
    writes byte-identical files (VERDICT r4 'make the DB builder scale')."""
    from krakenuniq_tpu.build import build_database
    from krakenuniq_tpu.build.db_build import stream_database_to_dir
    from krakenuniq_tpu.formats import write_index, write_kdb
    from krakenuniq_tpu.formats.seqmap import read_seqid2taxid
    from krakenuniq_tpu.taxonomy import Taxonomy

    tax = Taxonomy.from_taxdb_file(os.path.join(DATA, "taxDB"))
    seqmap = read_seqid2taxid(os.path.join(DATA, "seqid2taxid.map"))
    lib = [os.path.join(DATA, "library.fna")]

    big = build_database(lib, seqmap, tax, k=21, nt=7)
    small = build_database(lib, seqmap, tax, k=21, nt=7, memory_budget=64 << 10)
    np.testing.assert_array_equal(big.keys, small.keys)
    np.testing.assert_array_equal(big.vals, small.vals)
    np.testing.assert_array_equal(big.offsets, small.offsets)

    ram = tmp_path / "ram"
    stream = tmp_path / "stream"
    ram.mkdir(), stream.mkdir()
    write_kdb(ram / "database.kdb", big.keys, big.vals, k=21)
    write_index(ram / "database.idx", 7, big.offsets)
    stats = stream_database_to_dir(
        str(stream), lib, seqmap, tax, k=21, nt=7, memory_budget=64 << 10
    )
    assert stats["key_ct"] == len(big.keys)
    assert (stream / "database.kdb").read_bytes() == (ram / "database.kdb").read_bytes()
    assert (stream / "database.idx").read_bytes() == (ram / "database.idx").read_bytes()
    # the streamed .counts equals the histogram of the in-RAM value column
    from krakenuniq_tpu.formats.counts import counts_from_vals, write_counts

    write_counts(ram / "database.kdb.counts", counts_from_vals(big.vals))
    assert (stream / "database.kdb.counts").read_text() == (
        ram / "database.kdb.counts"
    ).read_text()


def test_lca_pairs_matches_fold():
    """Vectorized pairwise LCA == the scalar lca_fold oracle on every taxid
    pair of the fixture taxonomy (plus 0/unknown edge rules)."""
    from krakenuniq_tpu.taxonomy import Taxonomy

    tax = Taxonomy.from_taxdb_file(os.path.join(DATA, "taxDB"))
    ids = [int(t) for t in tax.taxids] + [0, 999_999]
    a, b = np.meshgrid(ids, ids)
    a, b = a.ravel().astype(np.uint32), b.ravel().astype(np.uint32)
    got = tax.lca_pairs(a, b)
    want = np.asarray(
        [tax.lca_fold([int(x), int(y)]) for x, y in zip(a, b)], dtype=np.uint32
    )
    np.testing.assert_array_equal(got, want)


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

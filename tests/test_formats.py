"""Round-trip tests for the on-disk format codecs."""

import numpy as np

from krakenuniq_tpu import formats
from krakenuniq_tpu.formats import kdb as kdbmod
from krakenuniq_tpu.formats.seqio import (
    read_sequences,
    merge_paired,
    is_fastq,
    open_maybe_compressed,
)


def test_kdb_roundtrip(tmp_path, rng):
    for k in (21, 31):
        keys = np.sort(rng.integers(0, 1 << (2 * k), size=1000, dtype=np.uint64))
        vals = rng.integers(1, 5000, size=1000, dtype=np.uint32)
        path = tmp_path / f"db{k}.kdb"
        hdr = formats.write_kdb(path, keys, vals, k=k)
        assert hdr.header_size == 72 + 2 * (4 + 8 * 2 * k)
        hdr2, keys2, vals2 = formats.read_kdb(path)
        assert hdr2.k == k and hdr2.key_ct == 1000
        np.testing.assert_array_equal(keys, keys2)
        np.testing.assert_array_equal(vals, vals2)


def test_kdb_header_math():
    hdr = kdbmod.KdbHeader(key_bits=62, val_len=4, key_ct=10)
    assert hdr.k == 31
    assert hdr.key_len == 8
    assert hdr.pair_size == 12
    assert hdr.header_size == 1072  # 72 + 2*(4 + 8*62)
    hdr21 = kdbmod.KdbHeader(key_bits=42, val_len=4, key_ct=10)
    assert hdr21.key_len == 6
    assert hdr21.pair_size == 10


def test_index_roundtrip(tmp_path, rng):
    nt = 6
    n = (1 << (2 * nt)) + 1
    offsets = np.cumsum(rng.integers(0, 5, size=n, dtype=np.uint64))
    path = tmp_path / "database.idx"
    formats.write_index(path, nt, offsets)
    idx_type, nt2, off2 = formats.read_index(path)
    assert idx_type == 2 and nt2 == nt
    np.testing.assert_array_equal(offsets, off2)


def test_counts_roundtrip(tmp_path):
    counts = {9606: 100, 1: 5, 562: 77}
    path = tmp_path / "database.kdb.counts"
    formats.write_counts(path, counts)
    assert formats.read_counts(path) == counts
    assert path.read_text().splitlines()[0] == "1\t5"  # sorted by taxid


def test_seqio_fasta_fastq(tmp_path):
    fa = tmp_path / "reads.fa"
    fa.write_text(">r1 some description\nACGTACGT\nACGT\n>r2\nGGGG\n")
    recs = list(read_sequences(fa))
    assert [r.id for r in recs] == ["r1", "r2"]
    assert recs[0].seq == "ACGTACGTACGT"
    assert recs[0].header_line == "r1 some description"
    assert not is_fastq(fa)

    fq = tmp_path / "reads.fq"
    fq.write_text("@q1\nACGT\n+\nIIII\n@q2 x\nTTTT\n+q2\nJJJJ\n")
    recs = list(read_sequences(fq))
    assert is_fastq(fq)
    assert [r.id for r in recs] == ["q1", "q2"]
    assert recs[1].quals == "JJJJ"


def test_seqio_gzip(tmp_path):
    import gzip

    fa = tmp_path / "reads.fa.gz"
    with gzip.open(fa, "wt") as f:
        f.write(">r1\nACGT\n")
    recs = list(read_sequences(fa))
    assert recs[0].seq == "ACGT"


def test_merge_paired(tmp_path):
    f1 = tmp_path / "r1.fq"
    f2 = tmp_path / "r2.fq"
    f1.write_text("@p/1\nAAAA\n+\nIIII\n")
    f2.write_text("@p/2\nCCCC\n+\nIIII\n")
    out = tmp_path / "merged.fa"
    with open(out, "w") as fh:
        n = merge_paired(f1, f2, fh, check_names=True)
    assert n == 1
    assert out.read_text() == ">p\nAAAACCCC".replace("AAAACCCC", "AAAANCCCC") + "\n"

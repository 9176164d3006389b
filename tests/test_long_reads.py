"""Reads longer than the device batch width: chunked lookup + host resolve."""

import io
import os

import numpy as np
import pytest

import reference_oracle as oracle
from krakenuniq_tpu.classify import Classifier, ClassifyOptions
from krakenuniq_tpu.formats import read_kdb
from krakenuniq_tpu.formats.seqio import read_sequences

DATA = os.path.join(os.path.dirname(__file__), "golden", "data")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "kraken.out")), reason="golden fixture missing"
)


def make_long_reads(tmp_path, n_copies=30):
    genomes = {d.id: d.seq for d in read_sequences(os.path.join(DATA, "library.fna"))}
    long_seq = (genomes["seq_211"] * n_copies)[:40_000]
    path = tmp_path / "long.fa"
    with open(path, "w") as f:
        f.write(f">long_read\n{long_seq}\n")
        f.write(f">short_read\n{genomes['seq_311'][100:250]}\n")
        f.write(f">long2\n{(genomes['seq_311'] * n_copies)[:35_000]}\n")
    return path, long_seq


def expected_call(seq, k=21):
    _, keys, vals = read_kdb(os.path.join(DATA, "database.kdb"))
    kv = dict(zip(keys.tolist(), vals.tolist()))
    from krakenuniq_tpu.taxonomy import Taxonomy

    tax = Taxonomy.from_taxdb_file(os.path.join(DATA, "taxDB"))
    pm = tax.parent_map()
    hits = {}
    for km, amb in oracle.scan_kmers(seq, k):
        if not amb:
            t = kv.get(oracle.canon(km, k), 0)
            if t:
                hits[t] = hits.get(t, 0) + 1
    return oracle.resolve_tree(hits, pm)


def test_long_reads(tmp_path):
    path, long_seq = make_long_reads(tmp_path)
    c = Classifier(
        [DATA], ClassifyOptions(print_progress=False, max_read_len=4096)
    )
    out = io.StringIO()
    c.run([str(path)], kraken_fh=out)
    lines = out.getvalue().splitlines()
    assert len(lines) == 3
    f0 = lines[0].split("\t")
    assert f0[1] == "long_read" and f0[3] == "40000"
    assert int(f0[2]) == expected_call(long_seq)
    # k-mer count in hit list covers the whole read
    total = sum(int(p.split(":")[1]) for p in f0[4].split())
    assert total == 40_000 - 21 + 1
    assert lines[1].split("\t")[1] == "short_read"
    assert lines[1].split("\t")[2] == "311"
    assert lines[2].split("\t")[1] == "long2"
    assert int(lines[2].split("\t")[2]) == 311


def test_long_reads_native_path_same(tmp_path):
    path, _ = make_long_reads(tmp_path)
    outs = []
    for native in (True, False):
        c = Classifier(
            [DATA],
            ClassifyOptions(print_progress=False, max_read_len=4096, use_native=native),
        )
        out = io.StringIO()
        c.run([str(path)], kraken_fh=out)
        rep = io.StringIO()
        c.write_report(rep)
        outs.append(out.getvalue() + rep.getvalue())
    assert outs[0] == outs[1]


def test_long_reads_exact_mode(tmp_path):
    """--exact composes with the long-read chunker: kraken lines match the
    HLL-mode run and the exact report matches the HLL report on a fixture
    where every HLL stays sparse (sparse mode is exact)."""
    path, _ = make_long_reads(tmp_path)
    outs, reps = [], []
    for exact in (False, True):
        c = Classifier(
            [DATA],
            ClassifyOptions(print_progress=False, max_read_len=4096, exact=exact),
        )
        out = io.StringIO()
        c.run([str(path)], kraken_fh=out)
        rep = io.StringIO()
        c.write_report(rep)
        outs.append(out.getvalue())
        reps.append(rep.getvalue())
    assert outs[0] == outs[1]
    # unique-kmer columns: the long reads push some taxa into dense HLL
    # territory, so compare only read/call columns plus taxon rows
    rows0 = [l.split("\t") for l in reps[0].splitlines()]
    rows1 = [l.split("\t") for l in reps[1].splitlines()]
    assert len(rows0) == len(rows1)
    for a, b in zip(rows0, rows1):
        assert a[1:3] == b[1:3] and a[6:] == b[6:]


def test_long_reads_device_counters(tmp_path):
    """--device-counters composes with the long-read chunker: calls and
    read/taxon counts are exact (long reads ride the host-side counter and
    merge at report time)."""
    path, _ = make_long_reads(tmp_path)
    outs, reps = [], []
    for dc in (False, True):
        c = Classifier(
            [DATA],
            ClassifyOptions(
                print_progress=False, max_read_len=4096, device_counters=dc
            ),
        )
        out = io.StringIO()
        c.run([str(path)], kraken_fh=out)
        rep = io.StringIO()
        c.write_report(rep)
        outs.append(out.getvalue())
        reps.append(rep.getvalue())
    assert outs[0] == outs[1]
    rows0 = [l.split("\t") for l in reps[0].splitlines()]
    rows1 = [l.split("\t") for l in reps[1].splitlines()]
    assert len(rows0) == len(rows1)
    for a, b in zip(rows0[1:], rows1[1:]):
        # %/reads/taxReads and identity columns are exact; the unique-k-mer
        # column is the DOCUMENTED --device-counters deviation (dense
        # registers vs the reference's sparse-exact regime for taxa under
        # ~1000 unique k-mers) -- allow a few percent
        assert a[0:3] == b[0:3] and a[6:] == b[6:]
        ka, kb = float(a[3]), float(b[3])
        assert abs(ka - kb) <= 0.05 * max(ka, kb, 1.0), (a, b)

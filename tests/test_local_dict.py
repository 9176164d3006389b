"""Per-span taxon dictionary: compact fast paths under huge taxonomies.

The real NCBI taxDB is ~2.4M nodes (reference taxdb.hpp:460-488 loads all of
nodes.dmp), far past the u16 field in the compact RLE rows / 6B-lane HLL
feed. A span touches few distinct taxa, so the device builds a per-span
dictionary and emits local ids (device_step.py local_dict). These tests run
a >65536-node taxonomy with the real species at the LARGEST dense ids and
assert the native compact path is byte-equal to the Python-record path
(whose per-k-mer planes carry full-width global ids).
"""

import io
import os

import numpy as np
import pytest

K, NT = 31, 9
PAD = 70_000  # taxonomy nodes beyond the u16 range


@pytest.fixture(scope="module")
def big_tax_db(tmp_path_factory):
    from krakenuniq_tpu.formats import write_index, write_kdb
    from krakenuniq_tpu.utils.demo import make_demo_db, make_demo_reads

    td = tmp_path_factory.mktemp("bigtax_db")
    # genome_len sized so the DB (~450k keys) spans >= 2 chunk tables at the
    # minimum chunk width the 70k-id taxonomy forces (lb >= 18, 4MB)
    keys, vals, offsets, tax, genomes = make_demo_db(
        n_species=50,
        genome_len=9000,
        k=K,
        nt=NT,
        species_base=10_000_000,
        pad_nodes=PAD,
    )
    assert tax.size > 0xFFFF
    # the real species must sit ABOVE the u16 range in dense-id space
    sid_dense = tax.dense_index(vals)
    assert int(sid_dense.min()) > 0xFFFF
    write_kdb(os.path.join(td, "database.kdb"), keys, vals, k=K)
    write_index(os.path.join(td, "database.idx"), NT, np.asarray(offsets, dtype=np.uint64))
    tax.write_taxdb(os.path.join(td, "taxDB"))
    reads = make_demo_reads(genomes, n_reads=400, read_len=150)
    # a few ambiguous/short edge reads
    reads += ["ACGT" * 10 + "N" * 5 + "ACGT" * 30, "A" * (K - 1), "N" * 60]
    reads_path = os.path.join(td, "reads.fa")
    with open(reads_path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")
    return str(td), reads_path


def _run(db, reads, **kw):
    from krakenuniq_tpu.classify import Classifier, ClassifyOptions

    # these tests exercise the per-span dictionary FALLBACK, which only
    # engages when the value pool (db/pool.py) is disabled
    kw.setdefault("value_pool", False)
    c = Classifier([db], ClassifyOptions(print_progress=False, **kw))
    out, rep = io.StringIO(), io.StringIO()
    c.run([reads], kraken_fh=out)
    c.write_report(rep)
    return out.getvalue(), rep.getvalue(), c


def test_local_dict_engaged(big_tax_db):
    db, reads = big_tax_db
    _, _, c = _run(db, reads)
    if c._cfg.max_runs == 0:
        pytest.skip("native extension unavailable; compact path unused")
    assert c._cfg.dense_runs and c._cfg.local_dict


def test_native_compact_equals_python_path(big_tax_db):
    db, reads = big_tax_db
    out_n, rep_n, c = _run(db, reads)
    if c._cfg.max_runs == 0:
        pytest.skip("native extension unavailable")
    out_p, rep_p, _ = _run(db, reads, use_native=False)
    assert out_n == out_p
    assert rep_n == rep_p


@pytest.mark.parametrize("kw", [{"quick": True, "min_hits": 2}, {"exact": True}])
def test_modes_under_local_dict(big_tax_db, kw):
    db, reads = big_tax_db
    out_n, rep_n, c = _run(db, reads, **kw)
    if c._cfg.max_runs == 0:
        pytest.skip("native extension unavailable")
    assert c._cfg.local_dict
    out_p, rep_p, _ = _run(db, reads, use_native=False, **kw)
    assert out_n == out_p
    assert rep_n == rep_p


def test_dict_overflow_redispatch(big_tax_db):
    """A dictionary too small for the span forces the wide re-dispatch;
    output must be unchanged."""
    db, reads = big_tax_db
    out0, rep0, c0 = _run(db, reads)
    if c0._cfg.max_runs == 0:
        pytest.skip("native extension unavailable")
    out1, rep1, c1 = _run(db, reads, dict_capacity=4)
    assert c1._cfg.local_dict and c1._cfg.dict_capacity == 4
    assert out0 == out1
    assert rep0 == rep1


def test_device_counters_under_big_taxonomy(big_tax_db):
    """--device-counters composes with the local dict and stays bit-exact
    (sparse-regime tracking works in global dense-id space)."""
    db, reads = big_tax_db
    out0, rep0, c0 = _run(db, reads)
    if c0._cfg.max_runs == 0:
        pytest.skip("native extension unavailable")
    out1, rep1, c1 = _run(db, reads, device_counters=True)
    assert c1._cfg.local_dict
    assert out0 == out1
    assert rep0 == rep1


def test_mesh_under_big_taxonomy(big_tax_db):
    """The compact (local-dict) layout now runs under a mesh: per-data-shard
    dictionaries are all_gathered into one span-global lut (device_step.py).
    Output and report must be byte-equal to the single-chip run."""
    db, reads = big_tax_db
    out0, rep0, c0 = _run(db, reads)
    if c0._cfg.max_runs == 0:
        pytest.skip("native extension unavailable")
    out1, rep1, c1 = _run(db, reads, mesh_data=2, mesh_db=2)
    assert c1.mesh is not None and c1._cfg.local_dict and c1._cfg.dense_runs
    assert out0 == out1
    assert rep0 == rep1


def test_mesh_dict_overflow_redispatch(big_tax_db):
    """Dictionary overflow under a mesh falls back to a sharded wide-layout
    re-dispatch; output unchanged."""
    db, reads = big_tax_db
    out0, rep0, c0 = _run(db, reads)
    if c0._cfg.max_runs == 0:
        pytest.skip("native extension unavailable")
    out1, rep1, c1 = _run(db, reads, mesh_data=2, mesh_db=2, dict_capacity=4)
    assert c1.mesh is not None and c1._cfg.local_dict
    assert out0 == out1
    assert rep0 == rep1


def test_ooc_under_big_taxonomy(big_tax_db):
    """Out-of-core chunking composes with the local dict. The fused value
    field pins chunk width to >= bit_length(max dense id) + 1, so the budget
    sits just above that floor to force a multi-chunk split."""
    from krakenuniq_tpu.taxonomy import Taxonomy

    db, reads = big_tax_db
    tax = Taxonomy.from_taxdb_file(os.path.join(db, "taxDB"))
    lb_floor = int(tax.size - 1).bit_length() + 1
    budget = (1 << lb_floor) * 16 + 64
    out0, rep0, c0 = _run(db, reads)
    if c0._cfg.max_runs == 0:
        pytest.skip("native extension unavailable")
    out1, rep1, c1 = _run(db, reads, preload_size=budget)
    assert c1._ooc is not None and c1._cfg.local_dict
    assert c1._ooc[0].n_chunks >= 2
    assert out0 == out1
    assert rep0 == rep1

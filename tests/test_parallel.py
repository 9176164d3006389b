"""Multi-chip sharding: N-shard mesh result must equal the single-chip result
(the reference's own chunked-vs-preload equality guarantee, paper.md:112)."""

import os

import jax
import numpy as np
import pytest

from krakenuniq_tpu.classify.device_step import StepConfig, classify_step
from krakenuniq_tpu.db import load_database_dir
from krakenuniq_tpu.kmer import encode_batch
from krakenuniq_tpu.parallel import (
    make_mesh,
    make_sharded_classify_fn,
    partition_bins_equal_keys,
    shard_db_planes,
)
from krakenuniq_tpu.formats.seqio import read_sequences

DATA = os.path.join(os.path.dirname(__file__), "golden", "data")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "kraken.out")), reason="golden fixture missing"
)


def test_partitioner(rng):
    sizes = rng.integers(0, 50, size=1000)
    offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.uint64)
    bounds = partition_bins_equal_keys(offsets, 8)
    assert bounds[0][0] == 0 and bounds[-1][1] == 1000
    for (a, b), (c, d) in zip(bounds, bounds[1:]):
        assert b == c  # contiguous
    keys_per = [int(offsets[hi] - offsets[lo]) for lo, hi in bounds]
    total = int(offsets[-1])
    for kp in keys_per:
        assert kp <= total // 8 + 50  # within one max-bin of balanced


@pytest.mark.parametrize("n_data,n_db", [(2, 4), (1, 8), (8, 1), (4, 2)])
def test_sharded_equals_single(n_data, n_db):
    db, tax = load_database_dir(DATA)
    reads = [d.seq for d in read_sequences(os.path.join(DATA, "reads.fa"))][:64]
    enc = encode_batch(reads, lb=256, batch=64)
    cfg = StepConfig(
        k=db.k, nt=db.nt, n_iter=db.search_iters, max_depth=tax.max_depth
    )
    root = np.int32(tax.dense_index(np.asarray([1], dtype=np.uint32))[0])
    single = classify_step(
        ((db.keys, db.vals, db.vals_dense, db.offsets, 0),),
        tax.taxids.astype(np.uint32),
        tax.tin,
        tax.tout,
        tax.parent,
        root,
        enc.codes,
        enc.ambig,
        enc.lengths,
        cfg,
    )

    planes = shard_db_planes(
        np.asarray(db.keys), np.asarray(db.vals), np.asarray(db.vals_dense),
        np.asarray(db.offsets), n_db,
    )
    mesh = make_mesh(n_data, n_db)
    fn, _ = make_sharded_classify_fn(
        mesh, planes, tax.taxids.astype(np.uint32), tax.tin, tax.tout, tax.parent, root, cfg
    )
    sharded = fn(enc.codes, enc.ambig, enc.lengths)

    for key in ("taxa", "ambig", "call", "hits", "enc", "hll_lanes"):
        np.testing.assert_array_equal(
            np.asarray(single[key]), np.asarray(sharded[key]), err_msg=key
        )


@pytest.mark.parametrize("n_data,n_db", [(2, 4), (1, 8)])
def test_hash_sharded_equals_single(n_data, n_db):
    from krakenuniq_tpu.parallel.partition import shard_hash_tables

    db, tax = load_database_dir(DATA)
    reads = [d.seq for d in read_sequences(os.path.join(DATA, "reads.fa"))][:64]
    enc = encode_batch(reads, lb=256, batch=64)
    # match the table's id space: pool arrays when the value pool engaged
    if db.pool is not None:
        idmap = db.pool.taxids.astype(np.uint32)
        tin, tout, parent = db.pool.tin, db.pool.tout, db.pool.parent
        root = np.int32(db.pool.root)
        depth = db.pool.max_depth
        table_vals = db.pool.pool_index(np.asarray(db.vals_dense))
    else:
        idmap = tax.taxids.astype(np.uint32)
        tin, tout, parent = tax.tin, tax.tout, tax.parent
        root = np.int32(tax.dense_index(np.asarray([1], dtype=np.uint32))[0])
        depth = tax.max_depth
        table_vals = np.asarray(db.vals_dense)
    cfg = StepConfig(
        k=db.k, nt=db.nt, n_iter=db.search_iters, max_depth=depth,
        lookup_mode="hash", hash_lbs=(db.hash_lb,),
    )
    single = classify_step(
        (db.hash_table,),
        idmap, tin, tout, parent, root,
        enc.codes, enc.ambig, enc.lengths, cfg,
    )
    planes = shard_hash_tables(
        np.asarray(db.keys), np.asarray(db.vals), table_vals,
        np.asarray(db.offsets), n_db,
    )
    mesh = make_mesh(n_data, n_db)
    fn, _ = make_sharded_classify_fn(
        mesh, planes, idmap, tin, tout, parent, root, cfg
    )
    sharded = fn(enc.codes, enc.ambig, enc.lengths)
    for key in ("taxa", "ambig", "call", "hits", "enc", "hll_lanes"):
        np.testing.assert_array_equal(
            np.asarray(single[key]), np.asarray(sharded[key]), err_msg=key
        )


@pytest.mark.parametrize("n_data,n_db", [(2, 4), (1, 8), (8, 1)])
def test_mesh_pipeline_matches_single_chip(n_data, n_db, tmp_path):
    """The FULL pipeline (Classifier with mesh_data/mesh_db) produces byte-
    identical kraken output and reports to the single-chip pipeline -- the
    spatialized form of the reference's chunked-vs-preload equality claim
    (paper.md:112)."""
    import io
    import os

    DATA = os.path.join(os.path.dirname(__file__), "golden", "data")
    if not os.path.exists(os.path.join(DATA, "kraken.out")):
        pytest.skip("golden fixture missing")
    from krakenuniq_tpu.classify import Classifier, ClassifyOptions

    reads = os.path.join(DATA, "reads.fa")
    outs, reps = [], []
    for md, mdb in ((1, 1), (n_data, n_db)):
        c = Classifier(
            [DATA], ClassifyOptions(print_progress=False, mesh_data=md, mesh_db=mdb)
        )
        out, rep = io.StringIO(), io.StringIO()
        c.run([reads], kraken_fh=out)
        c.write_report(rep)
        outs.append(out.getvalue())
        reps.append(rep.getvalue())
    assert outs[0] == outs[1]
    body = [
        [l for l in r.splitlines() if not l.startswith("#")] for r in reps
    ]
    assert body[0] == body[1]
    # and both equal the golden produced by the reference binaries
    assert outs[0] == open(os.path.join(DATA, "kraken.out")).read()


@pytest.mark.parametrize(
    "mode,n_data,n_db",
    [
        ("uid", 1, 4),
        ("hier", 2, 2),
        ("device_counters", 2, 4),
        ("nonpow2", 3, 2),
        ("long_reads", 2, 2),
        ("quick", 3, 1),
    ],
)
def test_mesh_feature_matrix(mode, n_data, n_db, tmp_path):
    """The full mesh feature matrix: UID tables, hierarchical multi-DB,
    device counters, non-power-of-two data shards, and long reads all
    produce byte-identical output to the single-chip run (the spatial form
    of the reference's chunked-vs-preload equality, paper.md:112)."""
    import io
    import os

    DATA = os.path.join(os.path.dirname(__file__), "golden", "data")
    if not os.path.exists(os.path.join(DATA, "kraken.out")):
        pytest.skip("golden fixture missing")
    from krakenuniq_tpu.classify import Classifier, ClassifyOptions

    reads = os.path.join(DATA, "reads.fa")
    dbs = [DATA]
    kw = {}
    uid = False
    golden = None
    if mode == "uid":
        uid = True
        golden = "kraken_uid.out"
    elif mode == "hier":
        dbs = [os.path.join(DATA, "db_bact"), os.path.join(DATA, "db_viral")]
        golden = "kraken_hier.out"
    elif mode == "device_counters":
        kw = {"device_counters": True}
    elif mode == "quick":
        kw = {"quick": True, "min_hits": 2}
        golden = "kraken_quick.out"
    elif mode == "long_reads":
        # craft an input with one read past max_read_len
        src = open(reads).read().splitlines()
        seqs = [l for l in src if not l.startswith(">")]
        lr = tmp_path / "long.fa"
        lr.write_text(f">long1\n{''.join(seqs)[:3000]}\n" + "\n".join(src[:12]) + "\n")
        reads = str(lr)
        kw = {"max_read_len": 1024}
    else:
        golden = "kraken.out"

    outs, reps = [], []
    for md, mdb in ((1, 1), (n_data, n_db)):
        c = Classifier(
            dbs,
            ClassifyOptions(print_progress=False, mesh_data=md, mesh_db=mdb, **kw),
            uid_database=uid,
        )
        out, rep = io.StringIO(), io.StringIO()
        c.run([reads], kraken_fh=out)
        c.write_report(rep)
        outs.append(out.getvalue())
        reps.append(rep.getvalue())
    assert outs[0] == outs[1]
    assert reps[0] == reps[1]
    if golden:
        assert outs[1] == open(os.path.join(DATA, golden)).read()

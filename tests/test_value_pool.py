"""Value-pool (LCA-closed value dictionary) correctness: closure property,
pool-space tree resolution vs the node-space/oracle answers, and pipeline
equality between pooled and dense-id tables."""

import io
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import reference_oracle as oracle  # noqa: E402

from krakenuniq_tpu.db.pool import build_value_pool  # noqa: E402
from krakenuniq_tpu.taxonomy import Taxonomy, resolve_reads  # noqa: E402

from test_taxonomy import random_taxonomy, write_taxdb  # noqa: E402


def _random_pool(tmp_path, rng, n_nodes=60, n_vals=25):
    taxids, parents, names, ranks = random_taxonomy(rng, n_nodes=n_nodes)
    path = write_taxdb(tmp_path, taxids, parents, names, ranks)
    tax = Taxonomy.from_taxdb_file(path)
    vals = rng.choice(np.asarray(taxids, np.uint32), size=n_vals, replace=True)
    vd = tax.dense_index(vals)
    pool = build_value_pool([vd], tax)
    return tax, vd, pool


@pytest.mark.parametrize("trial", range(4))
def test_closure_property(tmp_path, rng, trial):
    tax, vd, pool = _random_pool(tmp_path, rng)
    assert pool is not None
    rows = set(pool.rows.tolist())
    assert 0 in rows
    assert set(np.unique(vd).tolist()) <= rows
    # closed under pairwise LCA (dense space)
    pm = tax.parent_map()
    dense_of = {int(t): i for i, t in enumerate(tax.taxids)}
    members = [int(tax.taxids[r]) for r in pool.rows if r != 0]
    for a in members[:12]:
        for b in members[:12]:
            l = oracle.lca(pm, a, b)
            assert dense_of[l] in rows, (a, b, l)
    # virtual parent is a proper ancestor (or self for roots)
    for i, r in enumerate(pool.rows):
        p = pool.parent[i]
        if p != i:
            assert pool.tin[p] <= pool.tin[i] < pool.tout[p]


@pytest.mark.parametrize("trial", range(3))
def test_pool_resolve_matches_oracle(tmp_path, rng, trial):
    tax, vd, pool = _random_pool(tmp_path, rng, n_nodes=50, n_vals=18)
    pm = tax.parent_map()
    b, w = 48, 16
    vpool = np.unique(vd)
    taxa_dense = vpool[rng.integers(0, len(vpool), size=(b, w))]
    hit = rng.random((b, w)) < 0.7
    taxa_dense = np.where(hit, taxa_dense, 0)
    hit = taxa_dense != 0

    pool_ids = pool.pool_index(taxa_dense)
    calls_pool = np.asarray(
        resolve_reads(
            pool_ids.astype(np.int32),
            hit,
            pool.tin,
            pool.tout,
            pool.parent,
            np.int32(pool.root),
            pool.max_depth,
        )
    )
    for i in range(b):
        hits: dict[int, int] = {}
        for t in taxa_dense[i][hit[i]]:
            tid = int(tax.taxids[t])
            hits[tid] = hits.get(tid, 0) + 1
        expect = oracle.resolve_tree(hits, pm)
        got = int(pool.taxids[calls_pool[i]])
        assert got == expect, (i, hits, expect, got)


def test_pipeline_pool_equals_dense(tmp_path):
    """Classifier(value_pool=True) output is byte-identical to the dense-id
    path on a demo DB (kraken output + report)."""
    from krakenuniq_tpu.classify import Classifier, ClassifyOptions
    from krakenuniq_tpu.formats import write_index, write_kdb
    from krakenuniq_tpu.utils.demo import make_demo_db, make_demo_reads

    keys, vals, offsets, tax, genomes = make_demo_db(
        n_species=6, genome_len=3000, k=31, nt=7
    )
    d = tmp_path / "db"
    d.mkdir()
    write_kdb(d / "database.kdb", keys, vals, k=31)
    write_index(d / "database.idx", 7, np.asarray(offsets, dtype=np.uint64))
    tax.write_taxdb(d / "taxDB")
    reads = make_demo_reads(genomes, n_reads=150, read_len=120)
    rp = tmp_path / "reads.fa"
    rp.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(reads)))

    outs = {}
    for vp in (True, False):
        c = Classifier(
            [str(d)],
            ClassifyOptions(print_progress=False, value_pool=vp),
        )
        if vp:
            assert c._pool is not None and c.dbs[0].pool is not None
        else:
            assert c._pool is None
        kr = io.StringIO()
        c.run([str(rp)], kraken_fh=kr)
        rep = io.StringIO()
        c.write_report(rep)
        outs[vp] = (kr.getvalue(), rep.getvalue())
        # pool and dense tables cache to different files (.ht / .ht_dense)
        (d / "database.kdb.ht").unlink(missing_ok=True)
        (d / "database.kdb.ht_dense").unlink(missing_ok=True)
        (d / "database.kdb.counts").unlink(missing_ok=True)
    assert outs[True][0] == outs[False][0]
    assert outs[True][1] == outs[False][1]

"""Taxonomy tree + device resolve_tree vs the reference-semantics oracle."""

import numpy as np
import pytest

import reference_oracle as oracle
from krakenuniq_tpu.taxonomy import Taxonomy, resolve_reads


def random_taxonomy(rng, n_nodes=60):
    """Random tree over taxids 1..; parents always have smaller taxid."""
    taxids = [1]
    parents = [1]
    names = ["root"]
    ranks = ["no rank"]
    all_ranks = ["superkingdom", "phylum", "genus", "species", "no rank"]
    for i in range(2, n_nodes + 2):
        taxids.append(i * 10 if i % 3 else i)  # non-contiguous taxids
        parents.append(int(rng.choice(taxids[:-1])))
        names.append(f"taxon {i}")
        ranks.append(all_ranks[int(rng.integers(len(all_ranks)))])
    return taxids, parents, names, ranks


def write_taxdb(tmp_path, taxids, parents, names, ranks):
    p = tmp_path / "taxDB"
    with open(p, "w") as f:
        for t, pa, n, r in zip(taxids, parents, names, ranks):
            f.write(f"{t}\t{pa}\t{n}\t{r}\n")
    return p


def test_taxdb_roundtrip(tmp_path, rng):
    taxids, parents, names, ranks = random_taxonomy(rng)
    path = write_taxdb(tmp_path, taxids, parents, names, ranks)
    tax = Taxonomy.from_taxdb_file(path)
    assert tax.taxids[0] == 0 and tax.names[0] == "unclassified"
    out = tmp_path / "taxDB.out"
    tax.write_taxdb(out)
    tax2 = Taxonomy.from_taxdb_file(out)
    assert tax2.parent_map() == tax.parent_map()
    # writing is sorted by taxid
    lines = out.read_text().splitlines()
    ids = [int(l.split("\t")[0]) for l in lines]
    assert ids == sorted(ids)


def test_parent_map_and_euler(tmp_path, rng):
    taxids, parents, names, ranks = random_taxonomy(rng)
    path = write_taxdb(tmp_path, taxids, parents, names, ranks)
    tax = Taxonomy.from_taxdb_file(path)
    pm = tax.parent_map()
    assert pm[1] == 0  # root maps to 0 like getParentMap (taxdb.hpp:392)
    # Euler intervals agree with chain-walk ancestorship
    dense = {int(t): i for i, t in enumerate(tax.taxids)}
    for t in taxids[1:20]:
        node = t
        chain = [node]
        while pm.get(node, 0) != 0:
            node = pm[node]
            chain.append(node)
        for anc in chain:
            assert tax.is_ancestor_dense(dense[anc], dense[t])
        # a non-ancestor should not satisfy the interval test
        non_anc = [x for x in taxids if x not in chain]
        if non_anc:
            assert not tax.is_ancestor_dense(dense[non_anc[-1]], dense[t])


@pytest.mark.parametrize("trial", range(3))
def test_resolve_matches_oracle(tmp_path, rng, trial):
    taxids, parents, names, ranks = random_taxonomy(rng, n_nodes=40)
    path = write_taxdb(tmp_path, taxids, parents, names, ranks)
    tax = Taxonomy.from_taxdb_file(path)
    pm = tax.parent_map()

    b, w = 64, 24
    pool = np.asarray([0] * 10 + taxids, dtype=np.uint32)
    taxa = pool[rng.integers(0, len(pool), size=(b, w))]
    hit_mask = taxa != 0
    taxa_dense = tax.dense_index(taxa)

    root_dense = int(tax.dense_index(np.asarray([1], dtype=np.uint32))[0])
    calls = np.asarray(
        resolve_reads(
            taxa_dense,
            hit_mask,
            tax.tin,
            tax.tout,
            tax.parent,
            np.int32(root_dense),
            tax.max_depth,
        )
    )
    for i in range(b):
        hits: dict[int, int] = {}
        for t in taxa[i]:
            if t:
                hits[int(t)] = hits.get(int(t), 0) + 1
        expect = oracle.resolve_tree(hits, pm)
        got = int(tax.taxids[calls[i]])
        assert got == expect, (i, hits, expect, got)


def test_taxid_at_rank(tmp_path):
    path = tmp_path / "taxDB"
    path.write_text(
        "1\t1\troot\tno rank\n"
        "2\t1\tBacteria\tsuperkingdom\n"
        "561\t2\tEscherichia\tgenus\n"
        "562\t561\tEscherichia coli\tspecies\n"
    )
    tax = Taxonomy.from_taxdb_file(path)
    assert tax.taxid_at_rank(562, "genus") == 561
    assert tax.taxid_at_rank(562, "superkingdom") == 2
    assert tax.taxid_at_rank(562, "family") == 0
    assert tax.rank_of(562) == "species"
    assert tax.name_of(561) == "Escherichia"


def test_set_genome_sizes(tmp_path):
    path = tmp_path / "taxDB"
    path.write_text(
        "1\t1\troot\tno rank\n"
        "2\t1\tBacteria\tsuperkingdom\n"
        "562\t2\tE. coli\tspecies\n"
    )
    tax = Taxonomy.from_taxdb_file(path)
    tax.set_genome_sizes({562: 100, 2: 10})
    d = {int(t): i for i, t in enumerate(tax.taxids)}
    assert int(tax.genome_size[d[562]]) == 100
    assert int(tax.genome_size[d[2]]) == 10
    assert int(tax.genome_size_children[d[2]]) == 100
    assert int(tax.genome_size_children[d[1]]) == 110

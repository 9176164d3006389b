"""Deterministic in-memory demo database + reads (no files, no downloads).

Used by __graft_entry__ and bench.py to exercise the full classify step at
arbitrary scale: synthetic genomes under a small taxonomy, the same
canonical-k-mer/minimizer layout as a real database.
"""

from __future__ import annotations

import numpy as np

from ..taxonomy import Taxonomy
from ..utils import bits

_CODE = np.full(256, 255, np.uint8)
for _c, _v in zip(b"ACGT", range(4)):
    _CODE[_c] = _v
_BASES = np.array(list("ACGT"))


def _canonical_kmers(seq: str, k: int) -> np.ndarray:
    arr = _CODE[np.frombuffer(seq.encode(), np.uint8)]
    if len(arr) < k:
        return np.empty(0, dtype=np.uint64)
    km = np.zeros(len(arr) - k + 1, dtype=np.uint64)
    for t in range(k):
        km |= arr[t : t + len(km)].astype(np.uint64) << np.uint64(2 * (k - 1 - t))
    return bits.canonical_representation(km, k)


def make_demo_taxonomy(n_species: int) -> tuple[Taxonomy, list[int]]:
    taxids = [1, 2]
    parents = [1, 1]
    names = ["root", "Bacteria"]
    ranks = ["no rank", "superkingdom"]
    species = []
    n_genera = max(1, n_species // 4)
    for g in range(n_genera):
        gid = 100 + g
        taxids.append(gid)
        parents.append(2)
        names.append(f"Genus{g}")
        ranks.append("genus")
    for s in range(n_species):
        sid = 1000 + s
        taxids.append(sid)
        parents.append(100 + (s % n_genera))
        names.append(f"Species {s}")
        ranks.append("species")
        species.append(sid)
    tax = Taxonomy._build(taxids, parents, names, ranks, [0] * len(taxids), [0] * len(taxids), False)
    return tax, species


def make_demo_db(
    n_species: int = 8,
    genome_len: int = 4000,
    k: int = 31,
    nt: int = 9,
    seed: int = 7,
):
    """Returns (keys, vals, offsets, taxonomy, genomes_by_taxid)."""
    rng = np.random.default_rng(seed)
    tax, species = make_demo_taxonomy(n_species)
    genomes = {}
    kmer_chunks, taxon_chunks = [], []
    for sid in species:
        g = "".join(_BASES[rng.integers(0, 4, size=genome_len)])
        genomes[sid] = g
        km = np.unique(_canonical_kmers(g, k))
        kmer_chunks.append(km)
        taxon_chunks.append(np.full(len(km), sid, dtype=np.uint32))
    kmers = np.concatenate(kmer_chunks)
    taxa = np.concatenate(taxon_chunks)
    # keep first occurrence per k-mer (collisions across genomes are ~0 for
    # random sequence at k=31; LCA semantics are exercised by the golden tests)
    kmers, idx = np.unique(kmers, return_index=True)
    taxa = taxa[idx]
    b = bits.bin_key(kmers, k, nt)
    order = np.lexsort((kmers, b))
    keys, vals, b = kmers[order], taxa[order], b[order]
    counts = np.bincount(b.astype(np.int64), minlength=4**nt)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return keys, vals, offsets, tax, genomes


def make_demo_reads(
    genomes: dict[int, str], n_reads: int, read_len: int = 150, seed: int = 11
) -> list[str]:
    rng = np.random.default_rng(seed)
    sids = list(genomes)
    out = []
    for i in range(n_reads):
        g = genomes[sids[int(rng.integers(len(sids)))]]
        start = int(rng.integers(0, max(1, len(g) - read_len)))
        out.append(g[start : start + read_len])
    return out

"""Deterministic in-memory demo database + reads (no files, no downloads).

Used by __graft_entry__ and bench.py to exercise the full classify step at
arbitrary scale: synthetic genomes under a small taxonomy, the same
canonical-k-mer/minimizer layout as a real database.

The heavy steps (k-mer extraction, dedup, scrambled-minimizer binning,
sorting) run on the device -- on weak hosts the numpy equivalent takes
minutes for multi-million-k-mer databases.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..kmer import ops as kops
from ..taxonomy import Taxonomy
from ..utils.bits import INDEX2_XOR_MASK

_BASES_B = np.frombuffer(b"ACGT", dtype=np.uint8)


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


def _minimizers_from_kmers(kmers: jax.Array, k: int, nt: int) -> jax.Array:
    """bin_key over packed k-mers (krakendb.cpp:182-196), device version."""
    mask = np.uint64((1 << (2 * nt)) - 1)
    xm = np.uint64(INDEX2_XOR_MASK) & mask
    best = jnp.full(kmers.shape, jnp.uint64(0xFFFFFFFFFFFFFFFF))
    x = kmers
    for _ in range(k - nt + 1):
        cand = xm ^ kops.canonical_representation(x & mask, nt)
        best = jnp.minimum(best, cand)
        x = x >> np.uint64(2)
    return best


def make_demo_db(
    n_species: int = 8,
    genome_len: int = 4000,
    k: int = 31,
    nt: int = 9,
    seed: int = 7,
):
    """Returns (keys, vals, offsets, taxonomy, genomes_by_taxid) with keys
    sorted in reference (minimizer-bin, key) order."""
    tax, species = make_demo_taxonomy(n_species)
    # genome codes generated on host (tiny data; the device threefry kernels
    # are disproportionately expensive to compile on remote transports)
    rng = np.random.default_rng(seed)
    host_codes = rng.integers(0, 4, size=(n_species, genome_len), dtype=np.uint8)
    codes = jax.device_put(host_codes)

    @jax.jit
    def extract(codes):
        kmers = kops.canonical_representation(kops.pack_windows(codes, k), k)
        flat = kmers.reshape(-1)
        sp = jnp.broadcast_to(
            jnp.arange(n_species, dtype=jnp.uint32)[:, None], kmers.shape
        ).reshape(-1)
        skeys, svals = jax.lax.sort((flat, sp), num_keys=1)
        first = jnp.concatenate([jnp.ones(1, bool), skeys[1:] != skeys[:-1]])
        bins = _minimizers_from_kmers(skeys, k, nt)
        return skeys, svals, first, bins

    skeys, svals, first, bins = extract(codes)
    host_first = np.asarray(first)
    keys = np.asarray(skeys)[host_first]
    sp = np.asarray(svals)[host_first]
    b = np.asarray(bins)[host_first]

    @jax.jit
    def sort_by_bin(keys, b, sp):
        sb, sk, ssp = jax.lax.sort((b, keys, sp), num_keys=2)
        counts = jnp.bincount(sb.astype(jnp.int32), length=4**nt)
        return sk, ssp, counts

    sk, ssp, counts = sort_by_bin(keys, b, sp)
    keys = np.asarray(sk)
    sp = np.asarray(ssp)
    offsets = np.concatenate([[0], np.cumsum(np.asarray(counts))]).astype(np.int64)
    vals = np.asarray(species, dtype=np.uint32)[sp]

    genomes = {}
    for i, sid in enumerate(species):
        genomes[sid] = _BASES_B[host_codes[i]].tobytes().decode()
    return keys, vals, offsets, tax, genomes


def make_demo_reads(
    genomes: dict[int, str], n_reads: int, read_len: int = 150, seed: int = 11
) -> list[str]:
    rng = np.random.default_rng(seed)
    sids = list(genomes)
    picks = rng.integers(0, len(sids), size=n_reads)
    out = []
    for i in range(n_reads):
        g = genomes[sids[int(picks[i])]]
        start = int(rng.integers(0, max(1, len(g) - read_len)))
        out.append(g[start : start + read_len])
    return out

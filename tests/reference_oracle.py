"""Tiny, deliberately-slow Python oracles replicating the reference's
observable semantics (from the cited C++ sources, re-derived not copied).
Used only in tests as the ground truth for differential testing.
"""

from __future__ import annotations

XOR_MASK = 0xE37E28C4271B5A2D
U64 = (1 << 64) - 1


def revcomp(kmer: int, n: int) -> int:
    """krakendb.cpp:218-225 semantics."""
    out = 0
    for i in range(n):
        base = (kmer >> (2 * i)) & 3
        out = (out << 2) | (3 - base)
    return out


def canon(kmer: int, n: int) -> int:
    return min(kmer, revcomp(kmer, n))


def bin_key(kmer: int, k: int, nt: int) -> int:
    """krakendb.cpp:182-196 semantics (64-bit mask)."""
    mask = (1 << (2 * nt)) - 1
    xm = XOR_MASK & mask
    best = U64
    for _ in range(k - nt + 1):
        best = min(best, xm ^ canon(kmer & mask, nt))
        kmer >>= 2
    return best


def scan_kmers(seq: str, k: int) -> list[tuple[int, bool]]:
    """KmerScanner semantics (krakenutil.cpp:239-282): returns
    (kmer, is_ambiguous) for each of the len(seq)-k+1 positions; empty list
    for sequences shorter than k."""
    if len(seq) < k:
        return []
    kmer_mask = (1 << (2 * k)) - 1
    ambig_mask = (1 << k) - 1
    out = []
    kmer = 0
    ambig = 0
    loaded = 0
    for ch in seq:
        loaded += 1
        kmer = (kmer << 2) & kmer_mask
        ambig = (ambig << 1) & ambig_mask
        code = {"A": 0, "a": 0, "C": 1, "c": 1, "G": 2, "g": 2, "T": 3, "t": 3}.get(ch)
        if code is None:
            ambig |= 1
        else:
            kmer |= code
        if loaded >= k:
            out.append((kmer, ambig != 0))
    return out


def murmur64(key: int) -> int:
    """hyperloglogplus.cpp:830-838 semantics."""
    key = (key + 1) & U64
    key ^= key >> 33
    key = (key * 0xFF51AFD7ED558CCD) & U64
    key ^= key >> 33
    key = (key * 0xC4CEB9FE1A85EC53) & U64
    key ^= key >> 33
    return key


def lca(parent_map: dict[int, int], a: int, b: int) -> int:
    """krakenutil.cpp:90-118 semantics."""
    if a == 0 or b == 0:
        return a if a else b
    a_path = set()
    while a > 1:
        a_path.add(a)
        if a not in parent_map:
            break
        a = parent_map[a]
    while b > 1:
        if b in a_path:
            return b
        if b not in parent_map:
            break
        b = parent_map[b]
    return 1


def resolve_tree(hit_counts: dict[int, int], parent_map: dict[int, int]) -> int:
    """krakenutil.cpp:149-200 semantics."""
    max_taxa: set[int] = set()
    max_taxon, max_score = 0, 0
    for taxon in hit_counts:
        node, score = taxon, 0
        while node > 0:
            score += hit_counts.get(node, 0)
            parent = parent_map.get(node)
            if parent is None or parent == node:
                break
            node = parent
        if score > max_score:
            max_taxa = set()
            max_score = score
            max_taxon = taxon
        elif score == max_score:
            if not max_taxa:
                max_taxa.add(max_taxon)
            max_taxa.add(taxon)
    if max_taxa:
        it = iter(sorted(max_taxa))
        max_taxon = next(it)
        for t in it:
            max_taxon = lca(parent_map, max_taxon, t)
    return max_taxon


def hitlist_string(taxa: list[int], ambig: list[bool]) -> str:
    """classify.cpp:826-861 semantics."""
    parts = []
    last_code = -1 if ambig[0] else taxa[0]
    count = 1
    for t, a in zip(taxa[1:], ambig[1:]):
        code = -1 if a else t
        if code == last_code:
            count += 1
        else:
            parts.append(f"A:{count}" if last_code < 0 else f"{last_code}:{count}")
            count = 1
            last_code = code
    parts.append(f"A:{count}" if last_code < 0 else f"{last_code}:{count}")
    return " ".join(parts)

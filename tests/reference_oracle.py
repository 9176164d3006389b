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


# ----------------------------------------------------------------- HLL oracle

P_PRIME = 25
M_PRIME = 1 << P_PRIME


def _clz(x: int, width: int) -> int:
    if x == 0:
        return width
    n = 0
    for i in range(width - 1, -1, -1):
        if x >> i:
            break
        n += 1
    return width - x.bit_length()


def get_rank64(h: int, p: int) -> int:
    shifted = (h << p) & U64
    return min(_clz(shifted, 64), 64 - p) + 1


def get_rank32(v: int, p: int) -> int:
    shifted = (v << p) & 0xFFFFFFFF
    return min(_clz(shifted, 32), 32 - p) + 1


def encode_hash(h: int, p: int) -> int:
    idx = ((h >> (64 - P_PRIME)) << (32 - P_PRIME)) & 0xFFFFFFFF
    if (idx << p) & 0xFFFFFFFF == 0:
        return idx | (get_rank64(h, P_PRIME) << 1) | 1
    return idx


def encoded_rank(v: int, p: int) -> int:
    if v & 1:
        return (P_PRIME - p) + ((v >> 1) & 0x3F)
    return get_rank32(v, p)


class OracleHLL:
    """One-item-at-a-time replica of HyperLogLogPlusMinus semantics."""

    def __init__(self, p=12):
        self.p = p
        self.m = 1 << p
        self.sparse = True
        self.sparse_set: set[int] = set()
        self.M: list[int] | None = None
        self.n_observed = 0

    def insert(self, item: int):
        self.n_observed += 1
        h = murmur64(item)
        if self.sparse and len(self.sparse_set) + 1 > self.m // 4:
            self._switch()
        if self.sparse:
            self.sparse_set.add(encode_hash(h, self.p))
        else:
            idx = h >> (64 - self.p)
            rank = get_rank64(h, self.p)
            if rank > self.M[idx]:
                self.M[idx] = rank

    def _switch(self):
        self.sparse = False
        self.M = [0] * self.m
        for v in self.sparse_set:
            idx = v >> (32 - self.p)
            rank = encoded_rank(v, self.p)
            if rank > self.M[idx]:
                self.M[idx] = rank
        self.sparse_set = set()

    def merge(self, other: "OracleHLL"):
        if other.n_observed == 0:
            return
        if self.n_observed == 0:
            self.n_observed = other.n_observed
            self.sparse = other.sparse
            self.sparse_set = set(other.sparse_set)
            self.M = None if other.M is None else list(other.M)
            return
        self.n_observed += other.n_observed
        if self.sparse and other.sparse:
            self.sparse_set |= other.sparse_set
        elif other.sparse:
            for v in other.sparse_set:
                idx = v >> (32 - self.p)
                rank = encoded_rank(v, self.p)
                if rank > self.M[idx]:
                    self.M[idx] = rank
        else:
            if self.sparse:
                old = self.sparse_set
                self.sparse = False
                self.M = list(other.M)
                for v in old:
                    idx = v >> (32 - self.p)
                    rank = encoded_rank(v, self.p)
                    if rank > self.M[idx]:
                        self.M[idx] = rank
                self.sparse_set = set()
            else:
                self.M = [max(a, b) for a, b in zip(self.M, other.M)]

    def ertl(self) -> int:
        import math

        if self.sparse:
            q, m = 64 - P_PRIME, M_PRIME
            C = [0] * 66
            for v in self.sparse_set:
                C[encoded_rank(v, self.p)] += 1
            C[0] = m - len(self.sparse_set)
        else:
            q, m = 64 - self.p, self.m
            C = [0] * 66
            for r in self.M:
                C[r] += 1

        def sigma(x):
            if x == 1.0:
                return math.inf
            s, y = x, 1.0
            while True:
                prev = s
                x *= x
                s += x * y
                y += y
                if s == prev:
                    return s

        def tau(x):
            if x in (0.0, 1.0):
                return 0.0
            y, t = 1.0, 1.0 - x
            while True:
                prev = t
                x = math.sqrt(x)
                y /= 2.0
                t -= (1.0 - x) ** 2 * y
                if t == prev:
                    return t / 3.0

        den = m * tau(1.0 - C[q + 1] / m)
        for k in range(q, 0, -1):
            den += C[k]
            den *= 0.5
        den += m * sigma(C[0] / m)
        est = (m / (2.0 * math.log(2.0))) * m / den
        if self.n_observed < est:
            return self.n_observed
        return int(math.floor(est + 0.5))

"""LCA database construction.

Reproduces -- byte-for-byte on the output files -- the reference build
pipeline's compute steps (scripts/build_db.sh steps 1-3 and 6):

  1. the k-mer *set* of the library (Jellyfish `count -C` equivalent:
     every canonical k-mer of every library sequence, non-ACGT windows
     skipped -- KmerScanner semantics, krakenutil.cpp:239-278),
  2. optional down-sampling to a maximum database size (db_shrink.cpp:80-113
     block sampling),
  3. minimizer binning + in-bin sort (db_sort.cpp:80-116: order is
     (scrambled-minimizer bin, k-mer)),
  6. the LCA fold over library sequences (set_lcas.cpp:429-476), including
     the contaminant-taxid override (`-T`, always passed by build_db.sh:271),
     `-E` minimum sequence size, the seqid->taxid resolution rules
     (exact map hit, `.N` numeric-suffix fallback, `kraken:taxid|` headers,
     set_lcas.cpp:290-323), and `--lca-order` priority rebuilds
     (reset + re-set passes, build_db.sh:279-301).

Unlike the reference (which streams sequences through a per-base scanner and
mutates a mmap'd file), everything here is vectorized per sequence: k-mers
are packed/canonicalized as whole numpy arrays and the LCA fold is applied
per unique (k-mer, sequence) pair. The fold itself is order-independent
(LCA is associative/commutative; the contaminant override is first-wins),
so per-sequence vectorization is exact.

Dynamic taxids (`-a`/`-A`: per-sequence / per-assembly pseudo-taxids above
1e9, set_lcas.cpp:182-266) are handled by `expand_dynamic_taxids`.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from typing import Iterable, Iterator

import numpy as np

from ..formats.seqio import read_sequences
from ..utils.bits import bin_key, canonical_representation

TID_HUMAN = 9606
TID_MOUSE = 10090
# k-mers in contaminant sequences keep the contaminant taxid (set_lcas.cpp:88-89)
TID_CONTAMINANT1 = 32630  # 'synthetic construct'
TID_CONTAMINANT2 = 81077  # 'artificial sequences'
NEW_TAXID_START = 1_000_000_000
KRAKEN_PREFIX = "kraken:taxid|"

_CODE = np.full(256, 255, dtype=np.uint8)
for _b, _c in zip(b"AaCcGgTt", (0, 0, 1, 1, 2, 2, 3, 3)):
    _CODE[_b] = _c


def extract_canonical_kmers(seq: str | bytes, k: int) -> np.ndarray:
    """All valid canonical k-mers of a sequence, in scan order.

    KmerScanner semantics (krakenutil.cpp:239-278): lowercase acgt accepted,
    any other byte poisons every window containing it. Newlines never appear
    here (seqio strips them)."""
    if isinstance(seq, str):
        seq = seq.encode("ascii", "replace")
    buf = np.frombuffer(seq, dtype=np.uint8)
    n = len(buf)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    codes = _CODE[buf]
    ambig = codes == 255
    codes64 = np.where(ambig, 0, codes).astype(np.uint64)
    nk = n - k + 1
    km = np.zeros(nk, dtype=np.uint64)
    for j in range(k):
        km = (km << np.uint64(2)) | codes64[j : j + nk]
    if ambig.any():
        cs = np.concatenate([[0], np.cumsum(ambig)])
        valid = (cs[k:] - cs[:-k]) == 0
        km = km[valid]
    return canonical_representation(km, k)


def resolve_seq_taxid(seqid: str, seqmap: dict[str, int]) -> int:
    """Sequence-ID -> taxid resolution (set_lcas.cpp:290-323): exact map hit,
    then numeric `.N` version-suffix fallback, then `kraken:taxid|NNN|...`."""
    t = seqmap.get(seqid)
    if t is not None:
        return t
    pos = seqid.rfind(".")
    if pos != -1 and seqid[pos + 1 :].isdigit():
        t = seqmap.get(seqid[:pos])
        if t is not None:
            return t
    if seqid.startswith(KRAKEN_PREFIX):
        digits = ""
        for ch in seqid[len(KRAKEN_PREFIX) :]:
            if ch.isdigit():
                digits += ch
            else:
                break
        if digits:
            return int(digits)
    return 0


@dataclass
class BuildResult:
    keys: np.ndarray  # uint64, sorted by (scrambled-minimizer bin, k-mer)
    vals: np.ndarray  # uint32 LCA taxids
    offsets: np.ndarray  # uint64, len 4**nt + 1


def _iter_tagged_sequences(
    fastas: Iterable[str],
    seqmap: dict[str, int],
    known_taxids: set[int] | None,
    min_sequence_size: int,
    verbose: bool = False,
) -> Iterator[tuple[int, bool, str]]:
    """Yield (taxid, is_contaminant, seq) applying set_lcas's skip rules."""
    for path in fastas:
        for dna in read_sequences(path):
            if not dna.seq:
                continue
            taxid = resolve_seq_taxid(dna.id, seqmap)
            if taxid == 0:
                if verbose:
                    print(f"no taxid mapping for sequence {dna.id}", file=sys.stderr)
                continue
            if min_sequence_size > 0 and len(dna.seq) < min_sequence_size:
                continue
            if known_taxids is not None and taxid not in known_taxids:
                if verbose:
                    print(
                        f"skipping sequence {dna.id}: taxid {taxid} not in taxDB",
                        file=sys.stderr,
                    )
                continue
            is_contam = taxid in (TID_CONTAMINANT1, TID_CONTAMINANT2)
            yield taxid, is_contam, dna.seq


class _LcaFolder:
    """The per-k-mer value state machine of set_lcas.cpp:429-476 with the
    `-T` contaminant override, vectorized per sequence."""

    def __init__(self, skeys: np.ndarray, slot_of_sorted: np.ndarray, taxonomy):
        self.skeys = skeys
        self.slot = slot_of_sorted
        self.vals = np.zeros(len(skeys), dtype=np.uint32)  # slot-indexed
        self.tax = taxonomy
        self._lca_cache: dict[tuple[int, int], int] = {}

    def _hit_slots(self, kmers: np.ndarray) -> np.ndarray:
        uniq = np.unique(kmers)
        pos = np.searchsorted(self.skeys, uniq)
        pos = pos[pos < len(self.skeys)]
        hit = self.skeys[pos] == uniq[: len(pos)]
        return self.slot[pos[hit]]

    def _lca(self, a: int, b: int) -> int:
        if a == 0:
            return b
        if b == 0:
            return a
        if a == b:
            return a
        key = (a, b) if a < b else (b, a)
        r = self._lca_cache.get(key)
        if r is None:
            r = self.tax.lca_fold([a, b])
            self._lca_cache[key] = r
        return r

    def reset(self, kmers: np.ndarray) -> None:
        """set_lcas -R (build_db.sh:291): zero this sequence's k-mer values."""
        self.vals[self._hit_slots(kmers)] = 0

    def fold(self, kmers: np.ndarray, taxid: int, is_contam: bool) -> None:
        idx = self._hit_slots(kmers)
        cur = self.vals[idx]
        locked = (cur == TID_CONTAMINANT1) | (cur == TID_CONTAMINANT2)
        if is_contam:
            self.vals[idx] = np.where(locked, cur, np.uint32(taxid))
            return
        new = cur.copy()
        todo = ~locked
        for c in np.unique(cur[todo]).tolist():
            new[todo & (cur == c)] = self._lca(int(c), taxid)
        self.vals[idx] = new


def build_database(
    fastas: list[str],
    seqmap: dict[str, int],
    taxonomy,
    k: int,
    nt: int,
    db_dir: str | None = None,
    min_sequence_size: int = 0,
    max_kmers: int | None = None,
    lca_order: list[list[str]] | None = None,
    verbose: bool = False,
) -> BuildResult:
    """One-pass library -> (keys, vals, offsets) database build.

    `lca_order`: optional priority groups of library files; after the base
    pass each group's k-mers are reset then re-folded group-locally
    (build_db.sh:279-301), so later groups claim their own k-mers.
    """
    # --- step 1: the canonical k-mer set (Jellyfish count -C equivalent).
    # Collected from EVERY library sequence, regardless of taxid mapping or
    # minimum size -- those filters only apply to the LCA pass (build_db.sh
    # step 1 cats the whole library; set_lcas skips happen later).
    chunks: list[np.ndarray] = []
    for path in fastas:
        for dna in read_sequences(path):
            if dna.seq:
                chunks.append(extract_canonical_kmers(dna.seq, k))
    keys = (
        np.unique(np.concatenate(chunks)) if chunks else np.empty(0, dtype=np.uint64)
    )

    # --- step 2: optional down-sampling (db_shrink semantics).
    if max_kmers is not None and len(keys) > max_kmers:
        keys, _ = shrink_pairs(keys, None, max_kmers, 1)

    # --- step 3: minimizer binning + (bin, k-mer) sort (db_sort.cpp:80-116).
    b = bin_key(keys, k, nt)
    order = np.lexsort((keys, b))
    keys = keys[order]
    counts = np.bincount(b[order].astype(np.int64), minlength=4**nt)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.uint64)

    # --- step 6: LCA fold (set_lcas with -T, build_db.sh:270-272).
    sort_perm = np.argsort(keys, kind="stable")
    skeys = keys[sort_perm]
    folder = _LcaFolder(skeys, sort_perm.astype(np.int64), taxonomy)
    known = set(int(t) for t in taxonomy.taxids)
    for taxid, is_contam, seq in _iter_tagged_sequences(
        fastas, seqmap, known, min_sequence_size, verbose
    ):
        folder.fold(extract_canonical_kmers(seq, k), taxid, is_contam)

    # --- --lca-order hierarchical re-set (build_db.sh:279-301): per priority
    # group, a reset pass (-TR) then a re-set pass (-T).
    for group in lca_order or []:
        group_kmers = [
            (taxid, is_contam, extract_canonical_kmers(seq, k))
            for taxid, is_contam, seq in _iter_tagged_sequences(
                group, seqmap, known, min_sequence_size, verbose
            )
        ]
        for _, _, kms in group_kmers:
            folder.reset(kms)
        for taxid, is_contam, kms in group_kmers:
            folder.fold(kms, taxid, is_contam)

    return BuildResult(keys=keys, vals=folder.vals, offsets=offsets)


def shrink_pairs(
    keys: np.ndarray, vals: np.ndarray | None, n: int, offset: int = 1
) -> tuple[np.ndarray, np.ndarray | None]:
    """Down-sample to n pairs, one per block, `offset` from the block end
    (db_shrink.cpp:80-113: the first key_ct % n blocks get an extra element)."""
    key_ct = len(keys)
    if n >= key_ct:
        return keys, vals
    block = key_ct // n
    if block < offset:
        raise ValueError(f"offset {offset} larger than block size {block}")
    sizes = np.full(n, block, dtype=np.int64)
    sizes[: key_ct % n] += 1
    sel = np.cumsum(sizes) - offset
    return keys[sel], (vals[sel] if vals is not None else None)


def expand_dynamic_taxids(
    taxonomy,
    map_lines: list[tuple[str, int, str]],
    for_assembly: bool = False,
    for_sequences: bool = False,
):
    """Pseudo-taxid expansion (set_lcas -a/-A, set_lcas.cpp:182-266).

    `map_lines` are (seqid, taxid, name) from seqid2taxid.map; returns
    (new_taxonomy, seqid->taxid map). New taxids start above 1e9 (bumped
    past any existing id + 100); assembly names and sequence ids share one
    dedup namespace, as in the reference."""
    start = NEW_TAXID_START
    for t in taxonomy.taxids:
        if int(t) >= start:
            start = int(t) + 100
    name_to_taxid: dict[str, int] = {}
    new_nodes: list[tuple[int, int, str, str]] = []
    seqmap: dict[str, int] = {}

    def get_new_taxid(name: str, parent: int, rank: str) -> int:
        nonlocal start
        existing = name_to_taxid.get(name)
        if existing is not None:
            return existing
        start += 1
        new_nodes.append((start, parent, name, rank))
        name_to_taxid[name] = start
        return start

    for seqid, taxid, name in map_lines:
        if seqid in seqmap:
            continue  # first mapping wins (set_lcas.cpp:233-237)
        orig = taxid
        if for_assembly and name:
            taxid = get_new_taxid(name, taxid, "assembly")
        if for_sequences and orig not in (TID_HUMAN, TID_MOUSE):
            taxid = get_new_taxid(seqid, taxid, "sequence")
        seqmap[seqid] = taxid

    return taxonomy.with_added_nodes(new_nodes), seqmap

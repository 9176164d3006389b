"""Per-taxon read/k-mer/unique-k-mer accumulation (host side).

Mirrors the reference's two-level structure: a fresh per-work-unit
accumulator (thread-local my_taxon_counts, classify.cpp:525-535) merged into
the global map under the output critical section (classify.cpp:542-544).
Keeping the unit structure is what makes sparse->dense HLL transitions, and
therefore the report's unique-k-mer columns, bit-reproducible.
"""

from __future__ import annotations

import numpy as np

from ..hll import HLL, ExactCounter, ReadCounts


class TaxonCounter:
    def __init__(self, hll_precision: int = 12, exact: bool = False):
        self.hll_precision = hll_precision
        self.exact = exact
        self.counts: dict[int, ReadCounts] = {}

    def _new_container(self):
        return ExactCounter() if self.exact else HLL(self.hll_precision)

    def process_unit(
        self,
        taxa_flat: np.ndarray,  # uint32 [n]: taxon per counted k-mer, stream order
        enc_flat: np.ndarray,  # uint32 [n]: HLL encoding (or uint64 k-mers if exact)
        calls: np.ndarray,  # uint32 [reads]: per-read call
    ) -> None:
        unit: dict[int, ReadCounts] = {}
        if len(taxa_flat):
            order = np.argsort(taxa_flat, kind="stable")  # preserves stream order per taxon
            t_sorted = taxa_flat[order]
            e_sorted = enc_flat[order]
            bounds = np.flatnonzero(np.diff(t_sorted)) + 1
            starts = np.concatenate([[0], bounds])
            ends = np.concatenate([bounds, [len(t_sorted)]])
            for s, e in zip(starts.tolist(), ends.tolist()):
                taxon = int(t_sorted[s])
                rc = ReadCounts(self._new_container())
                rc.n_kmers = e - s
                if self.exact:
                    rc.kmers.insert_items(e_sorted[s:e])
                else:
                    rc.kmers.insert_encodings(e_sorted[s:e])
                unit[taxon] = rc
        for c in calls.tolist():
            c = int(c)
            rc = unit.get(c)
            if rc is None:
                rc = ReadCounts(self._new_container())
                unit[c] = rc
            rc.increment_read_count()
        # merge unit into global (order-independent, see hll.py module doc)
        for taxon in sorted(unit):
            g = self.counts.get(taxon)
            if g is None:
                self.counts[taxon] = unit[taxon]
            else:
                g.iadd(unit[taxon])

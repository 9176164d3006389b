"""End-to-end classification driver.

Streams reads in work units (greedy >= unit_size bp, replicating the
deterministic partition of classify.cpp:511-521), pads each unit into a
bucketed (B, LB) batch, runs the jitted device step, and handles all text
output + per-taxon accumulation on host.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import jax
import numpy as np

from ..db import DeviceDB, load_database_dir
from ..formats.counts import (
    counts_from_vals,
    read_counts_stream_bugcompat,
    write_counts,
)
from ..formats.seqio import (
    DNASequence,
    format_sequence,
    is_fastq,
    open_maybe_compressed,
    open_output,
    read_fasta,
    read_fastq,
)
from ..formats import read_kdb
from ..report import TaxReport, DEFAULT_COLS, FULL_COLS
from ..taxonomy import Taxonomy
from .accumulate import TaxonCounter
from .device_step import StepConfig, classify_step
from .output import kraken_line

DEF_WORK_UNIT_SIZE = 500_000  # bp, classify.cpp:38


@dataclasses.dataclass
class ClassifyOptions:
    quick: bool = False
    min_hits: int = 1
    # NOTE (reference bug compatibility): the reference's -p flag sets
    # HLL_PRECISION but that value is never passed to any HLL constructor --
    # every counter is built at the default precision 12
    # (hyperloglogplus.hpp:87, classify.cpp:289,1094). The flag only gates
    # whether unique-k-mer report columns appear. We replicate that: counters
    # always use precision 12 unless `true_hll_precision` is set, which opts
    # into the documented behavior.
    hll_precision: int = 12
    true_hll_precision: bool = False
    exact: bool = False
    only_classified_output: bool = False
    print_sequence: bool = False
    work_unit_size: int = DEF_WORK_UNIT_SIZE
    max_read_len: int = 1 << 15  # pad bucket cap; longer reads are rejected for now
    min_batch_reads: int = 64  # round B up to a multiple of this
    full_report: bool = False
    report_zeros: bool = False
    print_progress: bool = True


def _bucket(n: int, lo: int) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class Classifier:
    def __init__(
        self,
        db_dirs: list[str],
        options: ClassifyOptions | None = None,
        uid_database: bool = False,
    ):
        self.opts = options or ClassifyOptions()
        self.db_dirs = [os.fspath(d) for d in db_dirs]
        self.taxonomy = Taxonomy.from_taxdb_file(os.path.join(self.db_dirs[0], "taxDB"))
        self.uid_map = None
        if uid_database:
            if self.opts.quick:
                raise ValueError("Quick mode not available when mapping UIDs")
            if len(self.db_dirs) > 1:
                raise ValueError("Cannot use more than one database with UID mapping!")
            from .uid import UidMap

            self.uid_map = UidMap(os.path.join(self.db_dirs[0], "uid_to_taxid.map"))
        self.dbs: list[DeviceDB] = []
        for d in self.db_dirs:
            db, _ = load_database_dir(d, taxonomy=self.taxonomy, uid_database=uid_database)
            self.dbs.append(db)
        ks = {db.k for db in self.dbs}
        if len(ks) != 1:
            raise ValueError(f"Different k-mer sizes in databases: {sorted(ks)}")
        self.k = self.dbs[0].k
        nts = {db.nt for db in self.dbs}
        if len(nts) != 1:
            raise ValueError(f"Different minimizer sizes in databases: {sorted(nts)}")
        self.nt = self.dbs[0].nt

        tax = self.taxonomy
        self._taxid_table = jax.device_put(tax.taxids.astype(np.uint32))
        self._tin = jax.device_put(tax.tin)
        self._tout = jax.device_put(tax.tout)
        self._parent = jax.device_put(tax.parent)
        self._root_dense = np.int32(tax.dense_index(np.asarray([1], dtype=np.uint32))[0])
        self._db_planes = tuple(
            (db.keys, db.vals, db.vals_dense, db.offsets, db.bin_start) for db in self.dbs
        )
        effective_p = self.opts.hll_precision if self.opts.true_hll_precision else 12
        self._cfg = StepConfig(
            k=self.k,
            nt=self.nt,
            n_iter=max(db.search_iters for db in self.dbs),
            max_depth=tax.max_depth,
            hll_p=effective_p,
            quick=self.opts.quick,
            min_hits=self.opts.min_hits,
            with_kmers=self.opts.exact,
        )
        self.counter = TaxonCounter(effective_p, exact=self.opts.exact)
        self.total_sequences = 0
        self.total_bases = 0
        self.total_classified = 0

    # ------------------------------------------------------------ unit input

    def _work_units(self, path: str):
        """Greedy >= unit_size bp batches in read order (classify.cpp:511-521)."""
        fastq = is_fastq(path)
        with open_maybe_compressed(path, "rt") as fh:
            reader = read_fastq(fh) if fastq else read_fasta(fh)
            unit: list[DNASequence] = []
            total_nt = 0
            for dna in reader:
                unit.append(dna)
                total_nt += len(dna.seq)
                if total_nt >= self.opts.work_unit_size:
                    yield unit, fastq
                    unit, total_nt = [], 0
            if unit:
                yield unit, fastq

    # ------------------------------------------------------------- main loop

    def run(
        self,
        input_paths: list[str],
        kraken_fh=None,
        classified_fh=None,
        unclassified_fh=None,
    ) -> None:
        from ..kmer import encode_batch

        t0 = time.time()
        for path in input_paths:
            for unit, fastq in self._work_units(path):
                self._process_unit(unit, fastq, kraken_fh, classified_fh, unclassified_fh)
                if self.opts.print_progress:
                    pct = 100.0 * self.total_classified / max(self.total_sequences, 1)
                    sys.stderr.write(
                        f"\r Processed {self.total_sequences} sequences ({pct:.2f}% classified)"
                    )
        self._elapsed = time.time() - t0

    def _process_unit(self, unit, fastq, kraken_fh, classified_fh, unclassified_fh) -> None:
        from ..kmer import encode_batch

        opts = self.opts
        max_len = max((len(d.seq) for d in unit), default=1)
        if max_len > opts.max_read_len:
            raise NotImplementedError(
                f"reads longer than {opts.max_read_len} bp are not supported yet "
                f"(got {max_len})"
            )
        lb = _bucket(max(max_len, self.k), max(128, self.k))
        b = _bucket(len(unit), opts.min_batch_reads)
        enc = encode_batch([d.seq for d in unit], lb=lb, batch=b)

        out = classify_step(
            self._db_planes,
            self._taxid_table,
            self._tin,
            self._tout,
            self._parent,
            self._root_dense,
            enc.codes,
            enc.ambig,
            enc.lengths,
            self._cfg,
        )
        taxa = np.asarray(out["taxa"])
        ambig = np.asarray(out["ambig"])
        calls = np.asarray(out["call"])[: len(unit)]
        if self.uid_map is not None:
            # UID resolution happens on host (resolve_uids3 semantics);
            # the device 'call' is meaningless for UID-valued databases
            from .uid import resolve_uids

            calls = np.empty(len(unit), dtype=np.uint32)
            nk_arr = np.asarray(out["n_kmers"])
            for i in range(len(unit)):
                row = taxa[i, : int(nk_arr[i])]
                hits: dict[int, int] = {}
                for u in row[row != 0].tolist():
                    hits[u] = hits.get(u, 0) + 1
                calls[i] = resolve_uids(hits, self.uid_map, self.taxonomy.lca_fold)
        hll_lanes = np.asarray(out["hll_lanes"])
        hits = np.asarray(out["hits"])
        n_kmers = np.asarray(out["n_kmers"])

        # padding rows beyond len(unit) have length 0 => no k-mer lanes, but
        # exclude them defensively
        mask_rows = np.zeros(hll_lanes.shape[0], dtype=bool)
        mask_rows[: len(unit)] = True
        row_ok = mask_rows[:, None] & hll_lanes
        counted = np.asarray(out["canon"] if opts.exact else out["enc"])[row_ok]
        counted_taxa = taxa[row_ok]

        self.counter.process_unit(counted_taxa, counted, calls)

        # text outputs
        for i, dna in enumerate(unit):
            call = int(calls[i])
            self.total_classified += call != 0
            if unclassified_fh is not None and not call:
                unclassified_fh.write(format_sequence(dna, fastq))
            if classified_fh is not None and call:
                classified_fh.write(format_sequence(dna, fastq))
            if kraken_fh is not None:
                if not call and opts.only_classified_output:
                    continue
                nk = int(n_kmers[i])
                kraken_fh.write(
                    kraken_line(
                        dna.id,
                        call,
                        len(dna.seq),
                        taxa[i, :nk],
                        ambig[i, :nk],
                        quick=opts.quick,
                        hits=int(hits[i]),
                        sequence=dna.seq if opts.print_sequence else None,
                    )
                )
        self.total_sequences += len(unit)
        self.total_bases += sum(len(d.seq) for d in unit)

    # --------------------------------------------------------------- reports

    def report_stats(self, fh=sys.stderr) -> None:
        seconds = getattr(self, "_elapsed", 0.0) or 1e-9
        fh.write("\r")
        fh.write(
            "%d sequences (%.2f Mbp) processed in %.3fs (%.1f Kseq/m, %.2f Mbp/m).\n"
            % (
                self.total_sequences,
                self.total_bases / 1.0e6,
                seconds,
                self.total_sequences / 1.0e3 / (seconds / 60),
                self.total_bases / 1.0e6 / (seconds / 60),
            )
        )
        n = max(self.total_sequences, 1)
        fh.write(
            "  %d sequences classified (%.2f%%)\n"
            % (self.total_classified, self.total_classified * 100.0 / n)
        )
        fh.write(
            "  %d sequences unclassified (%.2f%%)\n"
            % (
                self.total_sequences - self.total_classified,
                (self.total_sequences - self.total_classified) * 100.0 / n,
            )
        )

    def ensure_counts_files(self) -> None:
        """Generate <db>.kdb.counts once per DB and feed genome sizes into the
        taxonomy (classify.cpp:260-285)."""
        for d in self.db_dirs:
            path = os.path.join(d, "database.kdb") + ".counts"  # "<kdb path>.counts"
            if not (os.path.exists(path) and os.path.getsize(path) > 0):
                _, _, vals = read_kdb(os.path.join(d, "database.kdb"))
                write_counts(path, counts_from_vals(vals))
            self.taxonomy.set_genome_sizes(read_counts_stream_bugcompat(path))

    def write_report(self, fh) -> None:
        self.ensure_counts_files()
        rep = TaxReport(
            self.taxonomy,
            self.counter.counts,
            show_zeros=self.opts.report_zeros,
        )
        if self.opts.hll_precision > 0:
            rep.set_cols(FULL_COLS if self.opts.full_report else DEFAULT_COLS)
        else:
            from ..report import NO_HLL_COLS

            rep.set_cols(NO_HLL_COLS)
        rep.write(fh)

"""`krakenuniq-tpu` -- the user-facing classifier CLI, flag-compatible with
the reference `krakenuniq` wrapper (scripts/krakenuniq:76-100, README.md:104-133).

Differences by design:
  * --threads is accepted but host threading is irrelevant; the device runs
    the hot path
  * --preload is an accepted no-op: the database already resides in device
    HBM by default
  * --preload-size bounds resident table HBM: databases over the budget are
    classified out-of-core by streaming minimizer-range chunk tables through
    device memory (krakenuniq_tpu.db.chunked), the temporal counterpart of
    --mesh's spatial sharding (krakenuniq_tpu.parallel)
"""

from __future__ import annotations

import argparse
import datetime
import os
import shlex
import sys
import tempfile

from .. import __version__
from .dblib import find_db


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="krakenuniq-tpu",
        description="TPU-native taxonomic sequence classifier with unique k-mer counting",
    )
    p.add_argument("--db", action="append", default=[], help="database directory (repeatable: hierarchical lookup)")
    p.add_argument(
        "--threads",
        type=int,
        # the reference falls back to KRAKEN_NUM_THREADS (krakenuniq:102-104)
        default=int(os.environ.get("KRAKEN_NUM_THREADS") or 0) or None,
        help="accepted for compatibility",
    )
    p.add_argument("--fasta-input", action="store_true", help="(format is auto-detected)")
    p.add_argument("--fastq-input", action="store_true", help="(format is auto-detected)")
    p.add_argument("--quick", action="store_true", help="stop after the first hit(s)")
    p.add_argument("--min-hits", type=int, default=1, help="hits required in quick mode")
    p.add_argument("--unclassified-out", metavar="FILENAME")
    p.add_argument("--classified-out", metavar="FILENAME")
    p.add_argument("--print-sequence", action="store_true")
    p.add_argument("-o", "--output", metavar="FILENAME", help="kraken output ('off' to suppress)")
    p.add_argument("--report-file", metavar="FILENAME", help="report output ('off' to suppress)")
    p.add_argument("--preload", action="store_true", help="accepted no-op (DB lives in HBM)")
    p.add_argument(
        "--preload-size",
        metavar="SIZE",
        help="HBM budget for resident database tables (e.g. 8G, 500M). "
        "Databases whose tables exceed it are split into minimizer-range "
        "chunk tables streamed through device memory (out-of-core "
        "classification, reference classify.cpp:566-791)",
    )
    p.add_argument("--paired", action="store_true", help="two input files are mate pairs")
    p.add_argument("--check-names", action="store_true")
    p.add_argument("--hll-precision", type=int, default=12)
    p.add_argument("--exact", action="store_true", help="exact unique-k-mer counting")
    p.add_argument("--gzip-compressed", action="store_true", help="(auto-detected)")
    p.add_argument("--bzip2-compressed", action="store_true", help="(auto-detected)")
    p.add_argument("--uid-mapping", action="store_true", help="use the UID database")
    p.add_argument("--only-classified-output", action="store_true")
    p.add_argument("--full-report", action="store_true", help="report with DB k-mer columns")
    p.add_argument(
        "--device-counters",
        action="store_true",
        help="keep taxon counters on the device (faster; bit-identical to the "
        "host path -- sparse-regime HLL tracking runs on device, see "
        "classify/sparse_exact.py)",
    )
    p.add_argument(
        "--mesh",
        default=None,
        metavar="DATAxDB",
        help="multi-chip mesh, e.g. 2x4: shard the database by minimizer "
        "range over DB devices and the read batch over DATA devices "
        "(requires DATA*DB <= available devices)",
    )
    p.add_argument(
        "--multihost",
        default=None,
        metavar="ID/N",
        help="multi-host input sharding (parallel/multihost.py): this "
        "process is host ID of N; it classifies global device spans with "
        "span %% N == ID. By default (--multihost-collect auto) run the "
        "SAME command on every host over a shared filesystem: each host "
        "writes <output>.part<ID> (+ .manifest) and counter state "
        "<report>.state.<ID>, then host 0 waits for its peers and merges "
        "the kraken segments into <output> and every host's counter state "
        "into the final report",
    )
    p.add_argument(
        "--multihost-collect",
        choices=("auto", "off"),
        default="auto",
        help="auto (default): host 0 rendezvouses on per-host .done markers "
        "and performs the full merge itself. off: every host writes its own "
        "segment to its --output plus a manifest, and only the report "
        "counter-states are mergeable -- concatenate kraken segments with "
        "parallel.multihost.merge_kraken_outputs over the manifests, and "
        "fold states into host 0's report via --multihost-merge",
    )
    p.add_argument(
        "--multihost-wait",
        type=float,
        default=3600.0,
        metavar="SECONDS",
        help="how long host 0 waits for peer .done markers in auto-collect "
        "mode before failing",
    )
    p.add_argument(
        "--multihost-recover",
        choices=("auto", "off"),
        default="auto",
        help="auto (default): when host 0's rendezvous times out, re-run "
        "each lost host's span share in-process (artifacts are idempotent; "
        "span ownership is deterministic), then complete the merge. off: "
        "fail with the list of lost hosts and the recovery command",
    )
    p.add_argument(
        "--multihost-merge",
        action="append",
        default=[],
        metavar="STATEFILE",
        help="fold other hosts' counter-state files into this host's report "
        "(manual flow, --multihost-collect off)",
    )
    p.add_argument(
        "--distributed-init",
        default=None,
        metavar="COORD_ADDR",
        help="bring up jax.distributed against this coordinator "
        "(KUNIQ_NUM_PROCS/KUNIQ_PROC_ID or --multihost supply the ids)",
    )
    p.add_argument("--version", action="version", version=f"KrakenUniq-TPU version {__version__}")
    p.add_argument("files", nargs="*", help="FASTA/FASTQ input files (gz/bz2/xz ok)")
    return p


def parse_size(s: str) -> int:
    """Parse a byte size with an optional K/M/G/T suffix (powers of 1024,
    matching the reference's --preload-size grammar, scripts/krakenuniq)."""
    s = s.strip().upper().rstrip("B")
    mult = 1
    if s and s[-1] in "KMGT":
        mult = 1024 ** ("KMGT".index(s[-1]) + 1)
        s = s[:-1]
    return int(float(s) * mult)


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    args = build_parser().parse_args(argv)

    from ..classify import Classifier, ClassifyOptions
    from ..formats.seqio import merge_paired, open_output
    from ..taxonomy import Taxonomy

    if not args.db:
        print("Need to specify a database with --db!", file=sys.stderr)
        return 1
    if not args.files and not args.preload:
        print("Need to specify input filenames!", file=sys.stderr)
        return 1
    if args.min_hits > 1 and not args.quick:
        print("--min-hits requires --quick to be specified", file=sys.stderr)
        return 1
    if args.paired and len(args.files) != 2:
        print("--paired requires exactly two filenames", file=sys.stderr)
        return 1
    if args.gzip_compressed or args.bzip2_compressed:
        print("NOTE: compression is detected automatically.", file=sys.stderr)
    if args.fasta_input or args.fastq_input:
        print("NOTE: input format is detected automatically.", file=sys.stderr)

    try:
        db_dirs = [find_db(d) for d in args.db]
    except ValueError as e:
        print(f"krakenuniq-tpu: {e}", file=sys.stderr)
        return 1

    # auto-create taxDB from NCBI dumps if missing (scripts/krakenuniq:213-221)
    taxdb_path = os.path.join(db_dirs[0], "taxDB")
    if not os.path.exists(taxdb_path):
        nodes = os.path.join(db_dirs[0], "taxonomy", "nodes.dmp")
        names = os.path.join(db_dirs[0], "taxonomy", "names.dmp")
        if not (os.path.exists(nodes) and os.path.exists(names)):
            print(f"{taxdb_path} missing and taxonomy dumps not found", file=sys.stderr)
            return 1
        print(f"Taxonomy database not at {taxdb_path} - creating it ...", file=sys.stderr)
        Taxonomy.from_ncbi_dumps(names, nodes).write_taxdb(taxdb_path)

    mesh_data = mesh_db = 1
    if args.mesh:
        try:
            mesh_data, mesh_db = (int(x) for x in args.mesh.lower().split("x"))
        except ValueError:
            print(f"--mesh expects DATAxDB (e.g. 2x4), got {args.mesh!r}", file=sys.stderr)
            return 1

    preload_size = None
    if args.preload_size:
        try:
            preload_size = parse_size(args.preload_size)
        except ValueError:
            print(f"bad --preload-size value {args.preload_size!r}", file=sys.stderr)
            return 1

    host_id, n_hosts = 0, 1
    if args.multihost:
        try:
            host_id, n_hosts = (int(x) for x in args.multihost.split("/"))
        except ValueError:
            print(f"--multihost expects ID/N (e.g. 0/2), got {args.multihost!r}", file=sys.stderr)
            return 1
    if args.distributed_init:
        from ..parallel.multihost import initialize

        initialize(
            args.distributed_init,
            num_processes=n_hosts if args.multihost else None,
            process_id=host_id if args.multihost else None,
        )

    opts = ClassifyOptions(
        quick=args.quick,
        min_hits=args.min_hits,
        hll_precision=args.hll_precision,
        exact=args.exact,
        only_classified_output=args.only_classified_output,
        print_sequence=args.print_sequence,
        full_report=args.full_report,
        device_counters=args.device_counters,
        mesh_data=mesh_data,
        mesh_db=mesh_db,
        preload_size=preload_size,
        host_id=host_id,
        n_hosts=n_hosts,
    )

    inputs = list(args.files)
    tmp_merged = None
    if args.paired:
        fd, tmp_merged = tempfile.mkstemp(suffix=".merged.fa")
        with os.fdopen(fd, "w") as fh:
            merge_paired(inputs[0], inputs[1], fh, check_names=args.check_names)
        inputs = [tmp_merged]

    # auto-collect (multi-host): every host runs this same command; kraken
    # segments land in <output>.part<ID>, and host 0 rendezvouses on peer
    # .done markers (shared filesystem) before merging everything itself
    auto_collect = (
        n_hosts > 1
        and args.multihost_collect == "auto"
        and args.output not in (None, "-", "off")
    )
    kraken_path = args.output
    if auto_collect:
        kraken_path = f"{args.output}.part{host_id}"
        try:  # a stale marker must not satisfy a concurrent rendezvous
            os.unlink(f"{args.output}.done{host_id}")
        except OSError:
            pass

    # report provenance header (scripts/krakenuniq:242-247); under
    # auto-collect only host 0 owns the (shared) report file
    if args.report_file and args.report_file != "off" and not (auto_collect and host_id != 0):
        date = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
        db_size = os.path.getsize(os.path.join(db_dirs[0], "database.kdb"))
        cl = " ".join([sys.argv[0]] + [shlex.quote(a) for a in argv])
        os.makedirs(os.path.dirname(os.path.abspath(args.report_file)), exist_ok=True)
        with open(args.report_file, "w") as rf:
            rf.write(
                f"# KrakenUniq-TPU v{__version__} DATE:{date} DB:{' '.join(db_dirs)} "
                f"DB_SIZE:{db_size} WD:{os.getcwd()}\n# CL:{cl}\n"
            )

    classifier = Classifier(db_dirs, options=opts, uid_database=args.uid_mapping)

    kraken_fh = None
    close_fhs = []
    if args.output not in ("off",):
        if args.output in (None, "-"):
            kraken_fh = sys.stdout
        else:
            kraken_fh = open_output(kraken_path)
            close_fhs.append(kraken_fh)
            print(f"Writing Kraken output to {kraken_path}", file=sys.stderr)
    classified_fh = unclassified_fh = None
    if args.classified_out:
        classified_fh = open_output(args.classified_out)
        close_fhs.append(classified_fh)
    if args.unclassified_out:
        unclassified_fh = open_output(args.unclassified_out)
        close_fhs.append(unclassified_fh)

    try:
        classifier.run(
            inputs,
            kraken_fh=kraken_fh,
            classified_fh=classified_fh,
            unclassified_fh=unclassified_fh,
        )
        classifier.report_stats()
        extra_counts = list(args.multihost_merge) or None
        if n_hosts > 1:
            # cross-host artifacts (parallel/multihost.py): the kraken span
            # manifest and this host's serialized counter state -- the
            # reference's per-worker temp-file merge made explicit
            # (classify.cpp:390-485)
            import json as _json

            from ..parallel.multihost import save_counter_state

            if args.output and args.output not in ("off", "-"):
                with open(kraken_path + ".manifest", "w") as mf:
                    _json.dump(classifier.span_manifest, mf)
            if args.report_file and args.report_file != "off":
                save_counter_state(
                    f"{args.report_file}.state.{host_id}",
                    classifier.finalized_counts(),
                )
            if auto_collect:
                from ..parallel.multihost import (
                    MultihostTimeout,
                    rendezvous_and_merge,
                    write_done_marker,
                )

                for fh in close_fhs:
                    fh.close()
                close_fhs = []
                report_arg = (
                    args.report_file
                    if args.report_file and args.report_file != "off"
                    else None
                )
                try:
                    done = rendezvous_and_merge(
                        host_id,
                        n_hosts,
                        output=args.output,
                        report_file=report_arg,
                        timeout=args.multihost_wait,
                    )
                except MultihostTimeout as e:
                    print(str(e), file=sys.stderr)
                    if args.multihost_recover != "auto":
                        return 75  # EX_TEMPFAIL: lost hosts listed above
                    # re-run each lost host's share in-process: span
                    # ownership is s % n_hosts == ID, so a fresh Classifier
                    # with that host_id reproduces the lost artifacts
                    # bit-for-bit (the idempotent-artifact pattern,
                    # build_db.sh:116)
                    import dataclasses as _dc
                    import stat as _stat

                    # recovery re-reads the inputs from the top: a pipe /
                    # FIFO / stdin was consumed by this host's own pass and
                    # would silently yield zero reads for the lost share
                    for inp in inputs:
                        try:
                            st = os.stat(inp)
                        except OSError:
                            st = None
                        if st is None or not _stat.S_ISREG(st.st_mode):
                            print(
                                f"Cannot auto-recover: input {inp!r} is not "
                                f"a re-readable regular file. Re-run the "
                                f"lost hosts' shares manually.",
                                file=sys.stderr,
                            )
                            return 75
                    for lost in e.missing_hosts:
                        # a slow-but-alive peer may have finished during
                        # the timeout window -- its artifacts win
                        if os.path.exists(f"{args.output}.done{lost}"):
                            print(
                                f"Host {lost} completed late; skipping "
                                f"recovery for it.",
                                file=sys.stderr,
                            )
                            continue
                        print(
                            f"Recovering lost host {lost}'s span share "
                            f"in-process ...",
                            file=sys.stderr,
                        )
                        r_opts = _dc.replace(opts, host_id=lost)
                        rcl = Classifier(
                            db_dirs, options=r_opts, uid_database=args.uid_mapping
                        )
                        # write to temp paths and os.replace into place: if
                        # the peer is alive after all and still writing, the
                        # two writers land on separate inodes and the rename
                        # publishes one complete, self-consistent artifact
                        # (both runs produce identical bytes anyway)
                        part = f"{args.output}.part{lost}"
                        pfh = open_output(part + ".recover")
                        try:
                            rcl.run(
                                inputs,
                                kraken_fh=pfh,
                                classified_fh=classified_fh,
                                unclassified_fh=unclassified_fh,
                            )
                        finally:
                            pfh.close()
                        with open(part + ".manifest.recover", "w") as mf:
                            _json.dump(rcl.span_manifest, mf)
                        if report_arg:
                            save_counter_state(
                                f"{report_arg}.state.{lost}",
                                rcl.finalized_counts(),
                            )
                        os.replace(part + ".recover", part)
                        os.replace(part + ".manifest.recover", part + ".manifest")
                        write_done_marker(args.output, lost)
                    done = rendezvous_and_merge(
                        host_id,
                        n_hosts,
                        output=args.output,
                        report_file=report_arg,
                        timeout=args.multihost_wait,
                    )
                if host_id != 0:
                    # peers are finished once their marker is down; host 0
                    # owns the merged kraken output and the report
                    print("Finishing up ...", file=sys.stderr)
                    return 0
                extra_counts = done or None
        if args.report_file and args.report_file != "off":
            print(f"Writing report file to {args.report_file}  ..", file=sys.stderr)
            with open(args.report_file, "a") as rf:
                classifier.write_report(rf, extra_counts=extra_counts)
    finally:
        for fh in close_fhs:
            fh.close()
        if tmp_merged:
            os.unlink(tmp_merged)
    print("Finishing up ...", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Reference-scale DB-build demonstration (VERDICT r4 item 3).

Synthesizes a multi-GB FASTA library (random genomes under a demo
taxonomy), then runs the streaming pair-spill builder
(build.db_build.stream_database_to_dir) under a stated RAM budget and
reports measured keys/s + peak RSS as one JSON line.

Usage: python tools/build_scale_demo.py [--gbp 2.2] [--species 20]
       [--budget 2G] [--workdir DIR]

The library is written once and cached in the workdir; the build's spill
buckets live under the workdir too, so disk needs ~ (1 + 16x) the library
size during the run.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from krakenuniq_tpu.cli.main import parse_size  # noqa: E402
from krakenuniq_tpu.utils.demo import make_demo_taxonomy  # noqa: E402

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def write_library(path: str, n_species: int, bp_per_species: int, seed: int = 7):
    """Stream random genomes to a FASTA; returns the seqid->taxid map."""
    rng = np.random.default_rng(seed)
    tax, species = make_demo_taxonomy(n_species, species_base=10_000)
    seqmap = {}
    chunk = 8 << 20
    with open(path, "wb") as f:
        for i, sid in enumerate(species):
            seqid = f"seq_{sid}"
            seqmap[seqid] = sid
            f.write(f">{seqid} synthetic genome\n".encode())
            left = bp_per_species
            while left:
                n = min(chunk, left)
                f.write(_BASES[rng.integers(0, 4, size=n, dtype=np.uint8)].tobytes())
                f.write(b"\n")
                left -= n
    return tax, seqmap


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gbp", type=float, default=2.2, help="library size in Gbp")
    ap.add_argument("--species", type=int, default=20)
    ap.add_argument("--budget", default="2G", help="build RAM budget")
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--nt", type=int, default=12)
    ap.add_argument("--workdir", default="/tmp/kuniq_build_scale")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    bp_per_species = int(args.gbp * 1e9 / args.species)
    lib = os.path.join(
        args.workdir, f"library_{args.species}x{bp_per_species}.fna"
    )
    t0 = time.time()
    tax_path = lib + ".taxdb"
    if not (os.path.exists(lib) and os.path.exists(tax_path)):
        print(f"writing {args.gbp} Gbp library ...", file=sys.stderr)
        tax, seqmap = write_library(lib, args.species, bp_per_species)
        tax.write_taxdb(tax_path)
        with open(lib + ".map", "w") as f:
            for s, t in seqmap.items():
                f.write(f"{s}\t{t}\n")
        print(f"library written in {time.time()-t0:.0f}s", file=sys.stderr)
    from krakenuniq_tpu.formats.seqmap import read_seqid2taxid
    from krakenuniq_tpu.taxonomy import Taxonomy

    tax = Taxonomy.from_taxdb_file(tax_path)
    seqmap = read_seqid2taxid(lib + ".map")

    from krakenuniq_tpu.build.db_build import stream_database_to_dir

    db_dir = os.path.join(args.workdir, "DB")
    os.makedirs(db_dir, exist_ok=True)
    budget = parse_size(args.budget)
    t1 = time.time()
    stats = stream_database_to_dir(
        db_dir,
        [lib],
        seqmap,
        tax,
        k=args.k,
        nt=args.nt,
        memory_budget=budget,
        tmp_dir=os.path.join(args.workdir, "spill"),
    )
    peak_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    out = {
        "library_gbp": args.gbp,
        "library_bytes": os.path.getsize(lib),
        "k": args.k,
        "nt": args.nt,
        "memory_budget_gb": round(budget / 2**30, 2),
        "key_ct": stats["key_ct"],
        "build_s": stats["seconds"],
        "keys_per_s": stats["keys_per_s"],
        "bp_per_s": round(args.gbp * 1e9 / max(time.time() - t1, 1e-9)),
        "peak_rss_gb": round(peak_rss_gb, 2),
        "kdb_bytes": os.path.getsize(os.path.join(db_dir, "database.kdb")),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

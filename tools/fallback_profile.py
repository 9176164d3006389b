"""Profile the value-pool FALLBACK path (dense ids + per-span local_dict)
against pool mode on the cached bench database (VERDICT r3 #5: fallback ran
20K reads/s vs 60K pooled; find where the 3x goes).

Prints per-span [gap/encode/dispatch/fetch/finish] lines via
KRAKENUNIQ_TPU_PROFILE plus a mode summary. Run AFTER bench.py has built
the ~/.cache bench DB dir (and ideally not concurrently with it).

Usage: python tools/fallback_profile.py [n_reads] [pool|fallback|both]
"""

import os
import sys
import time

os.environ.setdefault("KRAKENUNIQ_TPU_PROFILE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    n_species, genome_len, k, nt = 400, 25_000, 31, 12
    pad_nodes, ballast = 2_400_000, 101_000_000
    db_dir = os.path.expanduser(
        f"~/.cache/kuniq_bench_dbdir_{n_species}_{genome_len}_{k}_{nt}_{pad_nodes}_{ballast}_v5"
    )
    z = np.load(os.path.join(db_dir, "genomes.npz"), allow_pickle=True)
    genomes = z["genomes"].item()

    import tempfile

    from krakenuniq_tpu.classify import Classifier, ClassifyOptions

    rng = np.random.default_rng(3)
    sids = list(genomes)
    w = 1.0 / np.arange(1, len(sids) + 1) ** 1.5
    cdf = np.cumsum(w) / w.sum()
    gsel = np.searchsorted(cdf, rng.random(n_reads))
    starts = rng.integers(0, genome_len - 150, size=n_reads)
    td = tempfile.mkdtemp()
    reads_path = os.path.join(td, "reads.fa")
    with open(reads_path, "w") as f:
        f.write(
            "".join(
                f">r{i}\n{genomes[sids[gsel[i]]][starts[i]:starts[i]+150]}\n"
                for i in range(n_reads)
            )
        )

    modes = {
        "pool": {},
        "fallback": {"value_pool": False},
    }
    sink = open(os.devnull, "w")
    for tag, kw in modes.items():
        if which not in ("both", tag):
            continue
        t0 = time.time()
        c = Classifier(
            [db_dir], ClassifyOptions(print_progress=False, **kw)
        )
        print(f"\n=== {tag}: load {time.time()-t0:.1f}s "
              f"(lb={c.dbs[0].hash_lb}, pool={c._pool is not None}, "
              f"local_dict={c._cfg.local_dict})", file=sys.stderr)
        t0 = time.time()
        c.run([reads_path], kraken_fh=sink)  # warm compile
        print(f"\n=== {tag} warm pass: {time.time()-t0:.1f}s", file=sys.stderr)
        c.reset_counters()
        t0 = time.time()
        c.run([reads_path], kraken_fh=sink)
        dt = time.time() - t0
        print(
            f"\n=== {tag}: {n_reads} reads in {dt:.2f}s "
            f"({n_reads/dt:,.0f} reads/s)",
            file=sys.stderr,
        )
        del c


if __name__ == "__main__":
    main()

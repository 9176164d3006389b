"""Profile the end-to-end pipeline span loop at reference scale.

Runs N reads through the cached bench DB with KRAKENUNIQ_TPU_PROFILE-style
instrumentation done inline: per-span encode / dispatch / fetch / finish
wall times, for a chosen mode.

Usage: python tools/pipeline_profile.py [mode] [n_reads]
  mode: dc | exact | plain   (default dc)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["KRAKENUNIQ_TPU_PROFILE"] = "1"


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "dc"
    n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    cache_root = os.path.expanduser("~/.cache")
    db_dir = os.path.join(
        cache_root, "kuniq_bench_dbdir_400_25000_31_12_2400000_101000000_v5"
    )
    z = np.load(os.path.join(db_dir, "genomes.npz"), allow_pickle=True)
    genomes = z["genomes"].item()

    from krakenuniq_tpu.classify import Classifier, ClassifyOptions

    kw = {}
    if mode == "dc":
        kw = {"device_counters": True}
    elif mode == "exact":
        pass  # exact-compat host accumulation (default)
    t0 = time.time()
    c = Classifier([db_dir], ClassifyOptions(print_progress=False, **kw))
    print(f"load {time.time()-t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(3)
    sids = list(genomes)
    gsel = rng.integers(len(sids), size=n_reads)
    starts = rng.integers(0, 25_000 - 150, size=n_reads)
    rp = "/tmp/prof_reads.fa"
    with open(rp, "w") as f:
        for i in range(n_reads):
            g = genomes[sids[gsel[i]]]
            s = starts[i]
            f.write(f">r{i}\n{g[s:s+150]}\n")

    sink = open(os.devnull, "w")
    t1 = time.time()
    c.run([rp], kraken_fh=sink)
    dt = time.time() - t1
    print(
        f"\n[{mode}] {n_reads} reads in {dt:.2f}s = {n_reads/dt:,.0f} reads/s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

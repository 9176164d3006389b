#!/usr/bin/env python
"""Benchmark: single-chip classify-step throughput on a synthetic database.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's fastest published configuration (--preload, whole
DB in RAM) classifies 9.4M reads in 14 min ~= 11,200 reads/s on a 2020
multicore server (paper.md:125, BASELINE.md). vs_baseline = ours / that.

The synthetic DB mirrors real layout statistics: k=31 canonical k-mers,
XOR-scrambled minimizer bins with ~20 keys/bin average (a 392GB reference DB
at nt=15 averages ~25/bin).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_READS_PER_S = 9_400_000 / (14 * 60)  # paper.md:125


def main():
    t0 = time.time()
    import jax

    # BENCH_PLATFORM=cpu for smoke tests; the env var JAX_PLATFORMS is
    # overridden by this environment's sitecustomize, the config API is not
    plat = os.environ.get("BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    from krakenuniq_tpu.classify.device_step import StepConfig, classify_step
    from krakenuniq_tpu.kmer import encode_batch
    from krakenuniq_tpu.utils.demo import make_demo_db, make_demo_reads

    n_species = int(os.environ.get("BENCH_SPECIES", 40))
    genome_len = int(os.environ.get("BENCH_GENOME_LEN", 120_000))
    k, nt = 31, 9
    batch = int(os.environ.get("BENCH_BATCH", 4096))
    read_len = int(os.environ.get("BENCH_READ_LEN", 150))
    reps = int(os.environ.get("BENCH_REPS", 10))

    cache = os.path.expanduser(
        f"~/.cache/kuniq_bench_db_{n_species}_{genome_len}_{k}_{nt}_v4.npz"
    )
    old_cache = cache.replace("_v4.npz", "_v3.npz")  # pre-fused layout: reuse
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    cached_hash = None
    loaded = False
    for path in (cache, old_cache):
        if loaded or not os.path.exists(path):
            continue
        try:
            z = np.load(path, allow_pickle=True)
            keys, vals, offsets = z["keys"], z["vals"], z["offsets"]
            genomes = z["genomes"].item()
            # only reuse a cached table whose layout matches the current code
            # (fused single plane, db/hash_table.py)
            if "fused" in z and z["fused"].dtype == np.uint32:
                cached_hash = (z["fused"], int(z["hash_lb"]))
            loaded = True
        except Exception as e:  # truncated by an interrupted save
            print(f"bench db cache unreadable ({e}); rebuilding", file=sys.stderr)
            os.unlink(path)
    if loaded:
        from krakenuniq_tpu.utils.demo import make_demo_taxonomy

        tax, _ = make_demo_taxonomy(n_species)
        print("bench db loaded from cache", file=sys.stderr)
    else:
        keys, vals, offsets, tax, genomes = make_demo_db(
            n_species=n_species, genome_len=genome_len, k=k, nt=nt
        )
    vals_dense = tax.dense_index(vals)
    print(
        f"bench db: {len(keys)} keys, {int(np.diff(offsets).max())} max bin, "
        f"built in {time.time()-t0:.1f}s; devices={jax.devices()}",
        file=sys.stderr,
    )

    reads = make_demo_reads(genomes, n_reads=batch, read_len=read_len)
    enc = encode_batch(reads, lb=max(128, read_len), batch=batch)
    max_bin = int(np.diff(offsets).max())
    t_ht = time.time()
    if cached_hash is not None:
        fused, hash_lb = cached_hash
        print("hash table loaded from cache", file=sys.stderr)
    else:
        from krakenuniq_tpu.db.hash_table import build_hash_table

        (dfused,), hash_lb = build_hash_table(keys, vals, vals_dense)
        fused = np.asarray(dfused)
        np.savez_compressed(
            cache + ".tmp.npz", keys=keys, vals=vals, offsets=offsets,
            genomes=np.array(genomes, dtype=object),
            fused=fused, hash_lb=np.int64(hash_lb),
        )
        os.replace(cache + ".tmp.npz", cache)  # atomic: survives interrupts
        print(f"hash table: {fused.nbytes/1e6:.0f}MB, lb={hash_lb}, "
              f"built in {time.time()-t_ht:.1f}s", file=sys.stderr)
    cfg = StepConfig(
        k=k,
        nt=nt,
        n_iter=max(1, int(np.ceil(np.log2(max_bin + 1))) + 1),
        max_depth=tax.max_depth,
        lookup_mode="hash",
        hash_lbs=(hash_lb,),
    )
    root = np.int32(tax.dense_index(np.asarray([1], dtype=np.uint32))[0])
    planes = ((jax.device_put(fused),),)
    taxid_table = jax.device_put(tax.taxids.astype(np.uint32))
    targs = tuple(jax.device_put(x) for x in (tax.tin, tax.tout, tax.parent))
    codes = jax.device_put(enc.codes)
    ambig = jax.device_put(enc.ambig)
    lengths = jax.device_put(enc.lengths)

    def step():
        return classify_step(
            planes, taxid_table, *targs, root, codes, ambig, lengths, cfg
        )

    t1 = time.time()
    out = step()
    _ = np.asarray(out["call"])  # forced sync: the axon transport's
    # block_until_ready returns before execution finishes
    print(f"compile+first step: {time.time()-t1:.1f}s", file=sys.stderr)

    t2 = time.time()
    for _ in range(reps):
        out = step()
        _ = np.asarray(out["call"])
    dt = time.time() - t2
    reads_per_s = batch * reps / dt
    kmers_per_s = reads_per_s * (read_len - k + 1)
    print(
        f"{reps} steps x {batch} reads in {dt:.3f}s -> {reads_per_s:,.0f} reads/s "
        f"({kmers_per_s/1e6:,.1f}M lookups/s)",
        file=sys.stderr,
    )
    # free the microbench's device copies before the pipeline builds its own
    # (a 48M-key table is ~2.6GB on device; two copies + working set OOM)
    del planes, codes, ambig, lengths, taxid_table, targs, out
    import gc

    gc.collect()

    # ---- full pipeline (file -> kraken output + report accumulation) ----
    import io
    import tempfile

    from krakenuniq_tpu.classify import Classifier, ClassifyOptions
    from krakenuniq_tpu.build.db_build import build_database  # noqa: F401 (import check)

    # 1M reads: long enough that per-process warmup (first-span transfer
    # ramp, executable loads) amortizes the way it does on the reference's
    # 9.4M-read benchmark workload
    n_bench_reads = int(os.environ.get("BENCH_PIPELINE_READS", 1_000_000))
    with tempfile.TemporaryDirectory() as td:
        # write DB dir + reads file
        from krakenuniq_tpu.formats import write_kdb, write_index

        write_kdb(os.path.join(td, "database.kdb"), keys, vals, k=k)
        write_index(os.path.join(td, "database.idx"), nt, np.asarray(offsets, dtype=np.uint64))
        tax.write_taxdb(os.path.join(td, "taxDB"))
        reads_path = os.path.join(td, "bench_reads.fa")
        rng = np.random.default_rng(3)
        sids = list(genomes)
        gsel = rng.integers(len(sids), size=n_bench_reads)
        starts = rng.integers(0, genome_len - read_len, size=n_bench_reads)
        with open(reads_path, "w") as f:
            chunk = []
            for i in range(n_bench_reads):
                g = genomes[sids[gsel[i]]]
                s = starts[i]
                chunk.append(f">r{i}\n{g[s:s+read_len]}\n")
                if len(chunk) == 65536:
                    f.write("".join(chunk))
                    chunk = []
            f.write("".join(chunk))

        dt_pipe = None
        for attempt in range(2):  # second pass runs with warm compile caches
            c = Classifier(
                [td],
                ClassifyOptions(
                    print_progress=False,
                    device_counters=os.environ.get("BENCH_DEVICE_COUNTERS", "1") == "1",
                ),
            )
            sink = open(os.devnull, "w")
            t3 = time.time()
            c.run([reads_path], kraken_fh=sink)
            dt = time.time() - t3
            print(f"pipeline pass {attempt}: {dt:.2f}s", file=sys.stderr)
            dt_pipe = dt if dt_pipe is None else min(dt_pipe, dt)
        rep = io.StringIO()
        t4 = time.time()
        c.write_report(rep)
        dt_rep = time.time() - t4
    pipe_reads_per_s = n_bench_reads / dt_pipe
    print(
        f"full pipeline: {n_bench_reads} reads in {dt_pipe:.2f}s -> "
        f"{pipe_reads_per_s:,.0f} reads/s (report {dt_rep:.2f}s)",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "end_to_end_classify_reads_per_s",
                "value": round(pipe_reads_per_s, 1),
                "unit": "reads/s",
                "vs_baseline": round(pipe_reads_per_s / BASELINE_READS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Isolate device-step phase costs at the bench's reference-shape scale by
compiling the step with progressively larger `outputs` sets (XLA DCEs what
is not fetched). Requires the bench DB cache (run bench.py once).

Usage: python tools/phase_breakdown.py [batch]
"""

import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from krakenuniq_tpu.classify import Classifier, ClassifyOptions
    from krakenuniq_tpu.classify.device_step import classify_step
    from krakenuniq_tpu.kmer import encode_batch
    from krakenuniq_tpu.utils.demo import make_demo_reads
    import dataclasses

    db_dir = os.path.expanduser(
        "~/.cache/kuniq_bench_dbdir_400_25000_31_12_2400000_101000000_v5"
    )
    if not os.path.isdir(db_dir):
        sys.exit("bench DB cache missing; run bench.py first")
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 65536

    t0 = time.time()
    c = Classifier([db_dir], ClassifyOptions(print_progress=False))
    print(f"load {time.time()-t0:.0f}s; cfg={c._cfg_packed}", file=sys.stderr)

    z = np.load(os.path.join(db_dir, "genomes.npz"), allow_pickle=True)
    genomes = z["genomes"].item()
    reads = make_demo_reads(genomes, n_reads=batch, read_len=150)
    lb = 160
    enc = encode_batch(reads, lb=lb, batch=batch)

    # pack on host like bench.py
    codes = np.asarray(enc.codes)
    ambig = np.asarray(enc.ambig)
    b = codes.shape[0]
    cw = codes.astype(np.uint32).reshape(b, lb // 16, 16)
    shifts = (np.arange(16, dtype=np.uint32) * 2)[None, None, :]
    cp = jax.device_put((cw << shifts).sum(axis=2, dtype=np.uint32))
    aw = ambig.astype(np.uint32).reshape(b, lb // 32, 32)
    ash = np.arange(32, dtype=np.uint32)[None, None, :]
    ap = jax.device_put((aw << ash).sum(axis=2, dtype=np.uint32))
    lengths = jax.device_put(np.asarray(enc.lengths))

    base = c._cfg_packed

    def run(cfg):
        return classify_step(
            c._db_planes, c._taxid_table, c._tin, c._tout, c._parent,
            c._root_dense, cp, ap, lengths, cfg,
        )

    def sync(out):
        # the remote transport's block_until_ready returns at dispatch-ack,
        # not completion; a host fetch of one row is the reliable barrier
        # (same methodology as bench.py)
        for v in out.values():
            np.asarray(v[:1] if v.ndim else v)

    def timeit(cfg, n=4):
        sync(run(cfg))
        t1 = time.time()
        for _ in range(n - 1):
            run(cfg)
        sync(run(cfg))
        return (time.time() - t1) / n * 1e3

    variants = [
        ("probe only (taxa_dense)", dict(outputs=("taxa_dense",), max_runs=0,
                                         dense_runs=False, local_dict=False)),
        ("+resolve (call_dense)", dict(outputs=("call_dense",), max_runs=0,
                                       dense_runs=False, local_dict=False)),
        ("+hll_pairs (wide feed)", dict(outputs=("call_dense", "hll_pairs"),
                                        dense_runs=False, local_dict=False)),
        ("+pack wide (packed)", dict(outputs=("packed", "hll_pairs"),
                                     dense_runs=False, local_dict=False)),
        ("dict+compact (packed,hll,lut)", dict()),  # the shipped config
    ]
    for name, over in variants:
        cfg = dataclasses.replace(base, **over) if over else base
        print(f"{name:32s} {timeit(cfg):8.1f} ms", flush=True)


if __name__ == "__main__":
    main()

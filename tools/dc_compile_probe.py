"""Which (B, sparse_cap) shapes can the remote XLA compile in reasonable
time for the fused classify_and_count program? (The r3 bench wedged >35min
at B=65536 with sparse tracking on.)

Usage: python tools/dc_compile_probe.py B [sparse_cap]
Prints compile+first-run seconds.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    sparse_cap = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 17
    import jax

    from krakenuniq_tpu.classify.device_step import StepConfig, classify_and_count
    from krakenuniq_tpu.classify.device_counters import DeviceCounters
    from krakenuniq_tpu.db.hash_table import build_hash_table
    from krakenuniq_tpu.utils.demo import make_demo_db

    keys, vals, offsets, tax, _g = make_demo_db(
        n_species=20, genome_len=3000, k=31, nt=9
    )
    vals_dense = tax.dense_index(vals)
    planes, lb = build_hash_table(keys, vals, vals_dense)
    lb_len = 160
    w = lb_len - 31 + 1
    cfg = StepConfig(
        k=31, nt=9, n_iter=1, max_depth=tax.max_depth,
        lookup_mode="hash", hash_lbs=(lb,), raw_dbs=(False,),
        max_runs=8, dense_runs=True, packed_input=True,
        outputs=("packed", "taxa_dense", "ambig"),
    )
    dc = DeviceCounters(tax.size, 12, sparse_cap=sparse_cap)
    rng = np.random.default_rng(0)
    codes = jax.device_put(
        rng.integers(0, 2**32, size=(b, lb_len // 16), dtype=np.uint64).astype(np.uint32))
    ambig = jax.device_put(np.zeros((b, lb_len // 32), np.uint32))
    lengths = jax.device_put(np.full(b, 150, np.int32))
    unit_id = np.zeros(b, np.uint8)
    taxid_table = jax.device_put(tax.taxids.astype(np.uint32))
    targs = tuple(jax.device_put(x) for x in (tax.tin, tax.tout, tax.parent))
    root = np.int32(tax.dense_index(np.asarray([1], np.uint32))[0])

    t0 = time.time()
    out, state, sp = classify_and_count(
        *dc.state(), dc.pool_maps, (planes,), taxid_table, *targs, root,
        codes, ambig, lengths, np.int32(b), unit_id, cfg, 12, sparse_cap,
    )
    np.asarray(out["packed"])
    print(f"B={b} cap={sparse_cap}: compile+run {time.time()-t0:.1f}s", flush=True)
    dc.set_state(state)
    reps = int(os.environ.get("DC_PROBE_REPS", 4))
    t1 = time.time()
    for _ in range(reps):
        out, state, sp = classify_and_count(
            *dc.state(), dc.pool_maps, (planes,), taxid_table, *targs, root,
            codes, ambig, lengths, np.int32(b), unit_id, cfg, 12, sparse_cap,
        )
        dc.set_state(state)
        np.asarray(dc.kmer_counts[:8])  # tiny sync
        if sp:
            np.asarray(sp[0][:8])
    print(
        f"B={b} cap={sparse_cap}: steady {1e3*(time.time()-t1)/reps:.0f} ms/step",
        flush=True,
    )
    from krakenuniq_tpu.classify.device_step import classify_step

    t2 = time.time()
    out2 = classify_step(
        (planes,), taxid_table, *targs, root, codes, ambig, lengths, cfg,
    )
    np.asarray(out2["packed"])
    print(f"plain classify compile+run {time.time()-t2:.1f}s", flush=True)
    t3 = time.time()
    for _ in range(reps):
        out2 = classify_step(
            (planes,), taxid_table, *targs, root, codes, ambig, lengths, cfg
        )
        np.asarray(out2["packed"][:8])
    print(f"plain classify steady {1e3*(time.time()-t3)/reps:.0f} ms/step", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Phase-level timing of the classify device step at bench shape.

Times jitted sub-programs (unpack/windows, hash probe, resolve, RLE pack,
counter update, full fused step) on the real device so optimization effort
goes where the milliseconds are. Uses the bench DB cache if present.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, reps=5):
    import numpy as _np

    def sync(r):
        if isinstance(r, dict):
            r = next(iter(r.values()))
        if isinstance(r, tuple):
            r = r[0]
        _ = _np.asarray(r)

    sync(fn())  # compile
    t0 = time.time()
    for _ in range(reps - 1):
        fn()
    sync(fn())
    return (time.time() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    from krakenuniq_tpu.classify import device_step as ds
    from krakenuniq_tpu.classify.device_counters import update_core
    from krakenuniq_tpu.kmer import ops as kops
    from krakenuniq_tpu.lookup.hash_lookup import hash_lookup_kmers
    from krakenuniq_tpu.taxonomy.resolve import resolve_reads
    from krakenuniq_tpu.utils.demo import make_demo_taxonomy

    B = int(os.environ.get("PROF_B", 65536))
    LB = int(os.environ.get("PROF_LB", 160))
    k, nt = 31, 9
    W = LB - k + 1

    cache = os.path.expanduser("~/.cache/kuniq_bench_db_40_120000_31_9_v4.npz")
    if os.path.exists(cache):
        z = np.load(cache, allow_pickle=True)
        fused_host, hash_lb = z["fused"], int(z["hash_lb"])
    else:
        print("bench DB cache missing; building a fresh demo table "
              "(run bench.py once to cache it)", file=sys.stderr)
        from krakenuniq_tpu.db.hash_table import build_hash_table
        from krakenuniq_tpu.utils.demo import make_demo_db

        keys, vals, _offsets, _tax, _genomes = make_demo_db(
            n_species=40, genome_len=120_000, k=31, nt=9)
        (dfused,), hash_lb = build_hash_table(
            keys, vals, _tax.dense_index(vals))
        fused_host = np.asarray(dfused)
    fused = jax.device_put(fused_host)
    tax, _ = make_demo_taxonomy(40)
    n_taxa = tax.size
    print(f"B={B} LB={LB} W={W} taxa={n_taxa} lb={hash_lb} "
          f"table={fused_host.nbytes / 1e6:.0f}MB", file=sys.stderr)

    rng = np.random.default_rng(0)
    codes_packed = jax.device_put(
        rng.integers(0, 2**32, size=(B, LB // 16), dtype=np.uint32))
    ambig_packed = jax.device_put(np.zeros((B, LB // 32), dtype=np.uint32))
    lengths = jax.device_put(np.full(B, LB, np.int32))
    taxid_table = jax.device_put(tax.taxids.astype(np.uint32))
    targs = tuple(jax.device_put(x) for x in (tax.tin, tax.tout, tax.parent))
    root = np.int32(tax.dense_index(np.asarray([1], dtype=np.uint32))[0])

    cfg = ds.StepConfig(
        k=k, nt=nt, n_iter=6, max_depth=tax.max_depth, lookup_mode="hash",
        hash_lbs=(hash_lb,), max_runs=8, dense_runs=True, packed_input=True,
        outputs=("packed", "taxa_dense", "ambig"),
    )

    sink = {}

    @jax.jit
    def ph_unpack():
        c, a = ds.unpack_input(codes_packed, ambig_packed)
        return jnp.sum(c.astype(jnp.uint32)) + jnp.sum(a)

    @jax.jit
    def ph_windows():
        c, a = ds.unpack_input(codes_packed, ambig_packed)
        canon = kops.canonical_representation(kops.pack_windows(c, k), k)
        h = ds.murmur3_finalizer_device(canon)
        return jnp.sum(h)

    @jax.jit
    def ph_probe():
        c, a = ds.unpack_input(codes_packed, ambig_packed)
        canon = kops.canonical_representation(kops.pack_windows(c, k), k)
        h = ds.murmur3_finalizer_device(canon)
        val = hash_lookup_kmers((fused,), h, jnp.ones_like(h, bool), hash_lb)
        return jnp.sum(val)

    taxa_dense = jax.device_put(
        rng.integers(0, n_taxa, size=(B, W)).astype(np.int32))
    hitmask = jax.device_put(rng.random((B, W)) < 0.9)

    @jax.jit
    def ph_resolve():
        return jnp.sum(resolve_reads(
            taxa_dense, hitmask, *targs, root, cfg.max_depth))

    enc = jax.device_put(rng.integers(0, 2**32, size=(B, W), dtype=np.uint32))
    calls = jax.device_put(rng.integers(0, n_taxa, size=B).astype(np.int32))
    reg0 = jnp.zeros((n_taxa, 1 << 12), jnp.uint8)
    kc0 = jnp.zeros(n_taxa, jnp.int64)
    rc0 = jnp.zeros(n_taxa, jnp.int64)
    lut_h = np.arange(n_taxa, dtype=np.int32)
    pool_maps = (jax.device_put(lut_h), jax.device_put(lut_h))

    upd = jax.jit(update_core, static_argnames=("p",))

    def ph_update():
        sink["u"] = upd(reg0, kc0, rc0, pool_maps, taxa_dense, enc, hitmask,
                        calls, jnp.ones(B, bool), 12)
        return sink["u"][1]

    @jax.jit
    def ph_pack():
        out = ds._pack_runs(
            taxa_dense.astype(jnp.uint32), jnp.zeros((B, W), bool),
            jnp.ones((B, W), bool), calls.astype(jnp.uint32),
            jnp.zeros(B, jnp.int32), jnp.full(B, W, jnp.int32), 8,
            dense_words=True, compact_meta=True)
        return jnp.sum(out)

    def ph_full():
        sink["f"] = ds.classify_step(
            ((fused,),), taxid_table, *targs, root,
            codes_packed, ambig_packed, lengths, cfg)
        return sink["f"]["packed"]

    # classify_and_count donates the counter state (args 0-2); rebind the
    # returned state each call or rep 2 would probe deleted buffers
    state = [reg0, kc0, rc0]

    unit_ids = np.zeros(B, np.uint8)

    def ph_fused():
        out, st, _sp = ds.classify_and_count(
            *state, pool_maps, ((fused,),), taxid_table, *targs, root,
            codes_packed, ambig_packed, lengths, np.int32(B), unit_ids, cfg, 12)
        state[:] = st
        sink["c"] = out
        return out["packed"]

    for name, fn in [
        ("unpack", ph_unpack), ("windows+murmur", ph_windows),
        ("..+probe", ph_probe), ("resolve_alone", ph_resolve),
        ("update_alone", ph_update), ("pack_alone", ph_pack),
        ("full_step", ph_full), ("fused_step+count", ph_fused),
    ]:
        dt = timeit(fn)
        print(f"{name:18s} {1e3 * dt:8.1f} ms  "
              f"({B * W / dt / 1e6:7.1f} M kmers/s)")


if __name__ == "__main__":
    main()

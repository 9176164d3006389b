"""Time the fallback (dense ids + local_dict) device program directly vs
pool mode, phase-attributed: full step, then with local_dict off, then the
wide layout. Run on the real TPU after bench.py cached the DB."""
import os, sys, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    db_dir = os.path.expanduser(
        "~/.cache/kuniq_bench_dbdir_400_25000_31_12_2400000_101000000_v5")
    import jax
    from krakenuniq_tpu.classify import Classifier, ClassifyOptions
    from krakenuniq_tpu.classify.device_step import classify_step
    from krakenuniq_tpu.utils.demo import make_demo_reads
    from krakenuniq_tpu.kmer import encode_batch

    z = np.load(os.path.join(db_dir, "genomes.npz"), allow_pickle=True)
    genomes = z["genomes"].item()
    batch, read_len = 65536, 150
    reads = make_demo_reads(genomes, n_reads=batch, read_len=read_len)
    lb = 160
    enc = encode_batch(reads, lb=lb, batch=batch)
    codes = np.asarray(enc.codes); ambig = np.asarray(enc.ambig)
    cw = codes.astype(np.uint32).reshape(batch, lb // 16, 16)
    packed_c = (cw << (np.arange(16, dtype=np.uint32) * 2)[None, None, :]).sum(axis=2, dtype=np.uint32)
    aw = ambig.astype(np.uint32).reshape(batch, lb // 32, 32)
    packed_a = (aw << np.arange(32, dtype=np.uint32)[None, None, :]).sum(axis=2, dtype=np.uint32)
    cp = jax.device_put(packed_c); ap = jax.device_put(packed_a)
    lens = jax.device_put(np.asarray(enc.lengths))

    def timeit(fn, n=4):
        # block_until_ready over this transport acks before completion
        # (BENCHNOTES §1); a tiny host fetch forces the real barrier
        def force(out):
            return np.asarray(out["packed"][:1, :1])

        force(fn())
        t0 = time.time()
        for _ in range(n - 1):
            fn()
        force(fn())
        return (time.time() - t0) / n

    for tag, kw in (("pool", {}), ("fallback", {"value_pool": False})):
        t0 = time.time()
        c = Classifier([db_dir], ClassifyOptions(print_progress=False, **kw))
        print(f"{tag}: load {time.time()-t0:.0f}s local_dict={c._cfg.local_dict}", flush=True)
        args = (c._db_planes, c._taxid_table, c._tin, c._tout, c._parent,
                c._root_dense, cp, ap, lens)
        cfgs = {"span_cfg": c._cfg_packed}
        if c._cfg_packed.local_dict:
            cfgs["no_dict"] = dataclasses.replace(
                c._cfg_packed, local_dict=False,
                outputs=tuple(k for k in c._cfg_packed.outputs if k != "lut"))
            cfgs["wide"] = c._cfg_packed_wide
        for name, cfg in cfgs.items():
            try:
                dt = timeit(lambda: classify_step(*args, cfg))
                print(f"  {tag}/{name}: {dt*1e3:.0f} ms/span  outputs={cfg.outputs}", flush=True)
            except Exception as e:
                print(f"  {tag}/{name}: FAILED {type(e).__name__} {e}", flush=True)

        # resolve-only A/B for the no_dict-vs-pool residual: the fallback
        # resolves over the FULL dense taxonomy (tin/tout ~2.4M entries,
        # the 64MB gather class) where pool mode resolves over ~504-row
        # Euler tables (VMEM class) -- r5 hypothesis for the ~15 ms gap
        import jax.numpy as jnp
        from krakenuniq_tpu.taxonomy.resolve import resolve_reads

        w = lb - 31 + 1
        rng = np.random.default_rng(0)
        if c._pool is not None:
            n_ids = c._pool.size
        else:
            n_ids = c.taxonomy.size
        taxa = jax.device_put(
            rng.integers(1, n_ids, size=(batch, w)).astype(np.int32))
        hm = jax.device_put(rng.random((batch, w)) < 0.8)

        @jax.jit
        def _res(tr, hmm, t1, t2, t3):
            return jnp.sum(
                resolve_reads(tr, hmm, t1, t2, t3, c._root_dense,
                              c._cfg_packed.max_depth))

        def force2(x):
            return np.asarray(x)

        force2(_res(taxa, hm, c._tin, c._tout, c._parent))
        n = 4
        t0 = time.time()
        for _ in range(n - 1):
            _res(taxa, hm, c._tin, c._tout, c._parent)
        force2(_res(taxa, hm, c._tin, c._tout, c._parent))
        dt = (time.time() - t0) / n
        print(f"  {tag}/resolve_only ({n_ids} ids): {dt*1e3:.0f} ms", flush=True)
        del c
main()

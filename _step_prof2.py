import os, time, dataclasses
import numpy as np
import krakenuniq_tpu
import jax, jax.numpy as jnp

cache = os.path.expanduser("~/.cache/kuniq_bench_db_40_120000_31_9_v2.npz")
z = np.load(cache, allow_pickle=True)
htags, hvals, hash_lb = z["htags"], z["hvals"], int(z["hash_lb"])
genomes = z["genomes"].item()
from krakenuniq_tpu.utils.demo import make_demo_taxonomy, make_demo_reads
from krakenuniq_tpu.kmer import encode_batch
from krakenuniq_tpu.kmer import ops as kops
from krakenuniq_tpu.lookup.hash_lookup import hash_lookup_kmers
from krakenuniq_tpu.classify.device_step import (
    StepConfig, classify_step, murmur3_finalizer_device, encode_hash_device)
from krakenuniq_tpu.taxonomy.resolve import resolve_reads

tax, _ = make_demo_taxonomy(40)
k, nt = 31, 9
B, L = 65536, 160
reads = make_demo_reads(genomes, n_reads=B, read_len=150)
enc = encode_batch(reads, lb=L, batch=B)
root = np.int32(tax.dense_index(np.asarray([1], dtype=np.uint32))[0])
tags = jax.device_put(htags); vals = jax.device_put(hvals)
taxid_table = jax.device_put(tax.taxids.astype(np.uint32))
tin, tout, parent = (jax.device_put(x) for x in (tax.tin, tax.tout, tax.parent))
codes = jax.device_put(enc.codes); ambig = jax.device_put(enc.ambig)
lengths = jax.device_put(enc.lengths)

@jax.jit
def f_kmers(codes, ambig):
    canon = kops.canonical_representation(kops.pack_windows(codes, k), k)
    ka = kops.window_any(ambig, k)
    return murmur3_finalizer_device(canon) ^ ka.astype(jnp.uint64)

@jax.jit
def f_lookup(tags, vals, codes, ambig):
    canon = kops.canonical_representation(kops.pack_windows(codes, k), k)
    ka = kops.window_any(ambig, k)
    h = murmur3_finalizer_device(canon)
    t, td = hash_lookup_kmers(tags, vals, h, ~ka, hash_lb)
    return t ^ td.astype(jnp.uint32)

@jax.jit
def f_resolve(tags, vals, tin, tout, parent, codes, ambig, lengths):
    canon = kops.canonical_representation(kops.pack_windows(codes, k), k)
    ka = kops.window_any(ambig, k)
    h = murmur3_finalizer_device(canon)
    t, td = hash_lookup_kmers(tags, vals, h, ~ka, hash_lb)
    w = L - k + 1
    pos = jnp.arange(w, dtype=jnp.int32)[None, :]
    valid = pos < jnp.maximum(lengths - (k-1), 0)[:, None]
    call = resolve_reads(td, (t != 0) & valid, tin, tout, parent, root, tax.max_depth)
    return call

base = StepConfig(k=k, nt=nt, n_iter=12, max_depth=tax.max_depth,
                  lookup_mode="hash", hash_lbs=(hash_lb,), max_runs=8)

def bench(name, f, *a, key=None):
    def sync(o):
        o = o[key] if key else o
        return np.asarray(o.ravel()[:1])
    out = f(*a)
    _ = sync(out)
    ts = []
    for _ in range(3):
        t = time.time()
        out = f(*a)
        _ = sync(out)
        ts.append(time.time()-t)
    dt = min(ts) - 0.026
    print(f"{name:32s} {dt*1e3:8.1f} ms   {dt/(B*(L-k+1))*1e9:6.2f} ns/q")

bench("kmers+murmur", f_kmers, codes, ambig)
bench("kmers+lookup", f_lookup, tags, vals, codes, ambig)
bench("kmers+lookup+resolve", f_resolve, tags, vals, tin, tout, parent, codes, ambig, lengths)
bench("classify_step full", lambda *a: classify_step((tuple(a[:2]),), *a[2:], base),
      tags, vals, taxid_table, tin, tout, parent, root, codes, ambig, lengths, key="packed")
from krakenuniq_tpu.classify.device_counters import DeviceCounters
from krakenuniq_tpu.classify.device_step import classify_and_count
dc = DeviceCounters(tax.size, 12)
def f_cc(codes, ambig, lengths):
    out, state = classify_and_count(*dc.state(), ((tags, vals),), taxid_table,
        tin, tout, parent, root, codes, ambig, lengths, np.int32(B), base, dc.p)
    dc.set_state(state)
    return out
bench("classify_and_count", f_cc, codes, ambig, lengths, key="packed")

"""Experiment: can the probe's slow fused gather emitter be fixed in-program?

Background (lookup/hash_lookup.py note): probing hashes that arrive as a
device_put INPUT runs ~9.5ms at 8.5M queries on v5e, while the identical
probe fused behind the unpack/window/murmur producer runs ~120ms. Known
non-fixes: optimization_barrier, program splitting, a u64->u32->u64 bitcast
round trip, all-u32 index math.

New candidates tried here (jax 0.9 API):
  A  baseline: probe(device_put hashes)
  B  fused producer+probe (the slow path)
  C  fused + with_layout_constraint on the hash value (default layout)
  D  fused + with_layout_constraint on the int32 bucket indices
  E  fused, but gather indices forced through a tiny lax.sort (materializes
     via the sort unit rather than the vector loop)

Usage: python tools/probe_emitter_exp.py  (needs the TPU; ~1 min)
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from krakenuniq_tpu.classify import device_step as ds
from krakenuniq_tpu.kmer import ops as kops
from krakenuniq_tpu.lookup.hash_lookup import _probe

LB = 22
K = 31
B, LBLEN = 65536, 160


def timeit(fn, *a, n=5):
    # fetch-sync: the remote transport's block_until_ready acks at dispatch,
    # not completion; all fns return scalars, so np.asarray is the barrier
    np.asarray(fn(*a))
    t0 = time.time()
    for _ in range(n - 1):
        fn(*a)
    np.asarray(fn(*a))
    return (time.time() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    fused = jax.device_put(
        rng.integers(0, 2**32, size=(1 << LB, 4), dtype=np.uint64).astype(np.uint32)
    )
    codes_packed = jax.device_put(
        rng.integers(0, 2**32, size=(B, LBLEN // 16), dtype=np.uint64).astype(np.uint32)
    )
    ambig_packed = jax.device_put(np.zeros((B, LBLEN // 32), np.uint32))
    w = LBLEN - K + 1
    print(f"queries: {B}x{w} = {B*w/1e6:.1f}M, table 2^{LB} buckets")

    def produce(cp, ap):
        c, a = ds.unpack_input(cp, ap)
        canon = kops.canonical_representation(kops.pack_windows(c, K), K)
        return ds.murmur3_finalizer_device(canon)

    @jax.jit
    def probe_only(h):
        ok, val = _probe((fused,), h.reshape(-1), LB)
        return jnp.sum(jnp.where(ok, val, 0))

    @jax.jit
    def fused_plain(cp, ap):
        h = produce(cp, ap)
        ok, val = _probe((fused,), h.reshape(-1), LB)
        return jnp.sum(jnp.where(ok, val, 0))

    h_input = jax.device_put(np.asarray(jax.jit(produce)(codes_packed, ambig_packed)))
    print(f"A probe(device_put input):      {timeit(probe_only, h_input):7.1f} ms")
    print(f"B fused producer+probe:         {timeit(fused_plain, codes_packed, ambig_packed):7.1f} ms")

    try:
        from jax.experimental.layout import Format, Layout, with_layout_constraint

        def constrain(x):
            fmt = Format(Layout(tuple(range(x.ndim - 1, -1, -1))))
            return with_layout_constraint(x, fmt)

        @jax.jit
        def fused_c(cp, ap):
            h = constrain(produce(cp, ap))
            ok, val = _probe((fused,), h.reshape(-1), LB)
            return jnp.sum(jnp.where(ok, val, 0))

        print(f"C constraint on hash value:     {timeit(fused_c, codes_packed, ambig_packed):7.1f} ms")

        @jax.jit
        def fused_d(cp, ap):
            h = produce(cp, ap).reshape(-1)
            from krakenuniq_tpu.db.hash_table import GOLDEN

            shift = np.uint64(64 - LB)
            r1 = constrain((h >> shift).astype(jnp.int32))
            r2 = constrain(((h * GOLDEN) >> shift).astype(jnp.int32))
            row1 = jnp.take(fused, r1, axis=0)
            row2 = jnp.take(fused, r2, axis=0)
            return jnp.sum(row1) + jnp.sum(row2)

        print(f"D constraint on indices:        {timeit(fused_d, codes_packed, ambig_packed):7.1f} ms")
    except Exception as e:
        print("C/D unavailable:", e)

    @jax.jit
    def fused_e(cp, ap):
        h = produce(cp, ap)
        h = jax.lax.sort(h, dimension=0)  # degenerate: dim 0 of [B, W]? no-op cost probe
        ok, val = _probe((fused,), h.reshape(-1), LB)
        return jnp.sum(jnp.where(ok, val, 0))

    print(f"E sort-materialized hashes:     {timeit(fused_e, codes_packed, ambig_packed):7.1f} ms")


if __name__ == "__main__":
    main()

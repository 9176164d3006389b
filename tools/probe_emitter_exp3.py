"""Gather-emitter pathology, round 3b: full-size shapes, no host downloads.

The A reference point uses a device_put of host-random u64 hashes (upload
only; the round-2 script stalled minutes downloading the producer output to
replicate its layout -- unnecessary, since the producer's output format
prints identical to device_put's).

Candidates at B=65536 (8.5M queries):
  A  probe(device_put random hashes)    -- the known-fast path (~9.5ms r2)
  B  fused producer+probe               -- the slow path (~120ms r2)
  S  split: producer jit | probe jit    -- same executable as A if layouts match
  G  fused, 2-D [B, W] index gather (no reshape(-1))
  H  fused, single-gather variant with u32-limb index math

Usage: python tools/probe_emitter_exp3.py [B]
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
from krakenuniq_tpu.db.hash_table import GOLDEN
from krakenuniq_tpu.lookup.hash_lookup import _probe

LB = 22
K = 31
B = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
LBLEN = 160
W = LBLEN - K + 1
NQ = B * W


def timeit(fn, *a, n=5):
    np.asarray(fn(*a))
    t0 = time.time()
    for _ in range(n - 1):
        fn(*a)
    np.asarray(fn(*a))
    return (time.time() - t0) / n * 1e3


def report(tag, ms):
    gbps = 2 * 16 * NQ / ms / 1e6
    print(f"{tag:34s} {ms:8.2f} ms  ({gbps:6.1f} GB/s gathered)", flush=True)


def main():
    rng = np.random.default_rng(0)
    fused = jax.device_put(
        rng.integers(0, 2**32, size=(1 << LB, 4), dtype=np.uint64).astype(np.uint32)
    )
    codes_packed = jax.device_put(
        rng.integers(0, 2**32, size=(B, LBLEN // 16), dtype=np.uint64).astype(np.uint32)
    )
    ambig_packed = jax.device_put(np.zeros((B, LBLEN // 32), np.uint32))
    print(f"queries: {B}x{W} = {NQ/1e6:.2f}M, table 2^{LB} buckets", flush=True)

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

    t0 = time.time()
    h_rand = jax.device_put(rng.integers(0, 2**64, size=(B, W), dtype=np.uint64))
    h_rand.block_until_ready()
    print(f"[h upload {time.time()-t0:.1f}s]", flush=True)
    report("A probe(device_put random h)", timeit(probe_only, h_rand))
    report("B fused producer+probe", timeit(fused_plain, codes_packed, ambig_packed))

    produce_j = jax.jit(produce)
    h_dev = produce_j(codes_packed, ambig_packed)
    print("producer out format:", h_dev.format, flush=True)
    print("device_put   format:", h_rand.format, flush=True)

    def split(cp, ap):
        return probe_only(produce_j(cp, ap))

    report("S split producer|probe", timeit(split, codes_packed, ambig_packed))

    @jax.jit
    def fused_2d(cp, ap):
        h = produce(cp, ap)
        shift = np.uint64(64 - LB)
        hg = h * GOLDEN
        r1 = (h >> shift).astype(jnp.int32)
        r2 = (hg >> shift).astype(jnp.int32)
        row1 = jnp.take(fused, r1, axis=0)  # [B, W, 4]
        row2 = jnp.take(fused, r2, axis=0)
        return jnp.sum(row1) + jnp.sum(row2)

    report("G fused 2-D index gather", timeit(fused_2d, codes_packed, ambig_packed))

    @jax.jit
    def fused_u32(cp, ap):
        h = produce(cp, ap)
        pair = jax.lax.bitcast_convert_type(h, jnp.uint32)  # [..., 2] (lo, hi)
        hi = pair[..., 1].reshape(-1)
        r1 = (hi >> jnp.uint32(32 - LB)).astype(jnp.int32)
        row1 = jnp.take(fused, r1, axis=0)
        return jnp.sum(row1)

    report("H fused u32-limb single gather", timeit(fused_u32, codes_packed, ambig_packed))


if __name__ == "__main__":
    main()

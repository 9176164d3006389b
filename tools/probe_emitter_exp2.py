"""Gather-emitter pathology, round 3: smaller shapes (the v5e tunnel moves
~2-30 MB/s, so the round-2 experiment stalled minutes on a 68MB fetch before
printing anything), layout introspection, and new candidates.

Baseline facts (lookup/hash_lookup.py note): probe(device_put hashes) ~9.5ms
at 8.5M queries; the same probe fused behind unpack/window/murmur ~120ms.

Candidates here (timings at B=8192, 1.06M queries -> ~1/8 the above):
  A  probe(device_put hashes)           -- fast reference point
  B  fused producer+probe               -- the slow path
  S  split: producer jit, then probe jit on its output (no host trip)
  F  split + forced default layout on the producer output (out_shardings)
  G  fused, but probe gathers with 2-D [B, W] indices (no reshape(-1))
  H  fused, hashes bitcast to u32 pairs and index math in u32
  P  fused, probe as a pallas kernel (table in HBM/ANY, per-block DMA)

Each prints ms and the achieved gathered GB/s (2x16B rows per query).
Usage: python tools/probe_emitter_exp2.py [B]
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
B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
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

    produce_j = jax.jit(produce)
    h_dev = produce_j(codes_packed, ambig_packed)
    try:
        print("producer out format:", h_dev.format, flush=True)
    except Exception as e:
        print("format introspection unavailable:", e, flush=True)
    t_f = time.time()
    h_host = np.asarray(h_dev)
    h_input = jax.device_put(h_host)
    try:
        print(f"device_put   format: {h_input.format}  (round trip {time.time()-t_f:.1f}s)", flush=True)
    except Exception:
        pass

    report("A probe(device_put input)", timeit(probe_only, h_input))
    report("B fused producer+probe", timeit(fused_plain, codes_packed, ambig_packed))

    def split(cp, ap):
        return probe_only(produce_j(cp, ap))

    report("S split producer|probe", timeit(split, codes_packed, ambig_packed))

    # F: force the producer output onto the device_put layout
    try:
        fmt = h_input.format
        produce_f = jax.jit(produce, out_shardings=fmt)
        h_f = produce_f(codes_packed, ambig_packed)
        print("forced     format:", h_f.format, flush=True)

        def split_f(cp, ap):
            return probe_only(produce_f(cp, ap))

        report("F split + forced out layout", timeit(split_f, codes_packed, ambig_packed))
    except Exception as e:
        print("F unavailable:", repr(e), flush=True)

    # G: 2-D gather, no flatten
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

    # H: pure-u32 index math from bitcast pairs
    @jax.jit
    def fused_u32(cp, ap):
        h = produce(cp, ap)
        pair = jax.lax.bitcast_convert_type(h, jnp.uint32)  # [B, W, 2] (lo, hi)
        hi = pair[..., 1].reshape(-1)
        r1 = (hi >> jnp.uint32(32 - LB)).astype(jnp.int32)
        row1 = jnp.take(fused, r1, axis=0)
        return jnp.sum(row1)

    report("H fused u32-limb index gather", timeit(fused_u32, codes_packed, ambig_packed))


if __name__ == "__main__":
    main()

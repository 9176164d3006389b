"""Sparse-stats compaction-sort experiment (VERDICT r4 item 5).

sparse_stats_core ends by sorting the 8.5M-lane out_key plane (emitted
pair/event keys below, PAD above) to compact <=cap emitted entries into a
prefix -- ~58 ms of the ~110 ms phase. Candidates measured here:

  A  lax.sort(u64)                      -- shipped
  B  lax.sort((i32 emit-rank, u64 payload), num_keys=1)
     (the final order only needs emitted-before-pad + pair/event split;
      pairs arrive already sorted from the FIRST sort, so a 2-bit rank is
      enough IF the host re-merges -- this measures the sort cost only)
  C  lax.sort((u32 key-hi, u64 payload)) -- 32-bit key, full-order proxy
  D  cumsum+scatter compaction (flag cumsum -> dynamic positions)

plus the first sort (u64 key + i32 payload) as the session control.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import krakenuniq_tpu  # noqa: F401  (enables x64 before jax init)
import jax
import jax.numpy as jnp


def main():
    n = 8_519_680
    cap = 1 << 21
    rng = np.random.default_rng(0)
    # ~3% emitted (zipf-ish tail), rest PAD -- matches bench workloads
    emit = rng.random(n) < 0.03
    keys = np.where(
        emit,
        rng.integers(0, 1 << 62, size=n).astype(np.uint64),
        np.uint64(0xFFFFFFFFFFFFFFFF),
    )
    kd = jax.device_put(keys)
    pos = jax.device_put(np.arange(n, dtype=np.int32))

    def bench(tag, fn, *a):
        red = jax.jit(lambda *xs: jnp.sum(fn(*xs).astype(jnp.uint32)))
        np.asarray(red(*a))
        best = 1e9
        for _ in range(3):
            t = time.time()
            np.asarray(red(*a))
            best = min(best, time.time() - t)
        print(f"{tag}: {best*1e3:7.1f} ms", flush=True)
        return best

    bench("control sort u64 + i32 payload", lambda k, p: jax.lax.sort((k, p), num_keys=1)[0], kd, pos)
    bench("A shipped sort u64           ", lambda k: jax.lax.sort(k)[:cap], kd)
    bench(
        "B sort i32 rank + u64 payload",
        lambda k: jax.lax.sort(
            ((k >> jnp.uint64(62)).astype(jnp.int32), k), num_keys=1
        )[1][:cap],
        kd,
    )
    bench(
        "C sort u32 hi + u64 payload  ",
        lambda k: jax.lax.sort(
            ((k >> jnp.uint64(32)).astype(jnp.uint32), k), num_keys=1
        )[1][:cap],
        kd,
    )

    def compaction(k):
        em = k != jnp.uint64(0xFFFFFFFFFFFFFFFF)
        dst = jnp.cumsum(em.astype(jnp.int32)) - 1
        dst = jnp.where(em, dst, cap)  # dropped lanes pile on a sentinel row
        out = jnp.zeros(cap + 1, jnp.uint64)
        return out.at[dst].set(k, mode="drop")[:cap]

    bench("D cumsum + scatter compaction", compaction, kd)


main()

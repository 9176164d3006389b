"""In-process A/B of the device-counter register update: sort-based segment
max vs scatter-max, at B=65536 lanes with a pool-mode-sized register plane.
(Cross-process timings on this rig vary 3-10x; only same-process deltas are
trustworthy -- BENCHNOTES.md.)

Usage: python tools/reg_update_ab.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from krakenuniq_tpu.classify import device_counters as dcm

B, W = 65536, 130
POOL = 504
P = 12


def timeit(fn, n=5):
    np.asarray(fn())
    t0 = time.time()
    for _ in range(n - 1):
        fn()
    np.asarray(fn())
    return (time.time() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    m = 1 << P
    pool_rows = np.arange(POOL, dtype=np.int32)
    lut = np.zeros(POOL, np.int32)
    lut[:POOL] = np.arange(POOL)
    pool_maps = (jnp.asarray(pool_rows), jnp.asarray(lut))
    taxa = jax.device_put(rng.integers(0, POOL, size=(B, W)).astype(np.int32))
    enc = jax.device_put(rng.integers(0, 2**32, size=(B, W), dtype=np.uint64).astype(np.uint32))
    lanes = jax.device_put(rng.random((B, W)) < 0.8)
    call = jax.device_put(rng.integers(0, POOL, size=B).astype(np.int32))
    rv = jax.device_put(np.ones(B, bool))
    uid = jax.device_put(np.zeros(B, np.uint8))

    for mode in ("sort", "identity"):
        ident = mode == "identity"
        upd = jax.jit(
            dcm.update_core,
            donate_argnums=(0, 1, 2),
            static_argnames=("p", "sparse_cap", "counts_only", "identity_pool"),
        )
        state = [
            jnp.zeros((POOL, m), jnp.uint8),
            jnp.zeros(POOL, jnp.int64),
            jnp.zeros(POOL, jnp.int64),
        ]

        def step():
            out = upd(
                state[0], state[1], state[2], pool_maps, taxa, enc, lanes,
                call, rv, P, uid, 0, False, ident,
            )
            state[0], state[1], state[2] = out[:3]
            return state[1][:4]

        ms = timeit(step)
        print(f"update [{mode:7s}]: {ms:7.1f} ms/step", flush=True)

    # sparse stats alone
    from krakenuniq_tpu.classify.sparse_exact import sparse_stats_core

    ss = jax.jit(sparse_stats_core, static_argnames=("p", "cap"))

    def step_ss():
        buf, n_p, n_e = ss(taxa, enc, lanes, uid, P, 1 << 17)
        return n_p + n_e

    print(f"sparse_stats alone: {timeit(step_ss):7.1f} ms/step", flush=True)

    # bincount alone (the kmer-count piece)
    t = 1 << 16

    @jax.jit
    def bc(taxa, lanes):
        tf = taxa.reshape(-1)
        lf = lanes.reshape(-1)
        return jnp.bincount(jnp.where(lf, tf, t), length=t + 1)[:4]

    print(f"bincount 8.5M -> 64K: {timeit(lambda: bc(taxa, lanes)):7.1f} ms", flush=True)


if __name__ == "__main__":
    main()

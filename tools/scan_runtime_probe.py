"""Runtime of 1-D cumulative ops and sorts at 8.5M elements on v5e.

The fused counter program runs ~5.4s/span after the cummax/cumsum scan
rewrite (compile-cheap but runtime-suspect). Measures each primitive and a
two-level blocked formulation.

Usage: python tools/scan_runtime_probe.py
"""

import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

N = 65536 * 130


def timeit(fn, *a, n=3):
    np.asarray(fn(*a))
    t0 = time.time()
    for _ in range(n - 1):
        fn(*a)
    np.asarray(fn(*a))
    return (time.time() - t0) / n * 1e3


def blocked_cummax(x, blk=4096):
    n = x.shape[0]
    nb = n // blk
    x2 = x.reshape(nb, blk)
    local = jax.lax.cummax(x2, axis=1)
    totals = local[:, -1]
    carry = jax.lax.cummax(totals, axis=0)
    prev = jnp.concatenate([jnp.full((1,), x.dtype.type(np.iinfo(np.int64).min)), carry[:-1]])
    return jnp.maximum(local, prev[:, None]).reshape(-1)


def blocked_cumsum(x, blk=4096):
    n = x.shape[0]
    nb = n // blk
    x2 = x.reshape(nb, blk)
    local = jnp.cumsum(x2, axis=1)
    totals = local[:, -1]
    carry = jnp.cumsum(totals)
    prev = jnp.concatenate([jnp.zeros((1,), x.dtype), carry[:-1]])
    return (local + prev[:, None]).reshape(-1)


def main():
    rng = np.random.default_rng(0)
    xi = jax.device_put(rng.integers(0, 2**40, size=N).astype(np.int64))
    xu = jax.device_put(rng.integers(0, 2**64, size=N, dtype=np.uint64))
    pos = jax.device_put(np.arange(N, dtype=np.int64))
    print(f"N = {N/1e6:.1f}M", flush=True)

    f = jax.jit(lambda x: jnp.sum(jax.lax.cummax(x)))
    print(f"lax.cummax 1-D i64:        {timeit(f, xi):9.1f} ms", flush=True)
    f2 = jax.jit(lambda x: jnp.sum(jnp.cumsum(x)))
    print(f"jnp.cumsum 1-D i64:        {timeit(f2, xi):9.1f} ms", flush=True)
    f3 = jax.jit(lambda x: jnp.sum(blocked_cummax(x)))
    print(f"blocked cummax i64:        {timeit(f3, xi):9.1f} ms", flush=True)
    f4 = jax.jit(lambda x: jnp.sum(blocked_cumsum(x)))
    print(f"blocked cumsum i64:        {timeit(f4, xi):9.1f} ms", flush=True)
    f5 = jax.jit(lambda k, p: jnp.sum(jax.lax.sort((k, p), num_keys=1)[1]))
    print(f"sort (u64 key, i64 payload): {timeit(f5, xu, pos):7.1f} ms", flush=True)
    f6 = jax.jit(lambda k: jnp.sum(jax.lax.sort(k)))
    print(f"sort u64:                  {timeit(f6, xu):9.1f} ms", flush=True)
    # i32 variants (half the lanes' width)
    xi32 = jax.device_put(rng.integers(0, 2**30, size=N).astype(np.int32))
    f7 = jax.jit(lambda x: jnp.sum(jnp.cumsum(x)))
    print(f"jnp.cumsum 1-D i32:        {timeit(f7, xi32):9.1f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Per-taxon k-mer counts: shipped i32-sort + boundary probes vs
scatter-add bincount vs a pallas one-hot MXU kernel (counting as a
[1, CH] x [CH, T] matmul per chunk -- the cross-lane reduction rides the
MXU instead of shuffle-reduces; f32 accumulation is exact below 2^24).

Usage: python tools/counts_mxu_exp.py [n_millions [T]]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 8_520_000
T = int(sys.argv[2]) if len(sys.argv) > 2 else 504

L = int(sys.argv[3]) if len(sys.argv) > 3 else 2048  # lanes per grid step ([L, 1] sublane-major blocks)
CT = 128  # class tile (lane width of the one-hot matmul)


def counts_sort(x, t):
    st = jax.lax.sort(x)
    edges = jnp.searchsorted(st, jnp.arange(t + 1, dtype=jnp.int32), side="left")
    return (edges[1:] - edges[:-1]).astype(jnp.int64)


def counts_bincount(x, t):
    return jnp.bincount(x, length=t + 1)[:t].astype(jnp.int64)


def _mxu_kernel(x_ref, out_ref):
    # x: [L, 1] i32 sublane-major lane block; out: [n_ct, CT] f32 accumulator
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = x_ref[:]  # [L, 1] i32
    n_ct = out_ref.shape[0]
    ones = jnp.ones((1, L), jnp.float32)
    for c in range(n_ct):
        cls = jax.lax.broadcasted_iota(jnp.int32, (1, CT), 1) + jnp.int32(c * CT)
        oh = (x == cls).astype(jnp.float32)  # [L, CT]
        out_ref[c, :] += jnp.dot(ones, oh, preferred_element_type=jnp.float32)[0]


def counts_mxu(x, t, interpret=False):
    n = x.shape[0]
    pad = (-n) % L
    xp = jnp.pad(x, (0, pad), constant_values=-1).reshape(-1, 1)
    n_ct = -(-t // CT)
    grid = xp.shape[0] // L
    out = pl.pallas_call(
        _mxu_kernel,
        out_shape=jax.ShapeDtypeStruct((n_ct, CT), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((L, 1), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (n_ct, CT), lambda i: (jnp.int32(0), jnp.int32(0)), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xp)
    return out.reshape(-1)[:t].astype(jnp.int64)


def timeit(fn, *a, n=5):
    np.asarray(fn(*a))
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        np.asarray(fn(*a))
        best = min(best, time.time() - t0)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.zipf(1.5, size=N) % T).astype(np.int32))

    f_sort = jax.jit(lambda x: jnp.sum(counts_sort(x, T) * jnp.arange(T)))
    f_binc = jax.jit(lambda x: jnp.sum(counts_bincount(x, T) * jnp.arange(T)))
    f_mxu = jax.jit(lambda x: jnp.sum(counts_mxu(x, T) * jnp.arange(T)))
    d1, d2, d3 = (np.asarray(f(x)) for f in (f_sort, f_binc, f_mxu))
    print(f"digests sort={d1} bincount={d2} mxu={d3} equal={d1 == d2 == d3}", flush=True)
    print(f"sort+boundary: {timeit(f_sort, x):7.1f} ms", flush=True)
    print(f"bincount:      {timeit(f_binc, x):7.1f} ms", flush=True)
    print(f"mxu one-hot:   {timeit(f_mxu, x):7.1f} ms", flush=True)


if __name__ == "__main__":
    main()

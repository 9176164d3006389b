import time
import numpy as np
import krakenuniq_tpu
import jax, jax.numpy as jnp

N = 65536 * 130
NB = 1 << 22
rng = np.random.default_rng(0)
i1 = jnp.asarray(rng.integers(0, NB, N).astype(np.int32))
i2 = jnp.asarray(rng.integers(0, NB, N).astype(np.int32))

def bench(name, f, *a):
    out = f(*a); _ = np.asarray(out.ravel()[:1])
    ts = []
    for _ in range(3):
        t = time.time(); out = f(*a); _ = np.asarray(out.ravel()[:1])
        ts.append(time.time()-t)
    dt = min(ts) - 0.026
    print(f"{name:44s} {dt*1e3:8.1f} ms   {dt/N*1e9:6.2f} ns/q")

# one gather, varying row shape/dtype
for w, dt_ in ((4, jnp.uint64), (8, jnp.uint64), (4, jnp.uint32), (8, jnp.uint32), (16, jnp.uint32)):
    tbl = jnp.zeros((NB, w), dt_)
    f = jax.jit(lambda t_, i: jnp.take(t_, i, axis=0).sum(axis=1))
    bench(f"1 gather {w}x{dt_.__name__}", f, tbl, i1)

# two independent gathers from same 4xu64 plane (current tag-probe shape)
tbl = jnp.zeros((NB, 4), jnp.uint64)
f2 = jax.jit(lambda t_, a, b: jnp.take(t_, a, axis=0).sum(axis=1) ^ jnp.take(t_, b, axis=0).sum(axis=1))
bench("2 gathers 4xu64 (independent)", f2, tbl, i1, i2)

# four independent gathers (current full lookup shape)
f4 = jax.jit(lambda t_, a, b: (jnp.take(t_, a, axis=0).sum(axis=1) ^ jnp.take(t_, b, axis=0).sum(axis=1))
             ^ (jnp.take(t_, a ^ 1, axis=0).sum(axis=1) ^ jnp.take(t_, b ^ 1, axis=0).sum(axis=1)))
bench("4 gathers 4xu64 (independent)", f4, tbl, i1, i2)

# two independent gathers 8xu64 (merged-plane two-choice)
tbl8 = jnp.zeros((NB, 8), jnp.uint64)
f28 = jax.jit(lambda t_, a, b: jnp.take(t_, a, axis=0).sum(axis=1) ^ jnp.take(t_, b, axis=0).sum(axis=1))
bench("2 gathers 8xu64 (merged two-choice)", f28, tbl8, i1, i2)

# scalar u64 gather (flat)
flat = jnp.zeros((NB * 4,), jnp.uint64)
fs = jax.jit(lambda t_, i: jnp.take(t_, i))
bench("1 scalar gather u64", fs, flat, i1)

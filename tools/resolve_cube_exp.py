"""Resolve-phase formulations: event-sort (round 3, taxonomy/resolve.py)
vs the O(W^2) all-pairs compare cube the r2 design note dismissed without
measuring. At B=65536, W=130 the cube is ~1.1G lane comparisons -- ~4.4G
VPU int-ops ~= 2-3 ms of pure VPU time IF XLA fuses the [B, W, W]
compare-reduce, vs the measured ~53 ms for the two [B, 3W] sorts.

Both must return identical calls (same score integers, same first-argmax
tie handling). Scalar-reduced outputs + np.asarray for a true barrier.

Usage: python tools/resolve_cube_exp.py [B [W]]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from krakenuniq_tpu.taxonomy.resolve import resolve_reads

B = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
W = int(sys.argv[2]) if len(sys.argv) > 2 else 130
T = 40_000
MAX_DEPTH = 32


def resolve_reads_cube(
    taxa_dense, hit_mask, tin, tout, parent, root_dense, max_depth
):
    """All-pairs formulation: identical semantics to resolve_reads."""
    t = jnp.where(hit_mask, taxa_dense, 0)
    io = jnp.stack([tin, tout], axis=1)
    rows = jnp.take(io, t, axis=0)  # [B, W, 2]
    tins = rows[..., 0]
    touts = rows[..., 1]

    # score[b,i] = #{j: hit_j and tin_j <= tin_i < tout_j}
    q = tins[:, :, None]  # [B, W(i), 1]
    ge = tins[:, None, :] <= q
    lt = touts[:, None, :] > q
    m = ge & lt & hit_mask[:, None, :]
    score = jnp.sum(m, axis=2, dtype=jnp.int32)
    score = jnp.where(hit_mask, score, 0)

    max_score = jnp.max(score, axis=1)
    classified = max_score > 0
    tied = (score == max_score[:, None]) & hit_mask
    big = jnp.int32(2**31 - 1)
    tmin = jnp.min(jnp.where(tied, tins, big), axis=1)
    tmax = jnp.max(jnp.where(tied, tins, -1), axis=1)
    start = jnp.take_along_axis(t, jnp.argmax(score, axis=1)[:, None], axis=1)[:, 0]

    def step(_, carry):
        node, best, found = carry
        nrows = jnp.take(io, node, axis=0)
        ok = (nrows[:, 0] <= tmin) & (tmax < nrows[:, 1])
        best = jnp.where(ok & ~found, node, best)
        found = found | ok
        node = jnp.take(parent, node)
        return node, best, found

    init = (start, jnp.full_like(start, root_dense), jnp.zeros_like(classified))
    _, best, found = jax.lax.fori_loop(0, max_depth + 1, step, init)
    call = jnp.where(found, best, root_dense)
    return jnp.where(classified, call, 0).astype(jnp.int32)


def make_tree(rng, t):
    """Random tree with Euler intervals: parent[i] < i, dfs tin/tout."""
    parent = np.zeros(t, np.int32)
    for i in range(1, t):
        parent[i] = rng.integers(0, i)
    children = [[] for _ in range(t)]
    for i in range(1, t):
        children[parent[i]].append(i)
    tin = np.zeros(t, np.int32)
    tout = np.zeros(t, np.int32)
    clock = 0
    stack = [(0, False)]
    while stack:
        node, done = stack.pop()
        if done:
            tout[node] = clock
            clock += 1
            continue
        tin[node] = clock
        clock += 1
        stack.append((node, True))
        for c in reversed(children[node]):
            stack.append((c, False))
    return parent, tin, tout


def timeit(fn, *a, n=5):
    np.asarray(fn(*a))
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        r = fn(*a)
        np.asarray(r)
        best = min(best, time.time() - t0)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    parent, tin, tout = make_tree(rng, T)
    taxa = rng.integers(1, T, size=(B, W)).astype(np.int32)
    hits = rng.random((B, W)) < 0.75
    args = (
        jnp.asarray(taxa), jnp.asarray(hits), jnp.asarray(tin),
        jnp.asarray(tout), jnp.asarray(parent), jnp.int32(0),
    )

    f_sort = jax.jit(lambda *a: jnp.sum(resolve_reads(*a, MAX_DEPTH).astype(jnp.int64)))
    f_cube = jax.jit(lambda *a: jnp.sum(resolve_reads_cube(*a, MAX_DEPTH).astype(jnp.int64)))
    d1, d2 = np.asarray(f_sort(*args)), np.asarray(f_cube(*args))
    # digest equality is necessary; full-array equality is in the unit tests
    print(f"digest sort={d1} cube={d2} equal={bool(d1 == d2)}", flush=True)
    print(f"event-sort resolve: {timeit(f_sort, *args):8.1f} ms", flush=True)
    print(f"cube resolve:       {timeit(f_cube, *args):8.1f} ms", flush=True)


if __name__ == "__main__":
    main()

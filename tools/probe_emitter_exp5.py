"""Row-gather width scaling on v5e: is the cost per row-index or per element?

probe_emitter_exp4 results: 1 row x 4 u32 = 6.7ns/idx; 2 rows x 4 u32 =
13.4ns; single-element (1-D) gathers are WORSE (8.9ns/elem); locality and
table size barely matter (tiny VMEM table: 3.1ns/idx). If per-row cost is
flat in width, a direct-mapped wide-bucket table + tiny stash beats the
2-choice cuckoo probe by ~2x.

Measures one [nb, w] row gather per query for w in {2, 4, 8, 16, 32},
with nb scaled to keep total table bytes fixed (~64MB), plus the tiny-table
(VMEM) case and a fused 2-choice [nb, 2] probe.

Usage: python tools/probe_emitter_exp5.py [B]
"""

import sys
import time

import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
W = 130
NQ = B * W
TOTAL_LOG2 = 26  # 64MB of u32 elements


def timeit(fn, *a, n=5):
    np.asarray(fn(*a))
    t0 = time.time()
    for _ in range(n - 1):
        fn(*a)
    np.asarray(fn(*a))
    return (time.time() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    h = jax.device_put(rng.integers(0, 2**64, size=NQ, dtype=np.uint64))
    print(f"queries {NQ/1e6:.2f}M", flush=True)

    import functools

    @functools.partial(jax.jit, static_argnames=("shift",))
    def g(tab, h, shift):
        r = (h >> np.uint64(shift)).astype(jnp.int32)
        return jnp.sum(jnp.take(tab, r, axis=0))

    for wlog in (1, 2, 3, 4, 5):
        w = 1 << wlog
        lb = TOTAL_LOG2 - wlog
        tab = jax.device_put(
            rng.integers(0, 2**32, size=(1 << lb, w), dtype=np.uint64).astype(
                np.uint32
            )
        )
        ms = timeit(g, tab, h, 64 - lb)
        print(
            f"1 row x {w:2d} u32 ({(1<<lb)*w*4>>20}MB): {ms:8.2f} ms "
            f"({ms*1e6/NQ:5.2f} ns/idx)",
            flush=True,
        )
        del tab

    # tiny (VMEM-resident) wide-row gather: the stash probe cost model
    for lb, w in ((12, 4), (14, 4)):
        tab = jax.device_put(
            rng.integers(0, 2**32, size=(1 << lb, w), dtype=np.uint64).astype(
                np.uint32
            )
        )
        ms = timeit(g, tab, h, 64 - lb)
        print(
            f"tiny 2^{lb} x {w} u32 ({(1<<lb)*w*4>>10}KB): {ms:8.2f} ms "
            f"({ms*1e6/NQ:5.2f} ns/idx)",
            flush=True,
        )


if __name__ == "__main__":
    main()

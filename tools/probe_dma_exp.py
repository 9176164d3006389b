"""Pallas DMA probe experiment (VERDICT r4 item 1).

Question: is XLA's ~12.9 ns/random-16B-row gather rate (BENCHNOTES §2/§13)
an XLA artifact or the hardware's random-access limit? XLA runs one gather
loop; a Pallas kernel can keep S independent row DMAs in flight. This tool
measures achieved random row-fetches/s vs the in-flight window S, plus the
XLA gather control in the same session.

Toolchain constraint discovered here: this Mosaic backend CRASHES
(remote_compile HTTP 500) on any DMA whose destination is narrower than
the 128-lane tile -- a 16-byte (1, 4) row copy cannot be compiled. The
kernel therefore fetches 512-byte (1, 128) rows from a [R/32, 128] view of
the table: 32x the bytes per request, but bandwidth is not the scarce
resource (8.5M x 512B = 4.4 GB ~= 5 ms at HBM rate); the question is
sustained random REQUESTS/s. A (1, 128) fetch containing the wanted 16B
row is the narrowest destination this backend compiles.

Kernel: per grid step, a [Q] query block in SMEM; a scalar fori_loop
issues one row DMA per query into a [Q, 128] VMEM scratch, waiting on DMA
i-S before issuing i (sliding window of at most S outstanding); a drain
loop completes the tail and the scratch block is written out (adds a
sequential 512B/query HBM write, ~6 ms/pass, identical across variants).
Output is byte-checked against jnp.take.

Usage: python tools/probe_dma_exp.py [--rows 26] [--queries 8519680]
       [--q 2048] [--depths 1,4,16,64,256]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_probe(Q: int, S: int, n_chunks: int):
    qw = Q // 8  # q feeds as [n_chunks, 8, Q//8] to satisfy SMEM tiling

    # Semaphores form a RING of S (one per in-flight slot): a sem array the
    # size of the whole chunk (Q=2048) fails to compile -- the hardware sem
    # count is bounded; S<=256 rings compile. Copy i signals sems[i % S];
    # the wait before issuing i targets copy i-S, which used the same slot.
    def kernel(q_ref, table_ref, out_ref, scratch, sems):
        def row_dma(i):
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(q_ref[0, i // qw, i % qw], 1), :],
                scratch.at[pl.ds(i, 1), :],
                sems.at[jax.lax.rem(i, S)],
            )

        def issue(i, _):
            @pl.when(i >= S)
            def _():
                row_dma(i - S).wait()

            row_dma(i).start()
            return 0

        jax.lax.fori_loop(0, Q, issue, 0)

        def drain(i, _):
            row_dma(i).wait()
            return 0

        jax.lax.fori_loop(max(0, Q - S), Q, drain, 0)
        out_ref[:] = scratch[:]

    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 8, qw), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((Q, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_chunks * Q, 128), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((Q, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((S,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=26, help="log2 16B table rows")
    ap.add_argument("--queries", type=int, default=8_519_680)
    ap.add_argument("--q", type=int, default=2048, help="queries per grid step")
    ap.add_argument("--depths", default="1,4,16,64,256")
    ap.add_argument("--check", action="store_true", help="small correctness run only")
    args = ap.parse_args()

    R = 1 << args.rows  # 16B rows; wide view has R/32 512B rows
    Rw = R // 32
    rng = np.random.default_rng(7)
    print(
        f"table: 2^{args.rows} x 16B rows = {R * 16 / 2**30:.2f} GB "
        f"({Rw} wide rows)",
        file=sys.stderr,
    )
    table16 = rng.integers(0, 1 << 32, size=(R, 4), dtype=np.uint32)
    table = jax.device_put(table16.reshape(Rw, 128))
    jax.block_until_ready(table)

    def bench(fn, *a):
        # scalar-reduced output: np.asarray forces true completion without
        # fetching the big array (BENCHNOTES §13 methodology)
        red = jax.jit(lambda *xs: fn(*xs).sum(dtype=jnp.uint32))
        np.asarray(red(*a))  # compile + warm
        best = 1e9
        for _ in range(3):
            t = time.time()
            np.asarray(red(*a))
            best = min(best, time.time() - t)
        return best

    if args.check:
        Q, n_chunks = 256, 4
        q = rng.integers(0, Rw, size=(n_chunks * Q,), dtype=np.int32)
        f = make_probe(Q, 8, n_chunks)
        out = np.asarray(f(q.reshape(n_chunks, 8, Q // 8), table))
        ok = np.array_equal(out, np.asarray(table)[q])
        print(f"correct={ok}")
        return 0

    n_chunks = args.queries // args.q
    n = n_chunks * args.q

    # XLA controls, same session: the production 16B-row gather and a 512B
    # wide-row gather. The 16B table uploads as its own [R, 4] device array
    # (a device reshape of the wide table pads rows to the 128-lane tile =
    # 32x the memory; closing over the host array would bake a 1 GB program
    # constant).
    q16 = jax.device_put(rng.integers(0, R, size=(n,), dtype=np.int32))
    t16 = jax.device_put(table16)
    dt = bench(lambda t, qq: jnp.take(t, qq, axis=0), t16, q16)
    del t16
    print(
        f"xla 16B-row gather : {dt*1e3:7.1f} ms  {dt/n*1e9:6.2f} ns/row  "
        f"{n/dt/1e6:6.1f} M rows/s"
    )
    qw = jax.device_put(rng.integers(0, Rw, size=(n,), dtype=np.int32))
    dt = bench(lambda t, qq: jnp.take(t, qq, axis=0), table, qw)
    print(
        f"xla 512B-row gather: {dt*1e3:7.1f} ms  {dt/n*1e9:6.2f} ns/row  "
        f"{n/dt/1e6:6.1f} M rows/s"
    )

    qa = jax.device_put(np.asarray(qw).reshape(n_chunks, 8, args.q // 8))
    for S in (int(s) for s in args.depths.split(",")):
        try:
            f = make_probe(args.q, S, n_chunks)
            dt = bench(f, qa, table)
        except Exception as e:
            print(f"pallas S={S:4d} : FAILED {type(e).__name__}: {str(e)[:90]}")
            continue
        print(
            f"pallas S={S:4d}     : {dt*1e3:7.1f} ms  {dt/n*1e9:6.2f} ns/row  "
            f"{n/dt/1e6:6.1f} M rows/s"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

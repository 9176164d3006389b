"""Device (JAX) k-mer window ops: packing, canonicalization, minimizers.

Bit-exact JAX counterparts of krakenuniq_tpu.utils.bits (which cites the
reference semantics); differential-tested against them in
tests/test_kmer_ops.py.

All ops are vectorized over whole read batches: a (B, LB) base-code array
yields all (B, LB-k+1) k-mers at once -- the TPU-native replacement for the
reference's per-base rolling KmerScanner loop (krakenutil.cpp:239-278).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.bits import INDEX2_XOR_MASK

_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_M8 = np.uint64(0x00FF00FF00FF00FF)
_M16 = np.uint64(0x0000FFFF0000FFFF)


def reverse_complement(kmer: jax.Array, n: int) -> jax.Array:
    """2-bit reverse complement (semantics of krakendb.cpp:218-225)."""
    kmer = kmer.astype(jnp.uint64)
    kmer = ((kmer >> np.uint64(2)) & _M2) | ((kmer & _M2) << np.uint64(2))
    kmer = ((kmer >> np.uint64(4)) & _M4) | ((kmer & _M4) << np.uint64(4))
    kmer = ((kmer >> np.uint64(8)) & _M8) | ((kmer & _M8) << np.uint64(8))
    kmer = ((kmer >> np.uint64(16)) & _M16) | ((kmer & _M16) << np.uint64(16))
    kmer = (kmer >> np.uint64(32)) | (kmer << np.uint64(32))
    return (~kmer) >> np.uint64(64 - (n << 1))


def canonical_representation(kmer: jax.Array, n: int) -> jax.Array:
    return jnp.minimum(kmer, reverse_complement(kmer, n))


def pack_windows(codes: jax.Array, n: int) -> jax.Array:
    """Pack every length-n window of 2-bit codes into uint64.

    codes: (..., L) uint8 in 0..3  ->  (..., L-n+1) uint64, first base in the
    highest bits (matching the shift-in order of krakenutil.cpp:249-274).
    """
    length = codes.shape[-1]
    w = length - n + 1
    if w <= 0:
        raise ValueError(f"window {n} longer than axis {length}")
    c64 = codes.astype(jnp.uint64)
    out = jnp.zeros(codes.shape[:-1] + (w,), dtype=jnp.uint64)
    for t in range(n):
        out = out | (c64[..., t : t + w] << np.uint64(2 * (n - 1 - t)))
    return out


def window_any(flags: jax.Array, n: int) -> jax.Array:
    """Per-window OR over length-n windows: (..., L) bool -> (..., L-n+1) bool.

    Used for the k-bit ambiguity shift-register semantics (a k-mer is
    ambiguous iff any base in its window is non-ACGT, krakenutil.cpp:271-275).
    """
    x = flags
    covered = 1
    # dilated OR cascade: after each step, x[i] = any(flags[i : i+covered])
    while covered < n:
        step = min(covered, n - covered)
        x = x[..., : x.shape[-1] - step] | x[..., step:]
        covered += step
    return x


def window_min(vals: jax.Array, n: int) -> jax.Array:
    """Sliding minimum over length-n windows: (..., L) -> (..., L-n+1)."""
    x = vals
    covered = 1
    while covered < n:
        step = min(covered, n - covered)
        x = jnp.minimum(x[..., : x.shape[-1] - step], x[..., step:])
        covered += step
    return x


def minimizers(codes: jax.Array, k: int, nt: int) -> jax.Array:
    """Scrambled minimizer (bin key) for every k-mer window of a read batch.

    Equivalent to bin_key(canonical_kmer) of krakendb.cpp:200-215: since the
    set of canonical m-mers of a window is direction-invariant, the bin key
    equals the sliding min over per-position (xor_mask ^ canonical m-mer)
    values -- computed once per base instead of once per (k-mer, m-mer) pair.
    """
    mask = (np.uint64(1) << np.uint64(2 * nt)) - np.uint64(1)
    xm = INDEX2_XOR_MASK & mask
    mmers = pack_windows(codes, nt)  # (..., L-nt+1)
    scrambled = xm ^ canonical_representation(mmers, nt)
    return window_min(scrambled, k - nt + 1)  # (..., L-k+1)


@functools.partial(jax.jit, static_argnames=("k", "nt"))
def kmer_pipeline(codes: jax.Array, ambig: jax.Array, k: int, nt: int):
    """codes/ambig (B, LB) -> (canonical k-mers, bin keys, ambig flags), each (B, LB-k+1)."""
    kmers = pack_windows(codes, k)
    canon = canonical_representation(kmers, k)
    bins = minimizers(codes, k, nt)
    kmer_ambig = window_any(ambig, k)
    return canon, bins, kmer_ambig

"""Device hash tables for the k-mer lookup: the ONE-GATHER displaced-bucket
layout (default) and the two-choice fused layout (fallback / raw values).

Motivation (measured on TPU v5e, BENCHNOTES.md): XLA's random row-gather
from a small-minor u32 operand is the only fast random-access form, costing
~6.7-15.5 ns per ROW regardless of index locality; the probe is therefore
priced in gathered rows, not bytes. The round-3 two-choice fused layout
gathered TWO 16B rows per query; the default layout now gathers ONE 16B row
from the main table plus one 16B row from a ~16x smaller displacement
table (a cheaper gather class):

CHD (compressed hash-and-displace) layout -- the default for value tables:

  disp: uint32 [2^(lg-2), 4]   one u32 displacement word per bucket,
                               packed 4 per row; bucket g holds
                               (d1 << 16) | d0
  rows: uint32 [2^lr, 4]       2 slots of 8B each: slot = (r << lr) | v
                               stored as [hi32, lo32]

Addressing: split the murmur hash h into p = top lr bits and remainder
r = low 64-lr bits. The bucket g = mix1(r) (top lg bits of r * GOLDEN) and
q = mix2(r) (top lr bits of r * C2) depend on r ONLY; the row is
  row = (p + d0 + d1*q) mod 2^lr
with (d0, d1) the bucket's stored 16+16-bit displacement, found at build
time (largest-bucket-first greedy, native/kuniq_native.cpp chd_place).

EXACTNESS: a slot stores the full remainder r next to the value, and the
row index pins p: a match implies r_stored == r_query, hence the same
bucket g, the same (d0, d1, q), and therefore p_stored = row - d0 - d1*q =
p_query (mod 2^lr, both in range) -- all 64 hash bits are pinned, and
murmur's finalizer is a bijection, so the k-mer itself is pinned. Empty
slots are all-zero: they can only "match" a query with r == 0 and then
yield value 0 = miss, the same convention the downstream step already
uses. The slot packs r (64-lr bits) + value (up to lr bits) into exactly
8 bytes at ANY lr, so lr is set by capacity and value width alone
(`chd_min_lr`); at the reference scale (1.1e8 keys) the table runs at
~0.83 load -- 2^26 rows x 16B = 1.07 GB + 67 MB disp, HALF the round-3
fused table's HBM, which also halves upload time and the out-of-core
stream.

The two-choice FUSED layout is kept as the build fallback (and for
force-width stacking edge cases): one u32 [n_buckets, 4] plane of
[tag0, val0, tag1, val1] rows probed at both candidate buckets:

Keys are addressed by h = murmur3_finalizer(key) (a BIJECTION on uint64, so
storing/comparing mixed hashes loses nothing; the HLL path computes the same
h anyway). In the fused layout every key has two candidate buckets
    b1 = h >> (64 - lb)        b2 = (h * GOLDEN) >> (64 - lb)
Let hc be the probe value of the choice that placed the key (h for its
first-choice bucket, h * GOLDEN for its second; both maps are bijections --
GOLDEN is odd). The stored row encodes ALL 64 bits of hc plus which choice
it was:

  tag  = bits [lb, lb+32) of hc                       (32 bits)
  val  = choice << 31 | spare << V | dense_taxon      (V = lb - 1)
         where spare = the low 64 - lb - 32 = 32 - lb bits of hc

A probe of bucket r1 compares (tag, choice=0, spare of h); of r2 compares
(tag, choice=1, spare of h * GOLDEN). An accept therefore implies the full
64-bit hc -- and hence h itself -- matches: the lookup is EXACT, not
probabilistic. (Without the choice bit a first-choice resident could collide
with a second-choice probe at ~2^-64 per pair, which integrates to real
false positives over a pod-scale corpus of 10^10 queries x 10^10 keys.)

False negatives cannot occur either: every gathered slot is fully compared
(no screen/confirm split to shadow behind), empty slots read as all-zero
rows that only match a query whose h has bits [lb, 64) == 0 AND return
taxon 0 = miss, and the one key pattern that could be shadowed by such an
empty row (bits [lb, 64) of h all zero, at most one distinct key per bucket)
is pinned to its first-choice bucket, where `_host_planes` packs occupants
ahead of empties. `build_hash_table` still self-validates every key after
placement (one fixed-shape chunked probe; guards build bugs) and rebuilds
at a larger size on any mismatch.

The taxon field must fit V = lb - 1 bits, so lb >= bit_length(max_value)+1;
`build_hash_table` grows lb to satisfy it (a 2.6M-node NCBI taxonomy needs
lb >= 23; any DB big enough to carry it sizes past that anyway). UID
databases store raw 32-bit set ids with no spare bits to give -- they keep
the two-level (ptags, confirm) layout:

  ptags:   uint32 [n_buckets, 2]      partial tag per slot (screen)
  confirm: uint32 [n_buckets * 2, 2]  (hash_lo, value) per slot

with 2^-(64+lb)-probability false accepts (tag+bucket of hc plus the low
32 bits of h) -- see `_probe_rows` in lookup/hash_lookup.py.

Layout findings that fix this design (all measured on v5e, classify-step
context): [N, small] u32 resident planes are stored DENSE by XLA:TPU
(layout {0,1:T(2,128)}) and row-gathers from them take the fast path; flat
u32 element-gathers and emulated-u64 word-gathers run ~8.5 ns/element;
(1,128) full-row gathers ~230 ns/row. What must NOT exist is an [N, small]
u32 value produced by on-device scatter/reshape: those materialize in an
(8,128)-tiled buffer whose lane-padded minor dimension blows up 64x
(observed: a 512MB plane allocating 32GB at 48M keys). The ENTIRE build --
placement, plane construction, and the self-check probe (a numpy mirror of
the device probe) -- therefore runs on HOST as vectorized numpy passes
(batch cuckoo insertion; ~1s per 50M keys) and the planes enter the device
via device_put only once validated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.bits import murmur3_finalizer

BUCKET_SLOTS = 2
GOLDEN = np.uint64(0x9E3779B97F4A7C15)
C2 = np.uint64(0xC2B2AE3D27D4EB4F)  # q-mix multiplier (odd => bijective)
CHD_MAX_LOAD = 0.85  # keys / (2 * 2^lr); power-of-two snap => load > 0.42
_SELF_CHECK_CHUNK = 1 << 21  # fixed probe shape: one compile per process


def chd_min_lr(n_keys: int, max_value: int, load_factor: float = CHD_MAX_LOAD) -> int:
    """Smallest row-bits lr for the CHD layout: capacity (2 slots/row at
    <= load_factor) and value width (value fits lr bits) both bind; the
    remainder always fits the other 64-lr slot bits, so there is no lower
    bound from exactness."""
    lr = max(4, int(np.ceil(np.log2(max(n_keys, 2) / (2 * load_factor)))))
    return max(lr, int(max_value).bit_length())


def chd_table_bytes(lr: int) -> int:
    """HBM bytes of a CHD table at row-bits lr (rows plane + disp plane)."""
    return (1 << lr) * 16 + (1 << max(2, lr - 2)) * 4


def _chd_split(hashes, lr: int, lg: int):
    """Per-key addressing fields (shared by build, self-check, and the
    device probe's host mirror)."""
    r_mask = np.uint64((1 << (64 - lr)) - 1)
    p = (hashes >> np.uint64(64 - lr)).astype(np.uint32)
    r = hashes & r_mask
    g = ((r * GOLDEN) >> np.uint64(64 - lg)).astype(np.int64)
    q = ((r * C2) >> np.uint64(64 - lr)).astype(np.uint32)
    return p, r, g, q


def _chd_place_numpy(hashes, lr: int, lg: int, seed: int = 0, max_attempts: int = 65536):
    """Vectorized fallback placement when the native extension is absent:
    largest-first tiers, per-round candidate windows screened against a
    packed free-slot bitmap, priority claims (lowest bucket rank wins a
    contested row; contention losers retry the same window). ~5-8x slower
    than the sequential first-success search in native chd_place."""
    n = len(hashes)
    nrows = 1 << lr
    p, _r, g, q = _chd_split(hashes, lr, lg)
    order = np.argsort(g, kind="stable")
    ug, bstart, bcount = np.unique(g[order], return_index=True, return_counts=True)
    occ = np.zeros(nrows, np.uint8)
    free_bits = np.full(max(1, nrows >> 3), 0xFF, np.uint8)
    disp = np.zeros(1 << lg, np.uint32)
    row_of = np.full(n, -1, np.int32)
    col_of = np.zeros(n, np.int8)
    rowmask = np.uint32(nrows - 1)
    claim = np.full(nrows, 2**31 - 1, np.int32)
    for size in np.sort(np.unique(bcount))[::-1]:
        sel = bcount == size
        tb_g = ug[sel]
        kidx = order[bstart[sel][:, None] + np.arange(size)[None, :]]
        pp = p[kidx].astype(np.uint32)
        qq = q[kidx].astype(np.uint32)
        act = np.arange(len(tb_g))
        attempt = np.zeros(len(tb_g), np.int64)
        A = 2
        while len(act):
            na = len(act)
            t = attempt[act].astype(np.uint64)
            gb = tb_g[act].astype(np.uint64)
            dmix = murmur3_finalizer(
                (gb[:, None] << np.uint64(24))
                + (t[:, None] + np.arange(A, dtype=np.uint64)[None, :])
                + np.uint64(seed) * np.uint64(0x9E3779B9)
            )
            d0 = (dmix & np.uint64(0xFFFF)).astype(np.uint32)
            d1 = ((dmix >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.uint32)
            rows = (
                pp[act][:, None, :]
                + d0[:, :, None]
                + d1[:, :, None] * qq[act][:, None, :]
            ) & rowmask
            rowsl = rows.astype(np.int32)
            fb = (free_bits[rowsl >> 3] >> (rowsl & 7).astype(np.uint8)) & 1
            cand_ok = fb.all(axis=2) if size > 1 else fb[..., 0].astype(bool)
            has = cand_ok.any(axis=1)
            choice = np.argmax(cand_ok, axis=1)
            ch_rows = np.take_along_axis(rowsl, choice[:, None, None], axis=1)[:, 0, :]
            ch_d0 = np.take_along_axis(d0, choice[:, None], axis=1)[:, 0]
            ch_d1 = np.take_along_axis(d1, choice[:, None], axis=1)[:, 0]
            if size >= 2:
                # exact within-candidate demand on the chosen rows only
                rs = np.sort(ch_rows, axis=1)
                eq = rs[:, 1:] == rs[:, :-1]
                bad = ((occ[rs[:, 1:]] + 2 > 2) & eq).any(axis=1)
                if size >= 3:
                    bad |= (eq[:, 1:] & eq[:, :-1]).any(axis=1)
                bad &= has
                if bad.any():
                    attempt[act[bad]] += choice[bad] + 1
                    has = has & ~bad
            pri = np.arange(na, dtype=np.int32)
            fr = ch_rows[has]
            np.minimum.at(claim, fr.ravel(), np.repeat(pri[has], size))
            okb = np.zeros(na, bool)
            okb[has] = (claim[fr] == pri[has, None]).all(axis=1)
            claim[fr.ravel()] = 2**31 - 1
            w_idx = act[okb]
            if len(w_idx):
                # columns assigned GLOBALLY per round: different buckets may
                # jointly win slots of one row
                wrows = ch_rows[okb].ravel()
                wkeys = kidx[w_idx].ravel()
                o = np.argsort(wrows, kind="stable")
                sr = wrows[o]
                first = np.ones(len(sr), bool)
                first[1:] = sr[1:] != sr[:-1]
                start = np.maximum.accumulate(np.where(first, np.arange(len(sr)), -1))
                rank = (np.arange(len(sr)) - start).astype(np.int8)
                cols = np.empty(len(sr), np.int8)
                cols[o] = occ[sr].astype(np.int8) + rank
                np.add.at(occ, wrows, 1)
                nowfull = wrows[occ[wrows] >= 2]
                np.bitwise_and.at(
                    free_bits,
                    nowfull >> 3,
                    (~(np.uint8(1) << (nowfull & 7).astype(np.uint8))).astype(np.uint8),
                )
                row_of[wkeys] = wrows
                col_of[wkeys] = cols
                disp[tb_g[w_idx]] = (ch_d1[okb] << np.uint32(16)) | ch_d0[okb]
            bump = ~okb & ~has
            attempt[act[bump]] += A
            act = act[~okb]
            if len(act) and int(attempt[act].max()) >= max_attempts:
                return None
            p_obs = max(okb.mean(), 1e-3)
            A = int(min(32, max(2, np.ceil(1.0 / p_obs))))
    return row_of, col_of, disp


def _chd_place(hashes, lr: int, lg: int, seed: int = 0, max_attempts: int = 65536):
    """Returns (row_of int32[n], col_of int8[n], disp uint32[2^lg]) or None.
    Native sequential search when available (4-5M keys/s at 0.83 load),
    numpy fallback otherwise."""
    try:
        from .._native_build import ensure_native

        mod = ensure_native()
    except Exception:
        mod = None
    if mod is not None and hasattr(mod, "chd_place"):
        out = mod.chd_place(
            np.ascontiguousarray(hashes, np.uint64), lr, lg, seed, max_attempts
        )
        return out
    return _chd_place_numpy(hashes, lr, lg, seed, max_attempts)


def _host_planes_chd(row_of, col_of, hashes, values, lr: int, disp):
    """Host numpy construction of the CHD planes (module docstring):
    (disp4 uint32 [2^(lg-2), 4], rows uint32 [2^lr, 4])."""
    nrows = 1 << lr
    r = hashes & np.uint64((1 << (64 - lr)) - 1)
    s = (r << np.uint64(lr)) | values.astype(np.uint64)
    rows = np.zeros((nrows, 4), np.uint32)
    flat = row_of.astype(np.int64)
    c2 = col_of.astype(np.int64) * 2
    rows[flat, c2] = (s >> np.uint64(32)).astype(np.uint32)
    rows[flat, c2 + 1] = (s & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return disp.reshape(-1, 4), rows


def bucket_ids(h, lb: int):
    """Host/device-agnostic candidate bucket ids."""
    shift = np.uint64(64 - lb)
    return (h >> shift).astype(np.int64), ((h * GOLDEN) >> shift).astype(np.int64)


def partial_tags(h, lb: int):
    """Bits [lb, lb+32) of the probe value: the tag for a bucket derived
    from h's top lb bits."""
    return ((h << np.uint64(lb)) >> np.uint64(32)).astype(jnp.uint32)


class HashBuildError(RuntimeError):
    """Cuckoo placement (or the exactness self-check) failed at every
    attempted table size. Callers fall back: `build_device_db` keeps the
    bsearch planes, `shard_hash_tables` rebuilds the whole stack larger."""


def _host_place(hashes: np.ndarray, lb: int, max_rounds: int = 400, seed: int = 0):
    """Two-choice cuckoo placement with eviction, vectorized over the whole
    unplaced ("active") set per round.

    Each round, every active key picks a wanted slot in its target bucket
    (first empty slot, else a coin-chosen victim), claims it with a
    minimum-index scatter (np.minimum.at), and winners displace any victim
    into the active set with the OTHER of its two buckets as the new target.
    The active set shrinks geometrically; keys whose first-choice tag is 0
    are pinned to bucket b1 (a superset of the empty-row shadow pattern the
    fused layout needs pinned -- see module docstring).

    Returns int32 assigned-bucket-per-key, or None if placement failed
    (caller grows the table)."""
    n = len(hashes)
    nb = 1 << lb
    shift = np.uint64(64 - lb)
    b1 = (hashes >> shift).astype(np.int64)
    b2 = ((hashes * GOLDEN) >> shift).astype(np.int64)
    pinned = ((hashes << np.uint64(lb)) >> np.uint64(32)).astype(np.uint32) == 0
    b2 = np.where(pinned, b1, b2)
    # slot indices fit int32 through lb=29 (2*nb <= 2^30): half the memory
    # traffic of the per-round gathers/wheres at 10^8-key scale
    idx_t = np.int64 if (lb >= 30 or n >= (1 << 31) - 2) else np.int32
    b1 = b1.astype(idx_t, copy=False)
    b2 = b2.astype(idx_t, copy=False)

    slots = np.full(nb * BUCKET_SLOTS, -1, dtype=np.int32)  # occupant key index
    active = np.arange(n, dtype=np.int32)
    target = b1.copy()  # bucket each active key tries this round
    claim = np.full(nb * BUCKET_SLOTS, n, dtype=np.int32)  # reset per round below
    for rnd in range(max_rounds):
        if rnd == 0:
            # every slot is empty: want = first slot of the first choice
            t = b1
            want = t * 2
        else:
            t = target[active]
            s0 = slots[t * 2]
            s1 = slots[t * 2 + 1]
            want = np.where(s0 < 0, t * 2, t * 2 + 1)
            # the eviction coin (a u64 shift over the hashes) is only needed
            # where BOTH slots are full -- a small subset after round 1
            both = (s0 >= 0) & (s1 >= 0)
            if both.any():
                sub = np.flatnonzero(both)
                coin = (
                    (hashes[active[sub]] >> np.uint64((rnd + seed) % 61))
                    & np.uint64(1)
                ).astype(idx_t)
                want[sub] = t[sub] * 2 + coin
        # claim-verify: lowest key index wins a contested slot
        np.minimum.at(claim, want, active)
        win = claim[want] == active
        claim[want] = n  # restore only the touched entries for the next round
        won_slots = want[win]
        victims = slots[won_slots]
        slots[won_slots] = active[win]
        evicted = victims[victims >= 0]
        if len(evicted):
            # a victim's next target is its OTHER bucket (random-walk cuckoo)
            from_bucket = won_slots[victims >= 0] // 2
            other = np.where(b1[evicted] == from_bucket, b2[evicted], b1[evicted])
            target[evicted] = other
        active = np.concatenate([active[~win], evicted])
        if len(active) == 0:
            assign = np.empty(n, dtype=np.int32)
            occ = slots >= 0
            assign[slots[occ]] = (np.nonzero(occ)[0] // 2).astype(np.int32)
            return assign
        # losers retry the same bucket next round with a fresh coin; if both
        # of a key's buckets stay full, eviction chains open space over a few
        # rounds -- stagnation past max_rounds means the load is too high
    return None


def _slot_layout(assign, hashes, lb: int):
    """Shared by both plane builders: per-key flat slot index (occupants
    packed ahead of empty slots within each bucket), sorted-order views, and
    the probe value hc of the choice that placed each key."""
    order = np.argsort(assign, kind="stable")
    sa = assign[order]
    # rank within each equal-assign group
    first = np.concatenate([[True], sa[1:] != sa[:-1]])
    start = np.maximum.accumulate(np.where(first, np.arange(len(sa)), -1))
    rank = np.arange(len(sa)) - start
    rows = sa.astype(np.int64)
    cols = np.minimum(rank, BUCKET_SLOTS - 1).astype(np.int64)
    flat_idx = rows * BUCKET_SLOTS + cols

    h_s = hashes[order]
    b1_s = (h_s >> np.uint64(64 - lb)).astype(np.int64)
    second = rows != b1_s
    hc = np.where(second, h_s * GOLDEN, h_s)
    return flat_idx, h_s, hc, second, order


def _host_planes_fused(assign, hashes, values, lb: int):
    """Host numpy construction of the fused plane (see module docstring)."""
    nb = 1 << lb
    v_bits = lb - 1
    flat_idx, _h_s, hc, second, order = _slot_layout(assign, hashes, lb)
    v_s = values[order].astype(np.uint32)
    if len(v_s) and int(v_s.max()) >> v_bits:
        raise ValueError(
            f"value {int(v_s.max())} does not fit the {v_bits}-bit taxon field"
        )
    tag_s = ((hc << np.uint64(lb)) >> np.uint64(32)).astype(np.uint32)
    spare = (hc & np.uint64((1 << (32 - lb)) - 1)).astype(np.uint32)
    word = (
        (second.astype(np.uint32) << np.uint32(31))
        | (spare << np.uint32(v_bits))
        | v_s
    )
    fused = np.zeros((nb * BUCKET_SLOTS, 2), np.uint32)
    fused[flat_idx, 0] = tag_s
    fused[flat_idx, 1] = word
    return fused.reshape(nb, BUCKET_SLOTS * 2)


def _host_planes_two(assign, hashes, values, lb: int):
    """Host numpy construction of the two-level (ptags, confirm) planes used
    by raw-valued (UID) tables."""
    nb = 1 << lb
    flat_idx, h_s, hc, _second, order = _slot_layout(assign, hashes, lb)
    v_s = values[order]
    ptag_s = ((hc << np.uint64(lb)) >> np.uint64(32)).astype(np.uint32)

    ptags = np.zeros(nb * BUCKET_SLOTS, np.uint32)
    ptags[flat_idx] = ptag_s
    confirm = np.zeros((nb * BUCKET_SLOTS, 2), np.uint32)
    confirm[flat_idx, 0] = (h_s & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    confirm[flat_idx, 1] = v_s
    return ptags.reshape(nb, BUCKET_SLOTS), confirm


def _self_check(host_planes, hashes, values, lb: int) -> int:
    """Probe every key through a numpy mirror of the device probe; returns
    the number of mismatching keys. Runs entirely on HOST: the device planes
    are byte-identical device_put copies of these arrays, and a device probe
    here would pay a fresh remote compile (observed minutes under
    compile-service contention) for a check that numpy does in seconds."""
    n = len(hashes)
    n_bad = 0
    shift = np.uint64(64 - lb)
    for s in range(0, n, _SELF_CHECK_CHUNK):
        h = hashes[s : s + _SELF_CHECK_CHUNK]
        want = values[s : s + _SELF_CHECK_CHUNK]
        if len(host_planes) == 2 and host_planes[0].shape[1] == 4:
            # CHD layout: (disp4, rows); lb is the row-bits lr
            disp4, rows_plane = host_planes
            lr = lb
            lg = int(np.log2(disp4.shape[0] * 4))
            p, r, g, q = _chd_split(h, lr, lg)
            d = disp4.reshape(-1)[g]
            d0 = d & np.uint32(0xFFFF)
            d1 = d >> np.uint32(16)
            row = (p + d0 + d1 * q) & np.uint32((1 << lr) - 1)
            rw = rows_plane[row.astype(np.int64)]
            v_mask = np.uint32((1 << lr) - 1)
            e_hi = (r >> np.uint64(32 - lr)).astype(np.uint32)
            e_lo = (
                (r & np.uint64((1 << (32 - lr)) - 1)) << np.uint64(lr)
            ).astype(np.uint32)
            m0 = (rw[:, 0] == e_hi) & ((rw[:, 1] & ~v_mask) == e_lo)
            m1 = (rw[:, 2] == e_hi) & ((rw[:, 3] & ~v_mask) == e_lo)
            got = np.maximum(
                np.where(m0, rw[:, 1] & v_mask, 0),
                np.where(m1, rw[:, 3] & v_mask, 0),
            )
        elif len(host_planes) == 1:
            fused = host_planes[0]
            v_bits = lb - 1
            tax_mask = np.uint32((1 << v_bits) - 1)
            hi_mask = ~tax_mask
            spare_mask = np.uint64((1 << (32 - lb)) - 1)
            got = np.zeros(len(h), np.uint32)
            found = np.zeros(len(h), bool)
            for hc, choice in ((h, 0), (h * GOLDEN, 1)):
                r = (hc >> shift).astype(np.int64)
                tag = ((hc << np.uint64(lb)) >> np.uint64(32)).astype(np.uint32)
                hi = (hc & spare_mask).astype(np.uint32) << np.uint32(v_bits)
                if choice:
                    hi |= np.uint32(1 << 31)
                rows = fused[r]  # [n, 4]
                for slot in (0, 1):
                    m = (rows[:, 2 * slot] == tag) & (
                        (rows[:, 2 * slot + 1] & hi_mask) == hi
                    )
                    got = np.where(m & ~found, rows[:, 2 * slot + 1] & tax_mask, got)
                    found |= m
        else:
            ptags, confirm = host_planes
            hg = h * GOLDEN
            r1 = (h >> shift).astype(np.int64)
            r2 = (hg >> shift).astype(np.int64)
            p1 = ((h << np.uint64(lb)) >> np.uint64(32)).astype(np.uint32)
            p2 = ((hg << np.uint64(lb)) >> np.uint64(32)).astype(np.uint32)
            t1 = ptags[r1]
            t2 = ptags[r2]
            eq1 = t1 == p1[:, None]
            eq2 = (t2 == p2[:, None]) & (r1 != r2)[:, None]
            has1 = eq1.any(axis=1)
            has2 = eq2.any(axis=1)
            c1 = np.argmax(eq1, axis=1)
            c2 = np.argmax(eq2, axis=1)
            flat = np.where(has1, r1 * BUCKET_SLOTS + c1, r2 * BUCKET_SLOTS + c2)
            crow = confirm[flat]
            ok = (has1 | has2) & (
                crow[:, 0] == (h & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            )
            got = np.where(ok, crow[:, 1], np.uint32(0))
        n_bad += int(np.count_nonzero(got != want))
    return n_bad


def min_lb_for(n_keys: int, max_value: int, load_factor: float = 0.6) -> int:
    """Smallest bucket-bits satisfying both the load factor and the fused
    layout's taxon-field width (max_value < 2^(lb-1))."""
    lb = max(4, int(np.ceil(np.log2(max(n_keys, 2) / (BUCKET_SLOTS * load_factor)))))
    return max(lb, int(max_value).bit_length() + 1)


def build_hash_table(
    keys: np.ndarray,
    vals: np.ndarray,
    vals_dense: np.ndarray,
    load_factor: float = 0.6,
    force_lb: int | None = None,
    store_raw: bool = False,
    self_check: bool = True,
    keep_host: bool = False,
    to_device: bool = True,
    layout: str = "auto",
):
    """Returns (planes, lb): DEVICE plane tuple plus the width bits; see
    module docstring for the three layouts:
      * CHD (default for value tables): `(disp4, rows)`, lb = row-bits lr
      * fused two-choice (fallback):    `(fused,)`, lb = bucket bits
      * two-level (store_raw / UID):    `(ptags, confirm)`, lb = bucket bits
    keep_host=True appends the host numpy planes as a third element (for
    cache writers -- re-downloading them from the device would cost a bulk
    transfer).

    The stored per-key value is the DENSE taxon id (the classify step maps
    it back through taxid_table) or the pool id; `store_raw` stores the raw
    32-bit DB value instead (UID databases, whose values are set ids, not
    taxids) -- raw values need all 32 bits, which only the two-level layout
    can hold.

    `layout`: "auto" tries CHD and falls back to fused on persistent
    placement failure; "chd" / "fused" pin the layout (uniform chunk/shard
    stacks must agree on one probe program). CHD runs to ~0.85 load
    (chd_min_lr); fused cuckoo placement to `load_factor`. If placement
    stalls it is retried with fresh seeds, then the table is grown until
    width 30 (the row-index int32 bound; a larger table would exceed HBM
    anyway). force_lb pins the width (uniformly-sized shard stacks); with
    force_lb only the seed retries apply. All failure paths raise
    HashBuildError so callers can fall back (bsearch planes / a larger
    uniform stack) instead of dying. self_check=False skips the probe
    validation (callers that keep planes on host, e.g. cache writers, avoid
    the HBM round trip)."""
    n = len(keys)
    hashes = murmur3_finalizer(np.ascontiguousarray(keys, dtype=np.uint64))
    values = np.asarray(vals if store_raw else vals_dense).astype(np.uint32)
    vmax = int(values.max()) if n else 0
    if not store_raw and layout in ("auto", "chd"):
        lr = force_lb if force_lb is not None else chd_min_lr(n, vmax)
        if force_lb is not None and vmax >> lr:
            raise ValueError(
                f"force_lb={lr} cannot hold value {vmax} in {lr} bits (CHD)"
            )
        lr_max = lr if force_lb is not None else 30
        while lr <= min(lr_max, 30):
            for seed in range(3):
                out = _chd_place(hashes, lr, max(2, lr - 2), seed=seed)
                if out is None:
                    continue
                row_of, col_of, disp = out
                host = _host_planes_chd(row_of, col_of, hashes, values, lr, disp)
                if (not self_check or n == 0) or _self_check(
                    host, hashes, values, lr
                ) == 0:
                    planes = (
                        tuple(jax.device_put(p) for p in host) if to_device else None
                    )
                    return (planes, lr, host) if keep_host else (planes, lr)
            lr += 1
        if layout == "chd":
            raise HashBuildError(
                f"CHD placement failed for {n} keys up to 2^{min(lr_max, 30)} rows"
                + (f" (force_lb={force_lb})" if force_lb is not None else "")
            )
        # layout == "auto": fall through to the fused two-choice build
    if force_lb is not None:
        lb = force_lb
        if not store_raw and vmax >> (lb - 1):
            raise ValueError(
                f"force_lb={lb} cannot hold value {vmax} in {lb - 1} bits"
            )
        lb_max = lb
    else:
        lb = (
            max(4, int(np.ceil(np.log2(max(n, 2) / (BUCKET_SLOTS * load_factor)))))
            if store_raw
            else min_lb_for(n, vmax, load_factor)
        )
        lb_max = 30
    if lb > 30:
        raise HashBuildError(
            f"hash table of 2^{lb} buckets is not supported ({n} keys)"
        )
    while lb <= lb_max:
        for seed in range(3):  # fresh eviction-coin walks before growing
            assign = _host_place(hashes, lb, seed=seed * 17)
            if assign is None:
                continue
            if store_raw:
                host = _host_planes_two(assign, hashes, values, lb)
            else:
                host = (_host_planes_fused(assign, hashes, values, lb),)
            if (not self_check or n == 0) or _self_check(host, hashes, values, lb) == 0:
                planes = tuple(jax.device_put(p) for p in host) if to_device else None
                return (planes, lb, host) if keep_host else (planes, lb)
        lb += 1
    raise HashBuildError(
        f"hash table placement failed for {n} keys up to 2^{lb - 1} buckets"
        + (f" (force_lb={force_lb})" if force_lb is not None else "")
    )

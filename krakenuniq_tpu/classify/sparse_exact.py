"""Sparse-regime tracking that makes --device-counters BIT-IDENTICAL.

The reference HLL (src/hyperloglogplus.cpp) keeps each per-taxon counter in
SPARSE mode (a set of 32-bit encodings at pPrime=25) until an insert would
push the set past m/4 entries, then converts to dense registers
(hyperloglogplus.cpp:496-498). The classifier builds a FRESH counter per
taxon per work unit and merges unit counters into the global map
(classify.cpp:525-543); merge keeps sparse∪sparse sparse with no size check
(hyperloglogplus.cpp:586-665).

Consequence (the whole design hangs on this): the final global state of a
taxon is order-independent given the unit partition --
  * it ends DENSE iff at least one unit-local counter went dense, and then
    its registers are the element-wise max over ALL encodings ever inserted
    -- exactly what the device register plane (device_counters.py) already
    accumulates;
  * it ends SPARSE iff every unit stayed sparse, and then its state is the
    UNION of the units' distinct-encoding sets (which may exceed m/4).
So bit-exact fast-mode counting needs, beyond the register plane, only
(a) a per-(unit, taxon) went-dense bit and (b) the distinct (taxon,
encoding) pairs of the units that stayed sparse.

A unit-local counter (fresh, so current size 0) goes dense iff
  d > m/4,  or  d == m/4 and the unit's LAST insert for the taxon is a
  duplicate (the vectorized one-at-a-time semantics of
  hll.HLL.insert_encodings, itself bit-verified against the reference).
"Last insert is a duplicate" == the encoding of the taxon's maximum stream
position occurs more than once in the unit.

Device computation (sparse_stats_core): one sort of the lanes by
(unit, taxon, encoding) key with the stream position co-sorted, segmented
scans for per-pair and per-group statistics (no scatters, no computed-index
gathers -- both are slow on XLA:TPU, see lookup/hash_lookup.py), then a
second sort compacts the distinct pairs of stayed-sparse groups and the
went-dense taxon events into one fixed-size buffer the host fetches
(only the used prefix transfers -- bytes scale with the workload's
low-abundance tail, not the cap or the lane count; vs the ~6B/lane
exact-compat feed it replaces).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_PAD_INT = 0xFFFFFFFFFFFFFFFF
_EVENT_TAG_INT = 1 << 63
TAXON_BITS = 25  # dense ids must fit (NCBI is ~2.4M nodes; guard in pipeline)
UNIT_BITS = 6  # spans are capped at 64 work units (pipeline._iter_native_spans)
MAX_UNITS = 1 << UNIT_BITS


def _seg_cumsum(reset, vals):
    """Segmented inclusive cumsum (vals >= 0, total < 2^31): cumsum minus
    the running value at the segment start. The start values are recovered
    with a plain cummax -- the global cumsum is nondecreasing, so the most
    recent reset holds the running max of `S - vals` over reset lanes.
    Native cumsum/cummax ops keep the XLA graph tiny (an associative_scan
    formulation of these scans cost ~4 minutes of remote compile time at
    B=8192), and i32 lanes halve the HBM traffic of each pass."""
    v = vals.astype(jnp.int32)
    s = jnp.cumsum(v)
    start = jax.lax.cummax(jnp.where(reset, s - v, jnp.int32(-1)))
    return s - start


def _seg_cummax(reset, vals, val_bits, dtype=jnp.int64):
    """Segmented inclusive cummax (vals >= -1, vals + 1 < 2^val_bits):
    pack (segment_id, val) into one monotone-by-segment key and take a
    plain cummax. Callers pick i32 packing whenever segment-count bits +
    val_bits fit 31 (the scan pass then moves half the bytes)."""
    seg = jnp.cumsum(reset.astype(jnp.int32)).astype(dtype)
    packed = (seg << dtype(val_bits)) | (vals.astype(dtype) + dtype(1))
    m = jax.lax.cummax(packed)
    return (m & dtype((1 << val_bits) - 1)) - dtype(1)


def sparse_stats_core(
    taxa_dense: jax.Array,  # int32 [B, W] (0 = miss, counted like any taxon)
    enc: jax.Array,  # uint32 [B, W] HLL encodings
    hll_lanes: jax.Array,  # bool [B, W] counted lanes
    unit_id: jax.Array,  # uint8/int32 [B]: work-unit index per row, < 64
    p: int,
    cap: int,
):
    """Returns (buf u64 [cap], n_pairs i32, n_events i32).

    buf[:n_pairs] holds pair keys unit<<57|taxon<<32|enc (distinct pairs of
    groups that stayed sparse), buf[n_pairs:n_pairs+n_events] holds event
    keys 1<<63|unit<<25|taxon (groups that went dense). If
    n_pairs + n_events > cap the buffer is truncated and the caller must
    fall back to host stats for the whole span."""
    th = (1 << p) // 4
    b, w = taxa_dense.shape
    n = b * w
    # i32 positions/packing headroom: 2GB of lanes would not fit HBM anyway
    assert n < (1 << 29), "span lane count exceeds i32 scan packing"
    _PAD = jnp.uint64(_PAD_INT)
    _EVENT_TAG = jnp.uint64(_EVENT_TAG_INT)
    unit = unit_id.astype(jnp.uint64)[:, None]
    key = (
        (unit << jnp.uint64(32 + TAXON_BITS))
        | (taxa_dense.astype(jnp.uint64) << jnp.uint64(32))
        | enc.astype(jnp.uint64)
    )
    keyf = jnp.where(hll_lanes, key, _PAD).reshape(-1)
    pos = jnp.arange(n, dtype=jnp.int32)
    ks, ps = jax.lax.sort((keyf, pos), num_keys=1)
    valid = ks != _PAD

    gk = ks >> jnp.uint64(32)  # (unit, taxon) group key
    one = jnp.ones((1,), bool)
    pb = jnp.concatenate([one, ks[1:] != ks[:-1]]) & valid  # pair first
    gb = jnp.concatenate([one, gk[1:] != gk[:-1]]) & valid  # group first
    pe = jnp.concatenate([ks[1:] != ks[:-1], one]) & valid  # pair last
    ge = jnp.concatenate([gk[1:] != gk[:-1], one]) & valid  # group last

    # packing headroom for the cummax trick: positions and counts are < n
    pos_bits = max(2, int(n - 1).bit_length() + 2)
    # per-pair stats come FREE from sort stability: within a pair (equal
    # keys) payloads keep stream order, so at a pair-end lane ps IS the
    # pair's max stream position, and pb there says the pair is a
    # singleton. (Round 3 spent two extra segmented scans on these.)
    # group max over pair-end values (maxpos << 1 | singleton): stream
    # positions are unique, so the max belongs to the pair holding the
    # group's LAST stream position; its low bit says that last insert was a
    # first occurrence
    v_pair = jnp.where(pe, (ps.astype(jnp.int64) << 1) | pb, jnp.int64(-1))
    edge_v = _seg_cummax(gb, v_pair, pos_bits + 1)
    # distinct-pair count within the group, inclusive; at ge it is d
    d_sofar = _seg_cumsum(gb, pb)

    stays_end = (d_sofar < th) | (
        (d_sofar == th) & ((edge_v & jnp.int64(1)) == 1)
    )
    # broadcast the group-end decision to every lane of the group: in
    # reversed order each group starts at its (original) end, which carries
    # the decision; a segmented max-scan spreads it. The i32 packing sits
    # at the EXACT int32 boundary (max packed = ((2^29-1)<<2)|2 = 2^31-2)
    # and is safe only under the n < 2^29 assert above -- derive the dtype
    # from n so relaxing that cap falls back to i64 instead of wrapping.
    stays_dtype = jnp.int32 if n < (1 << 29) else jnp.int64
    stays_rev = _seg_cummax(
        jnp.flip(ge), jnp.flip(ge & stays_end), 2, dtype=stays_dtype
    )
    stays_lane = jnp.flip(stays_rev) > 0

    emit_pair = pb & stays_lane
    emit_event = ge & ~stays_lane & valid
    taxon_of = (gk & jnp.uint64((1 << TAXON_BITS) - 1))
    unit_of = gk >> jnp.uint64(TAXON_BITS)
    event_key = _EVENT_TAG | (unit_of << jnp.uint64(TAXON_BITS)) | taxon_of
    out_key = jnp.where(emit_pair, ks, jnp.where(emit_event, event_key, _PAD))
    packed = jax.lax.sort(out_key)[:cap]
    return packed, jnp.sum(emit_pair).astype(jnp.int32), jnp.sum(emit_event).astype(jnp.int32)


def sparse_stats_host(
    taxa_dense: np.ndarray,  # int32 [rows, W] or flat per-lane (with lanes mask)
    enc: np.ndarray,
    hll_lanes: np.ndarray,
    unit_bounds: list,
    th: int,
):
    """Numpy mirror of the per-unit decision (the overflow/python-path
    form). Returns (pair_taxa i64, pair_encs u32, dense_taxa i64)."""
    p_taxa, p_encs, d_taxa = [], [], []
    for s, e in zip(unit_bounds[:-1], unit_bounds[1:]):
        lanes = hll_lanes[s:e]
        t = taxa_dense[s:e][lanes].astype(np.int64)
        v = enc[s:e][lanes]
        if len(t) == 0:
            continue
        order = np.argsort(t, kind="stable")  # stream order within taxon
        ts, vs = t[order], v[order]
        bounds = np.flatnonzero(np.diff(ts)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(ts)]])
        for s_, e_ in zip(starts.tolist(), ends.tolist()):
            encs = vs[s_:e_]
            uniq, first_idx = np.unique(encs, return_index=True)
            d, nn = len(uniq), e_ - s_
            if d > th or (d == th and int(first_idx.max()) < nn - 1):
                d_taxa.append(int(ts[s_]))
            else:
                p_taxa.append(np.full(d, ts[s_], np.int64))
                p_encs.append(uniq)
    return (
        np.concatenate(p_taxa) if p_taxa else np.empty(0, np.int64),
        np.concatenate(p_encs) if p_encs else np.empty(0, np.uint32),
        np.asarray(d_taxa, np.int64),
    )


class SparseTracker:
    """Host-side fold of the per-span sparse statistics.

    State: the set of dense ids that ever went dense, and the union of
    distinct (taxon, encoding) pairs of stayed-sparse groups as one sorted
    u64 array (taxon << 32 | enc). Spans APPEND their pair keys to a
    pending list; deduplication is amortized (compact when the appended
    volume doubles the known union) -- a per-span union1d would re-sort
    the whole union every span, O(spans * U log U) at scale (the same
    quadratic fold the exact-compat accumulator had, accumulate.py)."""

    def __init__(self):
        self.dense_ever: set[int] = set()
        self._union = np.empty(0, np.uint64)
        self._parts: list[np.ndarray] = []
        self._n_pending = 0
        self.overflows = 0

    def add(self, pair_taxa: np.ndarray, pair_encs: np.ndarray, dense_taxa) -> None:
        self.dense_ever.update(int(x) for x in np.unique(np.asarray(dense_taxa)))
        if len(pair_taxa):
            keys = (pair_taxa.astype(np.uint64) << np.uint64(32)) | pair_encs.astype(
                np.uint64
            )
            self._parts.append(keys)
            self._n_pending += len(keys)
            if self._n_pending > max(1 << 22, 2 * len(self._union)):
                self._compact()

    def _compact(self) -> None:
        if self._parts:
            self._union = np.unique(
                np.concatenate([self._union] + self._parts)
            )
            self._parts = []
            self._n_pending = 0

    def consume_buffer(self, buf: np.ndarray, n_pairs: int, n_events: int) -> bool:
        """Fold one device buffer; False = truncated (caller must fall back
        to host stats for the span)."""
        if n_pairs + n_events > len(buf):
            self.overflows += 1
            return False
        pairs = buf[:n_pairs]
        taxa = (
            (pairs >> np.uint64(32)) & np.uint64((1 << TAXON_BITS) - 1)
        ).astype(np.int64)
        encs = (pairs & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        events = buf[n_pairs : n_pairs + n_events]
        ev_taxa = (events & np.uint64((1 << TAXON_BITS) - 1)).astype(np.int64)
        self.add(taxa, encs, ev_taxa)
        return True

    def sparse_set_of(self, dense_id: int) -> np.ndarray:
        """Sorted distinct encodings of a (never-dense) taxon."""
        self._compact()
        lo = np.uint64(dense_id) << np.uint64(32)
        hi = np.uint64(dense_id + 1) << np.uint64(32)
        s = np.searchsorted(self._union, lo, side="left")
        e = np.searchsorted(self._union, hi, side="left")
        return (self._union[s:e] & np.uint64(0xFFFFFFFF)).astype(np.uint32)

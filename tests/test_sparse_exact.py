"""Sparse-regime statistics (classify/sparse_exact.py) against the real HLL
semantics: the per-(work unit, taxon) went-dense decision and the distinct
encodings of stayed-sparse groups must match what hll.HLL.insert_encodings
(itself bit-verified against the reference) produces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from krakenuniq_tpu.classify.sparse_exact import (
    TAXON_BITS,
    SparseTracker,
    sparse_stats_core,
    sparse_stats_host,
)
from krakenuniq_tpu.hll import HLL

P = 6  # threshold m/4 = 16: easy to hit the edge cases
TH = (1 << P) // 4

_jit_stats = jax.jit(sparse_stats_core, static_argnums=(4, 5))


def _oracle(taxa, enc, lanes, unit_bounds):
    """Run the real per-unit HLL fold and collect (pairs, dense events)."""
    pairs, dense = set(), []
    for s, e in zip(unit_bounds[:-1], unit_bounds[1:]):
        t = taxa[s:e][lanes[s:e]]
        v = enc[s:e][lanes[s:e]]
        for taxon in np.unique(t):
            h = HLL(P)
            h.insert_encodings(v[t == taxon])
            if h.sparse:
                pairs.update((int(taxon), int(x)) for x in h.sparse_set)
            else:
                dense.append(int(taxon))
    return pairs, sorted(dense)


def _decode(buf, n_p, n_e):
    pairs = buf[:n_p]
    taxa = ((pairs >> np.uint64(32)) & np.uint64((1 << TAXON_BITS) - 1)).astype(np.int64)
    encs = (pairs & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    events = buf[n_p : n_p + n_e]
    ev = sorted(int(x & np.uint64((1 << TAXON_BITS) - 1)) for x in events)
    return set(zip(taxa.tolist(), encs.tolist())), ev


@pytest.mark.parametrize("trial", range(8))
def test_device_and_host_match_oracle(trial):
    rng = np.random.default_rng(trial)
    b, w = 32, 40
    unit_bounds = [0, 10, 22, 32]
    unit_id = np.zeros(b, np.uint8)
    for u, (s, e) in enumerate(zip(unit_bounds[:-1], unit_bounds[1:])):
        unit_id[s:e] = u
    taxa = rng.integers(0, 6, size=(b, w)).astype(np.int32)
    # small encoding alphabet forces near-threshold distinct counts
    enc = (rng.integers(0, TH + 3, size=(b, w)).astype(np.uint32)) * 7 + 1
    lanes = rng.random((b, w)) < 0.8

    want_pairs, want_dense = _oracle(taxa, enc, lanes, unit_bounds)

    pt, pe, dt = sparse_stats_host(taxa, enc, lanes, unit_bounds, TH)
    assert set(zip(pt.tolist(), pe.tolist())) == want_pairs
    assert sorted(dt.tolist()) == want_dense

    buf, n_p, n_e = _jit_stats(
        jnp.asarray(taxa), jnp.asarray(enc), jnp.asarray(lanes),
        jnp.asarray(unit_id), P, 4096,
    )
    got_pairs, got_dense = _decode(np.asarray(buf), int(n_p), int(n_e))
    assert got_pairs == want_pairs
    assert got_dense == want_dense


@pytest.mark.parametrize("last_dup", [False, True])
def test_threshold_edge(last_dup):
    """d == m/4 exactly: the reference switches to dense only if the set
    fills BEFORE the unit's last insert (insert_encodings' positional
    check); a trailing duplicate flips the outcome."""
    stream = np.arange(1, TH + 1, dtype=np.uint32)
    if last_dup:
        stream = np.concatenate([stream, stream[:1]])
    h = HLL(P)
    h.insert_encodings(stream)
    assert h.sparse == (not last_dup)

    taxa = np.full((1, len(stream)), 3, np.int32)
    enc = stream[None, :]
    lanes = np.ones((1, len(stream)), bool)
    _, _, dt = sparse_stats_host(taxa, enc, lanes, [0, 1], TH)
    assert (len(dt) == 1) == last_dup
    buf, n_p, n_e = _jit_stats(
        jnp.asarray(taxa), jnp.asarray(enc), jnp.asarray(lanes),
        jnp.zeros(1, jnp.uint8), P, 4096,
    )
    assert (int(n_e) == 1) == last_dup
    assert (int(n_p) == 0) == last_dup


def test_tracker_union_and_final_state():
    """Union across spans/units equals one big host fold; a taxon dense in
    ANY unit is dense forever."""
    rng = np.random.default_rng(7)
    tr = SparseTracker()
    all_pairs: dict[int, set] = {}
    dense: set[int] = set()
    for span in range(4):
        taxa = rng.integers(0, 5, size=(16, 24)).astype(np.int32)
        enc = (rng.integers(0, TH + 2, size=(16, 24)).astype(np.uint32)) * 3 + 1
        lanes = rng.random((16, 24)) < 0.9
        ub = [0, 7, 16]
        pt, pe, dt = sparse_stats_host(taxa, enc, lanes, ub, TH)
        tr.add(pt, pe, dt)
        dense.update(int(x) for x in dt)
        for t, v in zip(pt.tolist(), pe.tolist()):
            all_pairs.setdefault(t, set()).add(v)
    assert tr.dense_ever == dense
    for t, vals in all_pairs.items():
        got = tr.sparse_set_of(t)
        assert set(got.tolist()) == vals
        assert (np.sort(got) == got).all()


def test_tracker_overflow_flag():
    tr = SparseTracker()
    buf = np.zeros(4, np.uint64)
    assert not tr.consume_buffer(buf, 3, 2)  # 5 > 4 slots
    assert tr.overflows == 1

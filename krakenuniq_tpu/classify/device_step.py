"""The jitted single-program classify step.

One XLA program does, for a whole padded read batch:
  2-bit windows -> canonical k-mers + scrambled minimizers -> two-level DB
  lookup (per configured database, hierarchically) -> per-read tree
  resolution -> HLL hash+encode.

Everything returned to the host is what the text/report layer needs:
per-k-mer taxa (original id space), ambiguity flags, per-read calls, the
32-bit HLL encodings, and the processed-lane mask.

Reference call path being replaced: classify.cpp:897-1012 per-read loop.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..kmer import ops as kops
from ..lookup import lookup_kmers
from ..lookup.hash_lookup import hash_lookup_kmers
from ..taxonomy.resolve import resolve_reads
from ..utils.bits import P_PRIME


def murmur3_finalizer_device(key: jax.Array) -> jax.Array:
    """Device version of the HLL bit mixer (hyperloglogplus.cpp:830-838)."""
    key = key.astype(jnp.uint64) + jnp.uint64(1)
    key ^= key >> jnp.uint64(33)
    key *= jnp.uint64(0xFF51AFD7ED558CCD)
    key ^= key >> jnp.uint64(33)
    key *= jnp.uint64(0xC4CEB9FE1A85EC53)
    key ^= key >> jnp.uint64(33)
    return key


def encode_hash_device(h: jax.Array, p: int) -> jax.Array:
    """Device version of the 32-bit sparse encoding (hyperloglogplus.cpp:181-204)."""
    idx = ((h >> jnp.uint64(64 - P_PRIME)) << jnp.uint64(32 - P_PRIME)).astype(jnp.uint32)
    flagged = (idx << jnp.uint32(p)) == 0
    shifted = h << jnp.uint64(P_PRIME)
    clz = jnp.minimum(
        jnp.where(shifted == 0, jnp.uint64(64), jax.lax.clz(shifted).astype(jnp.uint64)),
        jnp.uint64(64 - P_PRIME),
    )
    additional_rank = (clz + jnp.uint64(1)).astype(jnp.uint32)
    return jnp.where(flagged, idx | (additional_rank << jnp.uint32(1)) | jnp.uint32(1), idx)


def unpack_input(codes_packed: jax.Array, ambig_packed: jax.Array):
    """Unpack the bit-packed device feed (see kuniq_native.encode_unit_packed:
    base j = bits 2*(j%16) of codes word j/16, bit j%32 of ambig word j/32)
    into the (B, LB) uint8/bool arrays the window ops consume."""
    b, lbw = codes_packed.shape
    lb = lbw * 16
    csh = jnp.arange(16, dtype=jnp.uint32) * jnp.uint32(2)
    codes = (
        ((codes_packed[:, :, None] >> csh[None, None, :]) & jnp.uint32(3))
        .astype(jnp.uint8)
        .reshape(b, lb)
    )
    ash = jnp.arange(32, dtype=jnp.uint32)
    ambig = (
        ((ambig_packed[:, :, None] >> ash[None, None, :]) & jnp.uint32(1)) != 0
    ).reshape(b, lb)
    return codes, ambig


@dataclasses.dataclass(frozen=True)
class StepConfig:
    k: int
    nt: int
    n_iter: int  # binary search trip count
    max_depth: int
    hll_p: int = 12
    quick: bool = False
    min_hits: int = 1
    with_kmers: bool = False  # also return canonical k-mers (--exact mode)
    db_axis: str | None = None  # mesh axis name when the DB is minimizer-sharded
    max_runs: int = 0  # if > 0, emit RLE hit-list runs (packed single-fetch output)
    # "hash": bucketed row-gather lookup (planes are (table,), bucket bits in
    # hash_lbs); "bsearch": two-level binary search (planes are
    # (keys, vals, vals_dense, offsets, bin_start)); "acc": out-of-core
    # finish pass -- db_planes IS the uint32 [B, W] word plane accumulated by
    # probe_chunk over all chunk tables (classify.cpp:676-723's final pass)
    lookup_mode: str = "bsearch"
    hash_lbs: tuple = ()  # per-database bucket bits (static)
    # per-database: True when the hash table stores raw 32-bit DB values (UID
    # databases) instead of dense taxon ids; empty = all dense
    raw_dbs: tuple = ()
    # False: skip the on-device tree resolution (used by the long-read path,
    # whose O(W^2) resolve would be quadratic in read length; the host
    # resolves from the returned per-k-mer taxa instead)
    resolve: bool = True
    # True: codes/ambig arrive bit-packed (uint32 words of 16 2-bit codes /
    # 32 ambiguity bits) and are unpacked on device -- 5x fewer host->device
    # bytes, which matters when the device link is bandwidth-bound
    packed_input: bool = False
    # True: RLE rows carry DENSE taxon ids packed with their run length in a
    # single u32 (dense<<16 | ambig<<15 | len) and the n_kmers column is
    # dropped (derivable from the sequence length on host) -- 40B/read at R=8
    # instead of 60B. The 16-bit field requires ids < 65536: either the whole
    # taxonomy fits (host maps through taxid_table) or local_dict remaps per
    # span. The device->host link is the pipeline's bandwidth bottleneck, so
    # fetched bytes are the cost model.
    dense_runs: bool = False
    # True (with dense_runs): build a per-span taxon dictionary on device --
    # sort-unique of every dense id the span touched (hits + calls) -- and
    # emit LOCAL ids in the RLE rows and the hll_dense feed. FALLBACK path:
    # normally the load-time value pool (db/pool.py) is the global
    # dictionary (u16 pool ids at any taxonomy size, no per-span remap);
    # this engages only when the value closure exceeds u16.
    # The dictionary itself returns as out["lut"]
    # (int32 [dict_capacity + 1], last element = #uniques; an overflowing
    # span is re-dispatched on the wide layout by the host -- rare).
    local_dict: bool = False
    dict_capacity: int = 1 << 15  # must stay < 0xFFFF (the u16 sentinel)
    # mesh data axis name (set by parallel/mesh.py). With local_dict, the
    # per-shard dictionaries are all_gathered over this axis and merged into
    # ONE span-global dictionary shared by every data shard, so the host
    # sees the same lut/RLE contract as the single-chip path.
    data_axis: str | None = None
    # restrict the returned dict to these keys (None = all). Every returned
    # array is a device buffer the dispatch must allocate and register
    # through the transport -- ~80ms/dispatch of overhead for the full
    # 12-output dict at B=65536 -- and XLA can DCE whole phases when their
    # outputs are dropped. The native pipeline asks only for what its mode
    # actually reads back.
    outputs: tuple | None = None


def classify_step_core(
    db_planes,  # tuple of (keys, vals, vals_dense, offsets, bin_start) per database
    taxid_table: jax.Array,  # uint32 [T]: dense -> original taxid
    tin: jax.Array,
    tout: jax.Array,
    parent: jax.Array,
    root_dense: jax.Array,
    codes: jax.Array,  # uint8 [B, LB]
    ambig: jax.Array,  # bool [B, LB]
    lengths: jax.Array,  # int32 [B]
    cfg: StepConfig,
):
    if cfg.packed_input:
        codes, ambig = unpack_input(codes, ambig)
    k = cfg.k
    b, lb = codes.shape
    w = lb - k + 1

    canon = kops.canonical_representation(kops.pack_windows(codes, k), k)
    kmer_ambig = kops.window_any(ambig, k)
    hashes = murmur3_finalizer_device(canon)
    if cfg.lookup_mode == "bsearch":
        bins = kops.minimizers(codes, k, cfg.nt)

    pos = jnp.arange(w, dtype=jnp.int32)[None, :]
    n_kmers = jnp.maximum(lengths - (k - 1), 0)[:, None]  # 0 if read shorter than k
    valid = pos < n_kmers

    search = valid & ~kmer_ambig
    taxon = jnp.zeros((b, w), dtype=jnp.uint32)
    taxon_dense = jnp.zeros((b, w), dtype=jnp.int32)
    found = jnp.zeros((b, w), dtype=bool)
    if cfg.lookup_mode == "acc":
        # out-of-core finish: db_planes is the merged word plane (already
        # masked to searched lanes at probe time; re-masking is a no-op)
        word = jnp.where(search, db_planes, jnp.uint32(0))
        if cfg.raw_dbs and cfg.raw_dbs[0]:
            taxon = word
        else:
            taxon_dense = word.astype(jnp.int32)
        found = word != 0
        db_planes = ()
    # hierarchical multi-DB: later DBs only fill lanes still unclassified
    # (classify.cpp:927-936)
    for db_i, plane in enumerate(db_planes):
        remaining = search & ~found
        if cfg.lookup_mode == "hash":
            # plane = (fused,) or (ptags, confirm); see db/hash_table.py
            word = hash_lookup_kmers(plane, hashes, remaining, cfg.hash_lbs[db_i])
            if cfg.db_axis is not None:
                # minimizer-range sharding: each k-mer's bin lives on exactly
                # one shard (the invariant asserted by the reference's chunk
                # merge, classify.cpp:447), so combining shard results is a
                # plain sum
                word = jax.lax.psum(word, cfg.db_axis)
            raw = cfg.raw_dbs[db_i] if db_i < len(cfg.raw_dbs) else False
            if raw:
                taxon = jnp.where(remaining, word, taxon)
            else:
                taxon_dense = jnp.where(
                    remaining, word.astype(jnp.int32), taxon_dense
                )
            found = found | (word != 0)
        else:
            keys, vals, vals_dense, offsets, bin_start = plane
            t_i, td_i = lookup_kmers(
                keys, vals, vals_dense, offsets, canon, bins, remaining, cfg.n_iter, bin_start
            )
            if cfg.db_axis is not None:
                t_i = jax.lax.psum(t_i, cfg.db_axis)
                td_i = jax.lax.psum(td_i, cfg.db_axis)
            taxon = jnp.where(remaining, t_i, taxon)
            taxon_dense = jnp.where(remaining, td_i, taxon_dense)
            found = found | (t_i != 0)

    any_raw = any(cfg.raw_dbs)
    if cfg.lookup_mode in ("hash", "acc"):
        # dense-valued DBs store only the dense id; recover original taxids
        # for the hit-list/output planes (taxid_table[0] == 0, so misses map
        # to 0). A full-plane element-gather costs ~90ms at [65536, 120], so
        # every downstream consumer derives ids at [B] or [B, R] granularity
        # instead; this plane materializes only when the caller fetches
        # "taxa" (XLA DCEs it otherwise -- exact/python/UID paths).
        mapped = jnp.take(taxid_table, taxon_dense).astype(jnp.uint32)
        taxon = jnp.where(taxon == 0, mapped, taxon)

    hit = found

    if cfg.quick:
        # stop after min_hits DB hits (classify.cpp:941-963): a k-mer position
        # is processed iff fewer than min_hits hits occurred strictly before it
        hits_before = jnp.cumsum(hit.astype(jnp.int32), axis=1) - hit.astype(jnp.int32)
        processed = valid & (hits_before < cfg.min_hits)
        total_hits = jnp.sum((hit & processed).astype(jnp.int32), axis=1)
        # the call is the taxon of the hit that reached min_hits
        reach = (hits_before + hit.astype(jnp.int32) == cfg.min_hits) & hit & processed
        call_pos = jnp.argmax(reach, axis=1)
        call_dense_taxon = jnp.take_along_axis(taxon_dense, call_pos[:, None], axis=1)[:, 0]
        call_dense = jnp.where(total_hits >= cfg.min_hits, call_dense_taxon, 0)
        if any_raw:
            call_taxon = jnp.take_along_axis(taxon, call_pos[:, None], axis=1)[:, 0]
            call = jnp.where(total_hits >= cfg.min_hits, call_taxon, jnp.uint32(0))
        else:
            call = jnp.take(taxid_table, call_dense)  # [B]-sized mapping only
    elif cfg.resolve:
        processed = valid
        total_hits = jnp.sum(hit.astype(jnp.int32), axis=1)
        call_dense = resolve_reads(
            taxon_dense, hit & processed, tin, tout, parent, root_dense, cfg.max_depth
        )
        call = jnp.take(taxid_table, call_dense)
    else:
        processed = valid
        total_hits = jnp.sum(hit.astype(jnp.int32), axis=1)
        call_dense = jnp.zeros(b, dtype=jnp.int32)
        call = jnp.zeros(b, dtype=jnp.uint32)

    # HLL: every processed non-ambiguous k-mer is counted, including misses
    # under taxon 0 (classify.cpp:939); the same murmur output drives the
    # hash-table buckets and the HLL encoding
    hll_lanes = processed & ~kmer_ambig
    enc = encode_hash_device(hashes, cfg.hll_p)

    out = {
        "taxa": taxon,
        "taxa_dense": taxon_dense,
        "ambig": kmer_ambig,
        "processed": processed,
        "hll_lanes": hll_lanes,
        "enc": enc,
        "call": call,
        "call_dense": call_dense,
        "hits": total_hits,
        "n_kmers": n_kmers[:, 0],
    }
    if cfg.with_kmers:
        out["canon"] = canon
    if cfg.max_runs > 0:
        # run grouping on DENSE ids when every DB stores them (dense_index is
        # injective, so run boundaries match the original-id grouping); the
        # wide layout maps run values back through taxid_table at [B, R]
        # granularity, never touching the full mapped plane
        use_dense_ids = not any_raw
        pack_ids = taxon_dense.astype(jnp.uint32) if use_dense_ids else taxon
        pack_call = (
            call_dense.astype(jnp.uint32)
            if (cfg.dense_runs and not cfg.quick)
            else call
        )
        hll_ids16 = taxon_dense
        if cfg.dense_runs and cfg.local_dict:
            # per-span taxon dictionary: sorted unique dense ids over every
            # id this span can emit (hit lanes, including the zeros of
            # misses/pad lanes, plus the resolved calls). Grouping by local
            # id equals grouping by dense id (the remap is injective on the
            # span), so the RLE runs are unchanged -- only their value field
            # shrinks to u16.
            u_cap = cfg.dict_capacity
            vals_all = jnp.concatenate([taxon_dense.reshape(-1), call_dense])
            s = jax.lax.sort(vals_all)
            is_first = jnp.concatenate(
                [jnp.ones((1,), bool), s[1:] != s[:-1]]
            )
            ranks = jnp.cumsum(is_first.astype(jnp.int32))
            n_u = ranks[-1]
            pad = jnp.int32(2**30)  # > any dense id; keeps the lut sorted
            # compact the distinct values by PROBING, not scattering: ranks
            # is a nondecreasing plane, so the r-th distinct value sits at
            # the first position where ranks == r -- u_cap binary-search
            # probes replace a full-lane-plane scatter (the §5 scatter cost
            # class, 80-500 ms at 8.5M lanes; measured the dominant term of
            # the fallback span program)
            r_targets = jnp.arange(1, u_cap + 1, dtype=jnp.int32)
            idx = jnp.searchsorted(ranks, r_targets, side="left")
            lut = jnp.where(
                r_targets <= n_u,
                jnp.take(s, jnp.minimum(idx, s.shape[0] - 1)),
                pad,
            )
            n_ids = taxid_table.shape[0]  # dense id space (static)
            if cfg.data_axis is not None:
                # mesh: merge the per-data-shard dictionaries into one
                # span-global lut (identical on every shard) so RLE values
                # and the hll feed agree across shard row ranges
                g = jax.lax.all_gather(lut, cfg.data_axis)
                s2 = jax.lax.sort(g.reshape(-1))
                first2 = jnp.concatenate(
                    [jnp.ones((1,), bool), s2[1:] != s2[:-1]]
                ) & (s2 != pad)
                ranks2 = jnp.cumsum(first2.astype(jnp.int32))
                pos2 = jnp.where(first2, ranks2 - 1, jnp.int32(u_cap))
                lut = (
                    jnp.full((u_cap,), pad, jnp.int32)
                    .at[pos2]
                    .set(jnp.where(first2, s2, pad), mode="drop")
                )
                # overflow propagates: a shard whose LOCAL uniques exceeded
                # the cap dropped ids before the merge, so report its count
                n_u_local_max = jax.lax.pmax(n_u, cfg.data_axis)
                n_u = jnp.maximum(ranks2[-1], n_u_local_max)
            # dense-id -> local-id remap table, scattered from the COMPACT
            # lut (u_cap lanes) and answered in ONE gather pass. The
            # previous searchsorted remap was a 15-round binary search --
            # 15 element-gather passes over the full [B, W] plane, measured
            # ~1.1 s/span on v5e, 5x the whole classify step. Pad entries
            # index outside [0, n_ids) => mode="drop".
            remap = (
                jnp.zeros((n_ids,), jnp.int32)
                .at[lut]
                .set(jnp.arange(u_cap, dtype=jnp.int32), mode="drop")
            )
            # answer the [B, W] remap with a 16B ROW gather + 4-way lane
            # select instead of a 1-D element gather -- the element form
            # costs ~8.9 ns/lane vs ~6.7 for 4-u32 rows (BENCHNOTES.md §2;
            # same trick as the CHD displacement fetch, lookup/_probe_chd)
            pad4 = (-n_ids) % 4
            remap4 = jnp.concatenate(
                [remap, jnp.zeros((pad4,), jnp.int32)]
            ).reshape(-1, 4)
            rows4 = jnp.take(remap4, taxon_dense >> 2, axis=0)  # [B, W, 4]
            ln = taxon_dense & 3
            local_taxa = jnp.where(
                ln == 0,
                rows4[..., 0],
                jnp.where(
                    ln == 1,
                    rows4[..., 1],
                    jnp.where(ln == 2, rows4[..., 2], rows4[..., 3]),
                ),
            )
            pack_ids = local_taxa.astype(jnp.uint32)
            if not cfg.quick:
                pack_call = jnp.take(remap, call_dense, axis=0).astype(jnp.uint32)
            hll_ids16 = local_taxa
            out["lut"] = jnp.concatenate([lut, n_u[None]])
        out["packed"] = _pack_runs(
            pack_ids,
            kmer_ambig,
            valid,
            pack_call,
            total_hits,
            n_kmers[:, 0],
            cfg.max_runs,
            dense_words=cfg.dense_runs,
            compact_meta=cfg.dense_runs and not cfg.quick,
            map_table=taxid_table if (use_dense_ids and not cfg.dense_runs) else None,
        )
        # single-fetch accumulate feed for the host (exact-compat) counter
        if cfg.dense_runs:
            # 6B/lane: u32 encoding + u16 taxon id (0xFFFF = uncounted);
            # the id is the dense taxon when the taxonomy fits 16 bits, else
            # the span-local dictionary id (host maps through out["lut"])
            out["hll_enc"] = enc
            out["hll_dense"] = jnp.where(
                hll_lanes, hll_ids16.astype(jnp.uint16), jnp.uint16(0xFFFF)
            )
        else:
            # 8B/lane: id<<32 | hll-encoding, all-ones sentinel elsewhere.
            # The id half carries DENSE taxa when every DB stores them (the
            # host maps them back; keeps the full mapped plane DCE-able) and
            # raw/original ids otherwise (UID values are not taxids at all)
            pair_ids = taxon if any_raw else taxon_dense.astype(jnp.uint32)
            out["hll_pairs"] = jnp.where(
                hll_lanes,
                (pair_ids.astype(jnp.uint64) << jnp.uint64(32)) | enc.astype(jnp.uint64),
                jnp.uint64(0xFFFFFFFFFFFFFFFF),
            )
    if cfg.outputs is not None:
        out = {k: out[k] for k in cfg.outputs}
    return out


def _pack_runs(ids, kmer_ambig, valid, call, hits, n_kmers, max_runs, *, dense_words, compact_meta=False, map_table=None):
    """RLE-encode each read's per-k-mer hit codes on device and pack the
    whole per-read result into one uint32 matrix so the host needs a single
    transfer per batch.

    `ids` is the per-k-mer id plane used both for run grouping and run
    values: DENSE taxon ids when every DB stores them, else original/raw
    ids (UID or missing-taxon corner). `map_table` (wide layout + dense ids)
    maps each run's id back to the original taxid with one [B, R] gather.

    Wide row layout (R = max_runs, must be even; 60B/read at R=8 -- sized
    for a bandwidth-bound device link):
      [run_vals(R) | lens2(R/2) | call | n_kmers | hits<<16 | n_runs]
    lens2 packs two 16-bit run lengths per word (even run in the low half);
    each u16 = run_len (15 bits) | ambiguity flag << 15 (an 'A:' run).

    Dense row layout (dense_words; requires dense `ids` and a <= 2^16-node
    taxonomy): R run words of dense_taxon<<16 | ambig<<15 | run_len, then
      compact_meta (non-quick; 36B/read at R=8): ONE meta word
        call_dense<<16 | n_runs  -- `call` must be the DENSE call id and
        hits is dropped (only quick-mode output prints it)
      else (quick; 40B/read): call | hits<<16 | n_runs
    n_kmers is omitted -- the host derives it from the sequence length.

    Reads with more than R runs report n_runs > R and are re-fetched row-wise
    by the host (rare). Requires W < 2^15 and matches the parser in
    kuniq_native.kraken_lines_rle.
    """
    b, w = ids.shape
    r = max_runs
    if r % 2 != 0:
        raise ValueError("max_runs must be even (paired 16-bit run lengths)")
    if w >= 1 << 15:
        raise ValueError("RLE packing supports at most 2^15-1 k-mers per read")
    code = jnp.where(kmer_ambig, jnp.int64(-1), ids.astype(jnp.int64))
    code = jnp.where(valid, code, jnp.int64(-2))
    prev = jnp.concatenate([jnp.full((b, 1), jnp.int64(-3)), code[:, :-1]], axis=1)
    change = (code != prev) & valid
    run_id = jnp.cumsum(change.astype(jnp.int32), axis=1) - 1  # -1 before first run
    n_runs = jnp.max(jnp.where(valid, run_id, -1), axis=1) + 1

    # per-run fields as broadcast-reductions over the R run slots: all lanes
    # of a run share one taxon, so a masked max/sum over W per (read, slot)
    # replaces three 2M-element scatters (scatters cost ~30ms each on v5e;
    # this fuses into ~1ms of VPU reductions)
    r_idx = jnp.arange(r, dtype=jnp.int32)
    in_slot = valid[:, None, :] & (run_id[:, None, :] == r_idx[None, :, None])
    run_lens = jnp.sum(in_slot, axis=2).astype(jnp.uint32)
    run_amb = (
        jnp.any(in_slot & kmer_ambig[:, None, :], axis=2).astype(jnp.uint32)
        << jnp.uint32(15)
    )
    meta = (hits.astype(jnp.uint32) << jnp.uint32(16)) | n_runs.astype(jnp.uint32)
    run_ids = jnp.max(jnp.where(in_slot, ids[:, None, :], jnp.uint32(0)), axis=2)

    if dense_words:
        # dense 0 is the taxid-0 sentinel (taxonomy/tree.py), so a miss run
        # encodes as dense 0 exactly like taxon 0 in the wide layout
        words = (run_ids << jnp.uint32(16)) | run_amb | run_lens
        if compact_meta:
            meta1 = (call.astype(jnp.uint32) << jnp.uint32(16)) | n_runs.astype(
                jnp.uint32
            )
            return jnp.concatenate([words, meta1[:, None]], axis=1)
        return jnp.concatenate(
            [words, call.astype(jnp.uint32)[:, None], meta[:, None]], axis=1
        )

    run_vals = (
        jnp.take(map_table, run_ids.astype(jnp.int32)) if map_table is not None else run_ids
    )
    lens16 = run_lens | run_amb
    lens2 = lens16[:, 0::2] | (lens16[:, 1::2] << jnp.uint32(16))
    return jnp.concatenate(
        [
            run_vals,
            lens2,
            call.astype(jnp.uint32)[:, None],
            n_kmers.astype(jnp.uint32)[:, None],
            meta[:, None],
        ],
        axis=1,
    )


classify_step = jax.jit(classify_step_core, static_argnames=("cfg",))


def _probe_chunk_core(
    acc: jax.Array,  # uint32 [B, W]: merged word plane so far (donated)
    planes: tuple,  # one resident chunk's hash planes (db/hash_table.py)
    codes: jax.Array,
    ambig: jax.Array,
    lengths: jax.Array,
    cfg: StepConfig,
):
    """One out-of-core pass: probe a single resident chunk table and fold its
    hits into the accumulated word plane.

    The merge is a precedence select (keep the first nonzero word): within
    one database it never conflicts -- each k-mer's minimizer lives in
    exactly one chunk, the invariant the reference's chunk merge asserts
    (classify.cpp:447) -- and across hierarchically-ordered databases it IS
    the first-DB-wins rule (classify.cpp:927-936), provided chunks are
    probed in database order."""
    if cfg.packed_input:
        codes, ambig = unpack_input(codes, ambig)
    k = cfg.k
    b, lb_len = codes.shape
    w = lb_len - k + 1
    canon = kops.canonical_representation(kops.pack_windows(codes, k), k)
    kmer_ambig = kops.window_any(ambig, k)
    hashes = murmur3_finalizer_device(canon)
    pos = jnp.arange(w, dtype=jnp.int32)[None, :]
    n_kmers = jnp.maximum(lengths - (k - 1), 0)[:, None]
    search = (pos < n_kmers) & ~kmer_ambig
    word = hash_lookup_kmers(planes, hashes, search, cfg.hash_lbs[0])
    if cfg.db_axis is not None:
        # OOC x mesh: each group probes mesh_db chunks simultaneously; a
        # k-mer's minimizer lives in at most one of them (classify.cpp:447),
        # so the cross-shard merge is a plain sum
        word = jax.lax.psum(word, cfg.db_axis)
    return jnp.where(acc != 0, acc, word)


probe_chunk = jax.jit(
    _probe_chunk_core, static_argnames=("cfg",), donate_argnums=(0,)
)


def _classify_and_count_core(
    reg,
    kmer_counts,
    read_counts,
    pool_maps,
    db_planes,
    taxid_table,
    tin,
    tout,
    parent,
    root_dense,
    codes,
    ambig,
    lengths,
    n_valid,
    unit_id,  # uint8 [B] work-unit index per row (sparse-exact tracking)
    cfg: StepConfig,
    p: int,
    sparse_cap: int = 0,
    counts_only: bool = False,
    identity_pool: bool = False,
):
    """Classify step with the --device-counters accumulation fused into the
    same XLA program: one dispatch per span, and the accumulation scatters
    overlap the lookup gathers instead of serializing behind them. With
    sparse_cap > 0 the program also emits the per-work-unit sparse-regime
    stats (sparse_exact.py) that make the fast mode bit-identical. For
    raw-valued (UID) databases the counters key on the RAW value plane
    (the reference counts k-mers under the stored UID, classify.cpp:939);
    counts_only skips the register/tracking work (--exact mode)."""
    from .device_counters import update_core

    # the accumulation consumes intermediate outputs, so run the core
    # unfiltered and apply cfg.outputs only to what the host sees
    out = classify_step_core(
        db_planes, taxid_table, tin, tout, parent, root_dense, codes, ambig, lengths,
        dataclasses.replace(cfg, outputs=None),
    )
    b = codes.shape[0]
    row_valid = jnp.arange(b, dtype=jnp.int32) < n_valid
    id_plane = out["taxa"].astype(jnp.int32) if any(cfg.raw_dbs) else out["taxa_dense"]
    state = update_core(
        reg,
        kmer_counts,
        read_counts,
        pool_maps,
        id_plane,
        out["enc"],
        out["hll_lanes"],
        out["call_dense"],
        row_valid,
        p,
        unit_id,
        sparse_cap,
        counts_only,
        identity_pool,
    )
    if cfg.outputs is not None:
        out = {k: out[k] for k in cfg.outputs}
    return out, state[:3], state[3:]


classify_and_count = jax.jit(
    _classify_and_count_core,
    static_argnames=("cfg", "p", "sparse_cap", "counts_only", "identity_pool"),
    donate_argnums=(0, 1, 2),
)

#!/usr/bin/env python
"""Benchmark: classify throughput at reference workload shape.

Prints a JSON line after EVERY completed stage (each line is a complete,
valid metric record -- a driver timeout keeps the latest one). The primary
metric is the --device-counters end-to-end pipeline throughput, which with
sparse-regime tracking (classify/sparse_exact.py) is BIT-IDENTICAL to the
reference's reports; the exact-compat host-accumulation mode is recorded
alongside, plus the device-step microbench with per-phase timings and the
achieved probe bandwidth vs the HBM roofline.

Workload shape mirrors the reference's own benchmark (paper.md:122-136): a
>=100M-key database (k=31, XOR-scrambled minimizer bins) under an
NCBI-scale taxonomy (~2.4M nodes), classified in 65536-read device batches.
Baseline: the reference's fastest configuration (--preload, whole DB in
RAM) classifies 9.4M reads in 14 min ~= 11,200 reads/s on a 2020 multicore
server (paper.md:125, BASELINE.md). vs_baseline = headline reads/s / that.

Pass structure per mode: a short warmup pass (2 device spans) triggers
every compile, then reset_counters() re-arms the SAME loaded classifier
(no table re-upload) for the timed pass -- the round-2 bench paid a ~90s
reload per pass and timed out (BENCH_r02.json rc=124).

The synthetic database persists under ~/.cache as a reference-layout DB
directory; the first run pays the build (minutes at 100M keys), later runs
load it.
"""

import io
import json
import os
import sys
import tempfile
import time

import numpy as np

BASELINE_READS_PER_S = 9_400_000 / (14 * 60)  # paper.md:125
HBM_PEAK_GBPS = float(os.environ.get("BENCH_HBM_PEAK_GBPS", 819))  # v5e

RESULT = {
    "metric": "end_to_end_classify_reads_per_s",
    "value": None,
    "unit": "reads/s",
    "vs_baseline": None,
    "mode": None,  # set to the fastest bit-exact mode as stages complete
    "stages_done": [],
}


def emit(stage: str) -> None:
    RESULT["stages_done"] = RESULT["stages_done"] + [stage]
    print(json.dumps(RESULT), flush=True)


def _pack_codes(codes: np.ndarray, ambig: np.ndarray):
    """Host bit-pack to the native feed layout (16 2-bit codes / u32 word,
    32 ambig bits / word)."""
    b, lb = codes.shape
    cw = codes.astype(np.uint32).reshape(b, lb // 16, 16)
    shifts = (np.arange(16, dtype=np.uint32) * 2)[None, None, :]
    packed_c = (cw << shifts).sum(axis=2, dtype=np.uint32)
    aw = ambig.astype(np.uint32).reshape(b, lb // 32, 32)
    ash = np.arange(32, dtype=np.uint32)[None, None, :]
    packed_a = (aw << ash).sum(axis=2, dtype=np.uint32)
    return packed_c, packed_a


def ensure_db_dir(n_species, genome_len, k, nt, pad_nodes, ballast):
    """Build-or-load the persistent reference-layout synthetic DB dir."""
    from krakenuniq_tpu.formats import write_index, write_kdb
    from krakenuniq_tpu.utils.demo import make_demo_db

    cache_root = os.path.expanduser("~/.cache")
    db_dir = os.path.join(
        cache_root,
        f"kuniq_bench_dbdir_{n_species}_{genome_len}_{k}_{nt}_{pad_nodes}_{ballast}_v5",
    )
    genomes_npz = os.path.join(db_dir, "genomes.npz")
    os.makedirs(db_dir, exist_ok=True)
    if os.path.exists(genomes_npz) and os.path.exists(os.path.join(db_dir, "taxDB")):
        z = np.load(genomes_npz, allow_pickle=True)
        genomes = z["genomes"].item()
        n_keys = int(z["n_keys"])
        print(f"bench db dir loaded from cache ({db_dir})", file=sys.stderr)
    else:
        t0 = time.time()
        print(
            f"building bench db (one-time; minutes at {ballast/1e6:.0f}M keys)",
            file=sys.stderr,
        )
        keys, vals, offsets, tax, genomes = make_demo_db(
            n_species=n_species, genome_len=genome_len, k=k, nt=nt,
            species_base=10_000_000, pad_nodes=pad_nodes, ballast_keys=ballast,
        )
        n_keys = len(keys)
        write_kdb(os.path.join(db_dir, "database.kdb"), keys, vals, k=k)
        write_index(
            os.path.join(db_dir, "database.idx"), nt,
            np.asarray(offsets, dtype=np.uint64),
        )
        tax.write_taxdb(os.path.join(db_dir, "taxDB"))
        np.savez(genomes_npz + ".tmp.npz",
                 genomes=np.array(genomes, dtype=object), n_keys=np.int64(n_keys))
        os.replace(genomes_npz + ".tmp.npz", genomes_npz)
        del keys, vals, offsets, tax
        print(f"bench db built in {time.time()-t0:.0f}s -> {db_dir}", file=sys.stderr)
    return db_dir, genomes, n_keys


def phase_microbench(c, genomes, batch, read_len, k, reps, emit_windows=None):
    """Per-phase device-step timings on classifier `c` (windows+murmur,
    probe, resolve, full step). Returns (phases dict, lookups_per_s,
    probe_gbps, lanes)."""
    import jax
    import jax.numpy as jnp

    from krakenuniq_tpu.classify import device_step as ds
    from krakenuniq_tpu.classify.device_step import classify_step
    from krakenuniq_tpu.kmer import encode_batch
    from krakenuniq_tpu.kmer import ops as kops
    from krakenuniq_tpu.lookup.hash_lookup import hash_lookup_kmers
    from krakenuniq_tpu.taxonomy.resolve import resolve_reads
    from krakenuniq_tpu.utils.demo import make_demo_reads

    db0 = c.dbs[0]
    hash_lb = db0.hash_lb
    fused_planes = c._db_planes[0]
    reads = make_demo_reads(genomes, n_reads=batch, read_len=read_len)
    lb_len = max(128, -(-read_len // 32) * 32)
    enc = encode_batch(reads, lb=lb_len, batch=batch)
    codes_packed, ambig_packed = _pack_codes(
        np.asarray(enc.codes), np.asarray(enc.ambig)
    )
    codes_packed = jax.device_put(codes_packed)
    ambig_packed = jax.device_put(ambig_packed)
    w = lb_len - k + 1
    lanes = batch * w

    cfg = c._cfg_packed
    taxid_table = c._taxid_table
    targs = (c._tin, c._tout, c._parent)
    root = c._root_dense
    lengths = jax.device_put(np.asarray(enc.lengths))

    def timeit(fn, n=max(2, reps // 2)):
        np.asarray(fn())
        t1 = time.time()
        for _ in range(n - 1):
            fn()
        np.asarray(fn())
        return (time.time() - t1) / n

    # pass the table planes as ARGUMENTS: closing over them would bake the
    # multi-GB table into the lowered program as a constant
    @jax.jit
    def _ph_windows(cp, ap):
        cc, aa = ds.unpack_input(cp, ap)
        canon = kops.canonical_representation(kops.pack_windows(cc, k), k)
        return jnp.sum(ds.murmur3_finalizer_device(canon))

    @jax.jit
    def _ph_probe(planes, cp, ap):
        cc, aa = ds.unpack_input(cp, ap)
        canon = kops.canonical_representation(kops.pack_windows(cc, k), k)
        h = ds.murmur3_finalizer_device(canon)
        val = hash_lookup_kmers(planes, h, jnp.ones_like(h, bool), hash_lb)
        return jnp.sum(val)

    rng = np.random.default_rng(0)
    vpool = np.unique(np.asarray(db0.vals_dense))
    if c._pool is not None:
        vpool = c._pool.pool_index(vpool)
    taxa_rand = jax.device_put(
        vpool[rng.integers(0, len(vpool), size=(batch, w))].astype(np.int32))
    hitmask = jax.device_put(rng.random((batch, w)) < 0.8)

    @jax.jit
    def _ph_resolve(tr, hm, t1, t2, t3):
        return jnp.sum(resolve_reads(tr, hm, t1, t2, t3, root, cfg.max_depth))

    def ph_full():
        out = classify_step(
            (fused_planes,), taxid_table, *targs, root,
            codes_packed, ambig_packed, lengths, cfg)
        return out["packed"]

    phases = {}
    phases["windows_murmur_ms"] = 1e3 * timeit(
        lambda: _ph_windows(codes_packed, ambig_packed))
    if emit_windows:
        emit_windows()
    phases["probe_chain_ms"] = 1e3 * timeit(
        lambda: _ph_probe(fused_planes, codes_packed, ambig_packed))
    phases["probe_ms"] = phases["probe_chain_ms"] - phases["windows_murmur_ms"]
    phases["resolve_ms"] = 1e3 * timeit(
        lambda: _ph_resolve(taxa_rand, hitmask, *targs))
    dt_full = timeit(ph_full)
    phases["full_step_ms"] = 1e3 * dt_full

    lookups_per_s = lanes / dt_full
    probe_bytes = 2 * 16 * lanes  # two 16B candidate rows per query
    probe_gbps = probe_bytes / max(phases["probe_ms"], 1e-6) / 1e6
    print(
        f"device step B={batch} W={w}: full {phases['full_step_ms']:.1f}ms "
        f"({lookups_per_s/1e6:.1f}M lookups/s) | windows+murmur "
        f"{phases['windows_murmur_ms']:.1f}ms, probe {phases['probe_ms']:.1f}ms "
        f"({probe_gbps:.1f}GB/s gathered vs {HBM_PEAK_GBPS:.0f}GB/s HBM peak), "
        f"resolve {phases['resolve_ms']:.1f}ms",
        file=sys.stderr,
    )
    return phases, lookups_per_s, probe_gbps, lanes


def main():
    t_start = time.time()
    import jax

    plat = os.environ.get("BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    from krakenuniq_tpu.utils.demo import make_demo_db, make_demo_reads

    n_species = int(os.environ.get("BENCH_SPECIES", 400))
    genome_len = int(os.environ.get("BENCH_GENOME_LEN", 25_000))
    ballast = int(os.environ.get("BENCH_BALLAST", 101_000_000))
    pad_nodes = int(os.environ.get("BENCH_PAD_NODES", 2_400_000))
    k = 31
    nt = int(os.environ.get("BENCH_NT", 12))
    batch = int(os.environ.get("BENCH_BATCH", 65536))
    read_len = int(os.environ.get("BENCH_READ_LEN", 150))
    reps = int(os.environ.get("BENCH_REPS", 6))
    n_bench_reads = int(os.environ.get("BENCH_PIPELINE_READS", 1_000_000))
    # warmup covers every padding bucket the timed pass can hit (full spans
    # plus a small tail) so no compile lands inside a timed pass
    n_warm_reads = 2 * batch + 4096
    budget_s = float(os.environ.get("BENCH_BUDGET_S", 0))  # 0 = no gating

    # ---- persistent reference-layout DB dir (built once, reused) ---------
    db_dir, genomes, n_keys = ensure_db_dir(
        n_species, genome_len, k, nt, pad_nodes, ballast
    )

    from krakenuniq_tpu.classify import Classifier, ClassifyOptions

    t_load = time.time()
    c_dc = Classifier(
        [db_dir], ClassifyOptions(print_progress=False, device_counters=True)
    )
    load_s = time.time() - t_load
    tax_nodes = c_dc.taxonomy.size
    RESULT.update(
        db_keys=n_keys,
        taxonomy_nodes=tax_nodes,
        batch_reads=batch,
        pipeline_reads=n_bench_reads,
        load_upload_s=round(load_s, 1),
        hash_lb=c_dc.dbs[0].hash_lb,
    )
    table_gb = sum(int(np.prod(p.shape)) * 4 for p in c_dc._db_planes[0]) / 1e9
    RESULT["table_gb"] = round(table_gb, 2)
    # link weather (BENCHNOTES §4: swings 3-10x between sessions and floors
    # every end-to-end figure). Two distinct quantities, both MB/s:
    #   load_MBps -- table GB over the WHOLE Classifier load (disk read +
    #     table build/cache + upload); a coarse per-round context figure.
    #   link_upload_MBps -- a separately timed device_put of a fresh 256 MB
    #     host buffer, measuring just the host->device link this session.
    RESULT["load_MBps"] = round(table_gb * 1e3 / max(load_s, 1e-9), 1)
    _probe_buf = np.zeros(64 * 1024 * 1024, dtype=np.uint32)  # 256 MB
    t_link = time.time()
    jax.block_until_ready(jax.device_put(_probe_buf))
    link_s = time.time() - t_link
    del _probe_buf
    RESULT["link_upload_MBps"] = round(256.0 / max(link_s, 1e-9), 1)
    print(
        f"db: {n_keys/1e6:.1f}M keys, taxonomy {tax_nodes/1e6:.2f}M nodes, "
        f"hash lb={c_dc.dbs[0].hash_lb} ({table_gb:.2f}GB table, "
        f"{len(c_dc._db_planes[0])}-plane layout), "
        f"load+upload {load_s:.1f}s; devices={jax.devices()}",
        file=sys.stderr,
    )
    print(
        f"id space: {'pool' if c_dc._pool is not None else 'dense'}"
        + (f" ({c_dc._pool.size} ids)" if c_dc._pool is not None else ""),
        file=sys.stderr,
    )
    emit("load")

    # ---- read sets -------------------------------------------------------
    # Species abundance follows a zipf law by default -- real metagenomes
    # are dominated by a few organisms with a long low-abundance tail (the
    # reference's own benchmark sample, a human eye metagenome, is such a
    # community; paper.md:122). BENCH_ABUNDANCE=uniform restores the flat
    # draw (adversarial for sparse-regime tracking: every taxon sits just
    # under the m/4 dense threshold in every work unit).
    abundance = os.environ.get("BENCH_ABUNDANCE", "zipf1.5")
    RESULT["read_abundance"] = abundance

    def write_reads(path, n_reads, seed=3):
        rng = np.random.default_rng(seed)
        sids = list(genomes)
        if abundance.startswith("zipf"):
            s = float(abundance[4:] or 1.5)
            w = 1.0 / np.arange(1, len(sids) + 1, dtype=np.float64) ** s
            cdf = np.cumsum(w) / w.sum()
            gsel = np.searchsorted(cdf, rng.random(n_reads))
        else:
            gsel = rng.integers(len(sids), size=n_reads)
        starts = rng.integers(0, genome_len - read_len, size=n_reads)
        with open(path, "w") as f:
            chunk = []
            for i in range(n_reads):
                g = genomes[sids[gsel[i]]]
                s = starts[i]
                chunk.append(f">r{i}\n{g[s:s+read_len]}\n")
                if len(chunk) == 65536:
                    f.write("".join(chunk))
                    chunk = []
            f.write("".join(chunk))

    td_ctx = tempfile.TemporaryDirectory()
    td = td_ctx.name
    warm_path = os.path.join(td, "warm.fa")
    reads_path = os.path.join(td, "bench_reads.fa")
    write_reads(warm_path, n_warm_reads, seed=5)
    write_reads(reads_path, n_bench_reads)

    def run_mode(c, tag, timed_passes=2):
        sink = open(os.devnull, "w")
        t_w = time.time()
        c.run([warm_path], kraken_fh=sink)  # compiles + link ramp
        print(f"pipeline [{tag}] warmup ({n_warm_reads} reads): "
              f"{time.time()-t_w:.2f}s", file=sys.stderr)
        per_pass = []
        for i in range(timed_passes):
            c.reset_counters()
            t0 = time.time()
            c.run([reads_path], kraken_fh=sink)
            dt = time.time() - t0
            per_pass.append(dt)
            print(f"pipeline [{tag}] pass {i}: {dt:.2f}s "
                  f"({n_bench_reads/dt:,.0f} reads/s)", file=sys.stderr)
        rep = io.StringIO()
        t_r = time.time()
        c.write_report(rep)
        rep_s = time.time() - t_r
        print(f"  report {rep_s:.2f}s", file=sys.stderr)
        if c.dev_counters is not None and c.dev_counters.tracker is not None:
            RESULT[f"{tag}_sparse_overflow_spans"] = c.dev_counters.tracker.overflows
        best = n_bench_reads / min(per_pass)
        RESULT[f"{tag}_pass_s"] = [round(x, 2) for x in per_pass]
        RESULT[f"{tag}_report_s"] = round(rep_s, 2)
        RESULT[f"{tag}_reads_per_s"] = round(best, 1)
        print(f"pipeline [{tag}]: {best:,.0f} reads/s", file=sys.stderr)
        return best

    # ---- stage: exact-compat host accumulation (FIRST: its programs
    # compile in ~1-2 min where the fused counter program takes 5-10, so a
    # timed-out run still records a headline) ----------------------------
    c_exact = Classifier.with_shared_db(
        c_dc, ClassifyOptions(print_progress=False)
    )
    ec_rps = run_mode(c_exact, "exact_compat", timed_passes=2)
    RESULT["exact_compat_reads_per_s"] = round(ec_rps, 1)
    RESULT["value"] = round(ec_rps, 1)
    RESULT["vs_baseline"] = round(ec_rps / BASELINE_READS_PER_S, 3)
    RESULT["mode"] = "exact_compat (host accumulation, bit-exact)"
    emit("exact_compat")

    # ---- stage: device-counters (bit-exact fast mode) --------------------
    dc_rps = run_mode(c_dc, "device_counters")
    # both accumulation modes are bit-exact (identical outputs/reports);
    # the headline is whichever ran faster this session
    if dc_rps > ec_rps:
        RESULT["value"] = round(dc_rps, 1)
        RESULT["vs_baseline"] = round(dc_rps / BASELINE_READS_PER_S, 3)
        RESULT["mode"] = "device_counters (bit-exact, sparse tracking on)"
    emit("device_counters")

    # ---- stage: device-step microbench with phase breakdown --------------
    phases, lookups_per_s, probe_gbps, _lanes = phase_microbench(
        c_dc, genomes, batch, read_len, k, reps,
        emit_windows=lambda: emit("microbench_windows"),
    )
    RESULT.update(
        device_step_lookups_per_s=round(lookups_per_s, 1),
        probe_achieved_gbps=round(probe_gbps, 2),
        hbm_peak_gbps=HBM_PEAK_GBPS,
        phase_ms={p: round(v, 2) for p, v in phases.items()},
    )
    emit("microbench")

    # ---- stage: byte-equality ON THIS DEVICE (VERDICT r3 #2) -------------
    # All byte-exactness tests run on the CPU mesh; this proves it on the
    # bench hardware itself. (a) exact-compat and device-counters classify
    # the same reads in-process: kraken output and report strings must be
    # identical. (b) the committed golden fixture (outputs of the reference
    # C++ binaries) classifies on this chip and must reproduce kraken.out +
    # report.tsv byte-for-byte (modulo the fixture's CPU-built .counts).
    if os.environ.get("BENCH_BYTE_EQ", "1") != "0":
        eq_n = int(os.environ.get("BENCH_EQ_READS", 131072))
        eq_path = os.path.join(td, "eq_reads.fa")
        write_reads(eq_path, eq_n, seed=11)
        outs, reps_ = {}, {}
        for tag, cc in (("exact_compat", c_exact), ("device_counters", c_dc)):
            cc.reset_counters()
            kb, rb = io.StringIO(), io.StringIO()
            cc.run([eq_path], kraken_fh=kb)
            cc.write_report(rb)
            outs[tag], reps_[tag] = kb.getvalue(), rb.getvalue()
        same = (
            outs["exact_compat"] == outs["device_counters"]
            and reps_["exact_compat"] == reps_["device_counters"]
        )
        RESULT["modes_byte_equal"] = bool(same)
        print(
            f"byte-equality on device ({eq_n} reads): exact_compat vs "
            f"device_counters kraken+report {'IDENTICAL' if same else 'DIFFER'}",
            file=sys.stderr,
        )
        emit("modes_byte_eq")

        gold = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tests", "golden", "data"
        )
        if os.path.exists(os.path.join(gold, "kraken.out")):
            cg = Classifier([gold], ClassifyOptions(print_progress=False))
            kb, rb = io.StringIO(), io.StringIO()
            cg.run([os.path.join(gold, "reads.fa")], kraken_fh=kb)
            cg.write_report(rb)
            with open(os.path.join(gold, "kraken.out")) as f:
                want_k = f.read()
            with open(os.path.join(gold, "report.tsv")) as f:
                want_r = f.read()
            ok = kb.getvalue() == want_k and rb.getvalue() == want_r
            RESULT["tpu_golden_ok"] = bool(ok)
            print(
                "golden fixture on device: reference kraken.out+report.tsv "
                + ("REPRODUCED byte-for-byte" if ok else "MISMATCH"),
                file=sys.stderr,
            )
            del cg
            emit("tpu_golden")

    # ---- stage: out-of-core streaming at scale (--preload-size) ----------
    # The reference's own table records chunked classification at 1.9-3.4x
    # the --preload wall time (paper.md:126-136). Same datapoint here: a
    # budget forcing >=3 chunk tables streamed through HBM per span group.
    # Gated on elapsed time: chunk-table build+compiles are minutes cold.
    ooc_deadline = float(os.environ.get("BENCH_OOC_DEADLINE_S", 1800))
    if (
        os.environ.get("BENCH_OOC", "1") != "0"
        and time.time() - t_start < ooc_deadline
    ):
        table_b = (1 << c_dc.dbs[0].hash_lb) * 16
        try:
            c_ooc = Classifier(
                [db_dir],
                ClassifyOptions(print_progress=False, preload_size=table_b // 3),
            )
        except ValueError:
            c_ooc = None  # budget below the minimum chunk table (tiny DBs)
        if c_ooc is not None and c_ooc._ooc is not None:
            RESULT["ooc_chunks"] = c_ooc._ooc[0].n_chunks
            n_ooc_reads = max(n_warm_reads, n_bench_reads // 4)
            ooc_reads_path = os.path.join(td, "ooc_reads.fa")
            write_reads(ooc_reads_path, n_ooc_reads)
            sink = open(os.devnull, "w")
            t_w = time.time()
            c_ooc.run([warm_path], kraken_fh=sink)
            print(f"pipeline [ooc] warmup: {time.time()-t_w:.2f}s", file=sys.stderr)
            # split the chunk-table stream cost from the probe compute
            # (VERDICT r4 weak #3: the 8.9x ooc_vs_resident figure was not
            # decomposable from the artifact). A pure blocking upload pass
            # over every chunk table measures what the double-buffer must
            # hide per table pass on THIS session's link.
            t_up = time.time()
            for _planes in c_ooc._ooc[0].chunk_planes:
                jax.block_until_ready(tuple(jax.device_put(p) for p in _planes))
            RESULT["ooc_chunk_upload_s"] = round(time.time() - t_up, 2)
            c_ooc.reset_counters()
            t0 = time.time()
            c_ooc.run([ooc_reads_path], kraken_fh=sink)
            dt = time.time() - t0
            RESULT["ooc_run_s"] = round(dt, 2)
            RESULT["ooc_reads_per_s"] = round(n_ooc_reads / dt, 1)
            RESULT["ooc_vs_resident"] = round(
                RESULT["value"] / (n_ooc_reads / dt), 2
            )
            print(
                f"pipeline [ooc, {RESULT['ooc_chunks']} chunks]: "
                f"{n_ooc_reads/dt:,.0f} reads/s "
                f"({RESULT['ooc_vs_resident']}x slower than resident; the "
                f"reference's own chunked mode ran 1.9-3.4x slower)",
                file=sys.stderr,
            )
            del c_ooc
            emit("ooc")

    # ---- stage: value-pool FALLBACK shape (VERDICT r2 #7) ----------------
    # A database whose LCA-closed value set exceeds u16 cannot use the value
    # pool: the table stores dense taxonomy ids and every span builds a
    # local taxon dictionary on device (device_step.py local_dict). Measure
    # that path's end-to-end rate by forcing value_pool off on the same DB
    # (the id space is what changes, not the data).
    # c_exact shares c_dc's device planes (with_shared_db): drop it HERE,
    # unconditionally, or the large stage's `del c_dc` could not free the
    # table before uploading the ~9 GB large one on a 16 GB part.
    del c_exact
    if os.environ.get("BENCH_POOL_FALLBACK", "1") != "0":
        t_fb = time.time()
        c_fb = Classifier(
            [db_dir],
            ClassifyOptions(print_progress=False, value_pool=False),
        )
        print(
            f"fallback (dense ids + local_dict) load+build+upload "
            f"{time.time()-t_fb:.1f}s",
            file=sys.stderr,
        )
        assert c_fb._pool is None
        assert c_fb._cfg.local_dict or tax_nodes <= 0xFFFF
        fb_rps = run_mode(c_fb, "pool_fallback", timed_passes=1)
        RESULT["pool_fallback_reads_per_s"] = round(fb_rps, 1)
        emit("pool_fallback")
        del c_fb

    # ---- stage: HBM-full-scale block (VERDICT r4 item 2) -----------------
    # 460M keys => lb=29, an ~9 GB CHD table on the 16 GB part -- the same
    # per-chip shard size class as the §12 scaling model's multi-chip
    # projection: validates the gather-cost-class assumption AT that size
    # and measures OOC at a realistic chunk count with the upload/probe
    # split. (1G keys quantizes to lb=30 = an 18 GB table: measured
    # RESOURCE_EXHAUSTED on this 16 GB part.) Heavy (table build is cached;
    # upload is ~GBs over this link), so gated by elapsed time and
    # BENCH_LARGE=0; errors in this stage are recorded, not fatal -- the
    # nine preceding stages' record must survive an HBM OOM here.
    large_deadline = float(os.environ.get("BENCH_LARGE_DEADLINE_S", 7200))
    large_ballast = int(os.environ.get("BENCH_LARGE_BALLAST", 460_000_000))
    if (
        os.environ.get("BENCH_LARGE", "1") != "0"
        and large_ballast > ballast
        and time.time() - t_start < large_deadline
    ):
        import gc

        try:
            del c_dc
        except NameError:
            pass
        gc.collect()
        try:
            _run_large_stage(large_ballast, large_deadline, t_start,
                             n_species, genome_len, k, nt, pad_nodes,
                             batch, read_len, reps, run_mode, write_reads,
                             td, emit)
        except Exception as e:  # record, don't kill the 9-stage record
            RESULT["large_error"] = f"{type(e).__name__}: {e}"[:500]
            print(f"LARGE stage failed: {e}", file=sys.stderr)
            emit("large_error")
    td_ctx.cleanup()


def _run_large_stage(large_ballast, large_deadline, t_start, n_species,
                     genome_len, k, nt, pad_nodes, batch, read_len, reps,
                     run_mode, write_reads, td, emit):
    """The HBM-full-scale measurements; see the call site for gating."""
    import gc
    import jax

    from krakenuniq_tpu.classify import Classifier, ClassifyOptions

    db_dir_lg, genomes_lg, n_keys_lg = ensure_db_dir(
        n_species, genome_len, k, nt, pad_nodes, large_ballast
    )
    t_load = time.time()
    c_lg = Classifier([db_dir_lg], ClassifyOptions(print_progress=False))
    load_lg = time.time() - t_load
    table_gb_lg = (
        sum(int(np.prod(p.shape)) * 4 for p in c_lg._db_planes[0]) / 1e9
    )
    LG = {
        "db_keys": n_keys_lg,
        "hash_lb": c_lg.dbs[0].hash_lb,
        "table_gb": round(table_gb_lg, 2),
        "load_upload_s": round(load_lg, 1),
    }
    RESULT["large"] = LG
    print(
        f"LARGE stage: {n_keys_lg/1e6:.0f}M keys, lb={LG['hash_lb']} "
        f"({table_gb_lg:.2f} GB table), load+upload {load_lg:.0f}s",
        file=sys.stderr,
    )
    ph, lps, pgbps, lanes_lg = phase_microbench(
        c_lg, genomes_lg, batch, read_len, k, reps
    )
    LG["phase_ms"] = {p: round(v, 2) for p, v in ph.items()}
    LG["probe_ns_per_row"] = round(ph["probe_ms"] * 1e6 / lanes_lg, 2)
    LG["device_step_lookups_per_s"] = round(lps, 1)
    emit("large_phase")
    lg_rps = run_mode(c_lg, "large_exact_compat", timed_passes=1)
    LG["reads_per_s"] = round(lg_rps, 1)
    emit("large_pipeline")

    if (
        os.environ.get("BENCH_LARGE_OOC", "1") != "0"
        and time.time() - t_start < large_deadline
    ):
        del c_lg
        gc.collect()
        table_b = (1 << LG["hash_lb"]) * 16
        try:
            c_lgo = Classifier(
                [db_dir_lg],
                ClassifyOptions(
                    print_progress=False, preload_size=table_b // 4
                ),
            )
        except ValueError:
            c_lgo = None
        if c_lgo is not None and c_lgo._ooc is not None:
            LG["ooc_chunks"] = c_lgo._ooc[0].n_chunks
            t_up = time.time()
            for _planes in c_lgo._ooc[0].chunk_planes:
                jax.block_until_ready(
                    tuple(jax.device_put(p) for p in _planes)
                )
            LG["ooc_chunk_upload_s"] = round(time.time() - t_up, 2)
            n_lg_ooc = batch  # one span through the full chunk stream
            p_ooc = os.path.join(td, "lg_ooc.fa")
            write_reads(p_ooc, n_lg_ooc)
            sink = open(os.devnull, "w")
            c_lgo.run([p_ooc], kraken_fh=sink)  # warm/compile
            c_lgo.reset_counters()
            t0 = time.time()
            c_lgo.run([p_ooc], kraken_fh=sink)
            dt = time.time() - t0
            LG["ooc_run_s"] = round(dt, 2)
            LG["ooc_reads_per_s"] = round(n_lg_ooc / dt, 1)
            del c_lgo
    emit("large")


if __name__ == "__main__":
    main()

"""Multi-host (DCN) classification: deterministic span-interleaved input
sharding, serialized counter-state fold, manifest-ordered output merge, and
the jax.distributed bring-up -- byte-equal to the single-host run.

SURVEY §5: "ICI for intra-slice, DCN for cross-host input sharding"; the
cross-host merge mirrors the reference's per-worker temp-file merge
(classify.cpp:390-485)."""

import io
import json
import multiprocessing as mp
import os
import subprocess
import sys

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "golden", "data")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "kraken.out")),
    reason="golden fixture missing",
)


def _single_host(reads, **kw):
    from krakenuniq_tpu.classify import Classifier, ClassifyOptions

    c = Classifier([DATA], ClassifyOptions(print_progress=False, **kw))
    out, rep = io.StringIO(), io.StringIO()
    c.run([reads], kraken_fh=out)
    c.write_report(rep)
    return out.getvalue(), rep.getvalue()


def _tiny_budget():
    from krakenuniq_tpu.db.chunked import table_bytes
    from krakenuniq_tpu.formats.kdb import read_header
    from krakenuniq_tpu.taxonomy import Taxonomy

    tax = Taxonomy.from_taxdb_file(os.path.join(DATA, "taxDB"))
    hdr = read_header(os.path.join(DATA, "database.kdb"))
    return max(1024, table_bytes(hdr.key_ct, tax.size - 1, False) // 4)


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"device_counters": True},
        {"exact": True},
        {"preload_size": "tiny"},
    ],
)
def test_multihost_merge_equals_single(tmp_path, kw):
    """2-way span sharding: merged kraken output and the folded report are
    byte-identical to the single-host run — every accumulation mode plus
    the out-of-core chunk engine."""
    if kw.get("preload_size") == "tiny":
        kw = {**kw, "preload_size": _tiny_budget()}
    from krakenuniq_tpu.classify import Classifier, ClassifyOptions
    from krakenuniq_tpu.parallel.multihost import (
        merge_counts,
        merge_kraken_outputs,
    )
    from krakenuniq_tpu.report import TaxReport, DEFAULT_COLS

    reads = os.path.join(DATA, "reads.fa")
    parts = []
    merged_counts = {}
    hosts = []
    # work_unit_size small enough that the fixture yields multiple spans
    for hid in range(2):
        c = Classifier(
            [DATA],
            ClassifyOptions(
                print_progress=False, host_id=hid, n_hosts=2,
                work_unit_size=2000, device_batch_reads=64, **kw
            ),
        )
        kp = tmp_path / f"k{hid}.out"
        with open(kp, "w") as fh:
            c.run([reads], kraken_fh=fh)
        assert c.span_manifest, "multi-host runs must record a span manifest"
        parts.append((str(kp), c.span_manifest))
        merge_counts(merged_counts, c.finalized_counts())
        hosts.append(c)

    # the two hosts processed disjoint, complete span sets
    span_ids = sorted(i for _p, m in parts for i, _a, _b in m)
    assert span_ids == list(range(len(span_ids)))

    merged = tmp_path / "merged.out"
    merge_kraken_outputs(str(merged), parts)
    # the single-host reference must use the same span geometry
    k0b, _ = _single_host(
        reads, work_unit_size=2000, device_batch_reads=64, **kw
    )
    assert merged.read_text() == k0b

    hosts[0].ensure_counts_files()
    rep = TaxReport(hosts[0].taxonomy, merged_counts)
    rep.set_cols(DEFAULT_COLS)
    buf = io.StringIO()
    rep.write(buf)
    # single-host report at the same span geometry
    from krakenuniq_tpu.classify import Classifier as C2, ClassifyOptions as O2

    c_ref = C2(
        [DATA],
        O2(print_progress=False, work_unit_size=2000, device_batch_reads=64, **kw),
    )
    ref_out = io.StringIO()
    c_ref.run([reads], kraken_fh=ref_out)
    ref_rep = io.StringIO()
    c_ref.write_report(ref_rep)
    assert buf.getvalue() == ref_rep.getvalue()


def test_multihost_composes_with_mesh(tmp_path):
    """Cross-host span sharding composes with the per-host chip mesh (the
    hosts x chips structure of SURVEY §5): 2 hosts, each driving a 1x2
    minimizer-sharded mesh, merge byte-equal to the single-host single-chip
    run at the same span geometry."""
    from krakenuniq_tpu.classify import Classifier, ClassifyOptions
    from krakenuniq_tpu.parallel.multihost import merge_counts, merge_kraken_outputs
    from krakenuniq_tpu.report import TaxReport, DEFAULT_COLS

    reads = os.path.join(DATA, "reads.fa")
    geo = {"work_unit_size": 2000, "device_batch_reads": 64}
    parts, merged_counts, first = [], {}, None
    for hid in range(2):
        c = Classifier(
            [DATA],
            ClassifyOptions(
                print_progress=False, host_id=hid, n_hosts=2,
                mesh_data=1, mesh_db=2, **geo
            ),
        )
        kp = tmp_path / f"k{hid}.out"
        with open(kp, "w") as fh:
            c.run([reads], kraken_fh=fh)
        parts.append((str(kp), c.span_manifest))
        merge_counts(merged_counts, c.finalized_counts())
        first = first or c
    merged = tmp_path / "merged.out"
    merge_kraken_outputs(str(merged), parts)
    k_ref, _ = _single_host(reads, **geo)
    assert merged.read_text() == k_ref
    first.ensure_counts_files()
    rep = TaxReport(first.taxonomy, merged_counts)
    rep.set_cols(DEFAULT_COLS)
    buf = io.StringIO()
    rep.write(buf)
    c_ref = Classifier([DATA], ClassifyOptions(print_progress=False, **geo))
    c_ref.run([reads])
    ref_rep = io.StringIO()
    c_ref.write_report(ref_rep)
    assert buf.getvalue() == ref_rep.getvalue()


def test_multihost_state_roundtrip(tmp_path):
    """Counter-state files reload to equal counts (HLL sparse/dense, exact
    sets, and plain counters)."""
    from krakenuniq_tpu.classify import Classifier, ClassifyOptions
    from krakenuniq_tpu.parallel.multihost import (
        load_counter_state,
        save_counter_state,
    )

    reads = os.path.join(DATA, "reads.fa")
    c = Classifier([DATA], ClassifyOptions(print_progress=False))
    c.run([reads])
    counts = c.finalized_counts()
    p = tmp_path / "state.bin"
    save_counter_state(str(p), counts)
    back = load_counter_state(str(p))
    assert set(back) == set(counts)
    for t in counts:
        assert back[t].n_reads == counts[t].n_reads
        assert back[t].n_kmers == counts[t].n_kmers
        a, b = counts[t].kmers, back[t].kmers
        if a is None or getattr(a, "n_observed", 1) == 0 and not hasattr(a, "kmers"):
            continue
        if hasattr(a, "sparse"):
            assert a.sparse == b.sparse
            np.testing.assert_array_equal(a.sparse_set, b.sparse_set)
            if a.M is not None:
                np.testing.assert_array_equal(a.M, b.M)
            assert a.n_observed == b.n_observed
        else:
            np.testing.assert_array_equal(a.kmers, b.kmers)


def _run_cli(extra, out, rep, reads, env):
    r = subprocess.run(
        [sys.executable, "-m", "krakenuniq_tpu.cli.main", "--db", DATA,
         reads, "--output", out, "--report-file", rep] + extra,
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]


def test_multihost_cli_auto_collect(tmp_path):
    """Default flow: the SAME command on every host; host 0 rendezvouses on
    the peer .done markers and merges kraken segments + counter states
    itself -- merged output and report body equal the single-host CLI run."""
    reads = os.path.join(DATA, "reads.fa")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # before interpreter start: sitecustomize honors it

    s_out, s_rep = str(tmp_path / "s.out"), str(tmp_path / "s.tsv")
    _run_cli([], s_out, s_rep, reads, env)

    out, rep = str(tmp_path / "m.out"), str(tmp_path / "m.tsv")
    # identical command modulo the host id; host 1 first so host 0's
    # rendezvous finds its marker already down (sequential run order)
    _run_cli(["--multihost", "1/2"], out, rep, reads, env)
    _run_cli(["--multihost", "0/2"], out, rep, reads, env)

    assert open(out, "rb").read() == open(s_out, "rb").read()
    body = lambda p: [l for l in open(p) if not l.startswith("#")]
    assert body(rep) == body(s_rep)
    # markers consumed; per-host parts remain for inspection
    assert not os.path.exists(out + ".done0") and not os.path.exists(out + ".done1")
    assert os.path.exists(out + ".part0.manifest")


def test_multihost_cli_manual_collect(tmp_path):
    """--multihost-collect off: host 1 writes its own segment + state, then
    host 0 folds the counter states via --multihost-merge; the concatenated
    kraken segments (manifest order) equal the single-host CLI output."""
    reads = os.path.join(DATA, "reads.fa")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"

    s_out, s_rep = str(tmp_path / "s.out"), str(tmp_path / "s.tsv")
    _run_cli([], s_out, s_rep, reads, env)

    o1, r1 = str(tmp_path / "h1.out"), str(tmp_path / "h1.tsv")
    _run_cli(["--multihost", "1/2", "--multihost-collect", "off"], o1, r1, reads, env)
    o0, r0 = str(tmp_path / "h0.out"), str(tmp_path / "h0.tsv")
    _run_cli(
        ["--multihost", "0/2", "--multihost-collect", "off",
         "--multihost-merge", f"{r1}.state.1"],
        o0, r0, reads, env,
    )

    from krakenuniq_tpu.parallel.multihost import merge_kraken_outputs

    parts = []
    for p in (o0, o1):
        with open(p + ".manifest") as mf:
            parts.append((p, json.load(mf)))
    merged = tmp_path / "merged.out"
    merge_kraken_outputs(str(merged), parts)
    assert merged.read_bytes() == open(s_out, "rb").read()

    body = lambda p: [l for l in open(p) if not l.startswith("#")]
    assert body(r0) == body(s_rep)


def test_multihost_host_loss_recovery(tmp_path):
    """Elasticity: host 1 is KILLED mid-run; host 0's rendezvous times out
    with the lost host identified, then --multihost-recover auto re-runs the
    lost span share in-process and the merged output is byte-identical to
    the single-host run (the idempotent-artifact pattern, build_db.sh:116)."""
    import signal
    import time

    reads = os.path.join(DATA, "reads.fa")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"

    s_out, s_rep = str(tmp_path / "s.out"), str(tmp_path / "s.tsv")
    _run_cli([], s_out, s_rep, reads, env)

    out, rep = str(tmp_path / "m.out"), str(tmp_path / "m.tsv")
    # start host 1, then kill it before it can finish (mid-startup/run)
    p1 = subprocess.Popen(
        [sys.executable, "-m", "krakenuniq_tpu.cli.main", "--db", DATA,
         reads, "--output", out, "--report-file", rep, "--multihost", "1/2"],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    time.sleep(1.0)
    p1.send_signal(signal.SIGKILL)
    p1.wait()
    assert not os.path.exists(out + ".done1")

    # recover=off: host 0 fails fast (EX_TEMPFAIL) naming the lost host
    r = subprocess.run(
        [sys.executable, "-m", "krakenuniq_tpu.cli.main", "--db", DATA,
         reads, "--output", out, "--report-file", rep, "--multihost", "0/2",
         "--multihost-wait", "2", "--multihost-recover", "off"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 75
    assert "lost host 1" in r.stderr and "s % 2 == 1" in r.stderr
    assert "--multihost" in r.stderr  # recovery instructions

    # recover=auto (default): host 0 re-runs host 1's spans itself
    r = subprocess.run(
        [sys.executable, "-m", "krakenuniq_tpu.cli.main", "--db", DATA,
         reads, "--output", out, "--report-file", rep, "--multihost", "0/2",
         "--multihost-wait", "2"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Recovering lost host 1" in r.stderr
    assert open(out, "rb").read() == open(s_out, "rb").read()
    body = lambda p: [l for l in open(p) if not l.startswith("#")]
    assert body(rep) == body(s_rep)


def _dist_worker(pid, tmpdir):
    import traceback

    log = open(os.path.join(tmpdir, f"w{pid}.log"), "w")
    sys.stdout = sys.stderr = log
    try:
        from krakenuniq_tpu.parallel.multihost import initialize

        my_pid, nprocs = initialize(
            "127.0.0.1:29821", num_processes=2, process_id=pid, platform="cpu"
        )
        assert (my_pid, nprocs) == (pid, 2)
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devs = jax.devices()  # global device set across both processes
        assert len(devs) >= 2
        mesh = Mesh(np.array(devs).reshape(len(devs)), ("data",))
        x = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data")),
            np.full(len(jax.local_devices()), 1.0, np.float32),
        )
        s = jax.jit(lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P()))(x)
        total = float(np.asarray(s.addressable_shards[0].data))
        assert total == len(devs), total
        print("DIST_OK", pid, len(devs), flush=True)
    except Exception:
        traceback.print_exc()
    finally:
        log.flush()


def test_distributed_initialize_psum(tmp_path):
    """jax.distributed bring-up over 2 CPU processes (gloo): a psum over the
    GLOBAL device mesh executes across processes -- the DCN collective path
    deployments use for cross-host device-state merges."""
    ctx = mp.get_context("spawn")
    ps = [
        ctx.Process(target=_dist_worker, args=(i, str(tmp_path)))
        for i in range(2)
    ]
    [p.start() for p in ps]
    [p.join(timeout=240) for p in ps]
    for p in ps:
        if p.is_alive():
            p.terminate()
            pytest.fail("distributed worker hung")
    for i in range(2):
        log = open(tmp_path / f"w{i}.log").read()
        assert f"DIST_OK {i}" in log, log[-1500:]


def test_finalized_counts_do_not_alias_live_state(tmp_path):
    """finalized_counts() must return fresh objects: merging another host's
    state into the result (iadd in merge_counts) must not corrupt the
    classifier's own counter state for a later write_report."""
    from krakenuniq_tpu.classify import Classifier, ClassifyOptions
    from krakenuniq_tpu.parallel.multihost import merge_counts

    reads = os.path.join(DATA, "reads.fa")
    c = Classifier([DATA], ClassifyOptions(print_progress=False))
    c.run([reads])
    rep_before = io.StringIO()
    c.write_report(rep_before)

    merged = c.finalized_counts()
    other = c.finalized_counts()
    merge_counts(merged, other)  # doubles every count IN `merged`
    # ... and `other`'s objects must not have been captured by reference
    merge_counts(merged, other)

    rep_after = io.StringIO()
    c.write_report(rep_after)
    assert rep_after.getvalue() == rep_before.getvalue()


def test_merge_counts_does_not_mutate_other():
    """First-insert entries are copies: folding twice from the same source
    dict must exactly double, not compound."""
    from krakenuniq_tpu.hll.hll import HLL, ReadCounts
    from krakenuniq_tpu.parallel.multihost import merge_counts

    def one():
        k = HLL(12)
        k.insert_items(np.asarray([7, 9], np.uint64))
        rc = ReadCounts(k)
        rc.n_reads = 3
        rc.n_kmers = 5
        return {42: rc}

    src = one()
    into = merge_counts({}, src)
    assert src[42].n_reads == 3  # untouched
    merge_counts(into, src)
    assert into[42].n_reads == 6 and src[42].n_reads == 3


def test_dense_resolve_capacity_guard():
    """2*T > 2^28 would corrupt the packed i32 Euler event keys; the guard
    must reject it on every dense-mode entry path."""
    from krakenuniq_tpu.classify.pipeline import _check_dense_resolve_capacity

    _check_dense_resolve_capacity(1 << 27)  # 2*T == 2^28: still exact
    with pytest.raises(ValueError, match="dense-mode tree resolution"):
        _check_dense_resolve_capacity((1 << 27) + 1)


@pytest.mark.parametrize(
    "kw,uid",
    [
        ({}, False),
        ({"preload_size": "tiny"}, False),
        ({}, True),
        ({"device_counters": True}, True),
    ],
)
def test_multihost_4way_matrix(tmp_path, kw, uid):
    """4-host span sharding across the remaining mode matrix (OOC and UID
    included): merged kraken output and folded report byte-identical to the
    single-host run at the same span geometry."""
    if kw.get("preload_size") == "tiny":
        kw = {**kw, "preload_size": _tiny_budget()}
    from krakenuniq_tpu.classify import Classifier, ClassifyOptions
    from krakenuniq_tpu.parallel.multihost import (
        merge_counts,
        merge_kraken_outputs,
    )
    from krakenuniq_tpu.report import TaxReport, DEFAULT_COLS

    reads = os.path.join(DATA, "reads.fa")
    geo = {"work_unit_size": 1000, "device_batch_reads": 32}
    n_hosts = 4
    parts, merged_counts, hosts = [], {}, []
    for hid in range(n_hosts):
        c = Classifier(
            [DATA],
            ClassifyOptions(
                print_progress=False, host_id=hid, n_hosts=n_hosts, **geo, **kw
            ),
            uid_database=uid,
        )
        kp = tmp_path / f"k{hid}.out"
        with open(kp, "w") as fh:
            c.run([reads], kraken_fh=fh)
        parts.append((str(kp), c.span_manifest))
        merge_counts(merged_counts, c.finalized_counts())
        hosts.append(c)

    span_ids = sorted(i for _p, m in parts for i, _a, _b in m)
    assert span_ids == list(range(len(span_ids)))
    assert len({i for _p, m in parts if m for i, _a, _b in m}) >= n_hosts

    merged = tmp_path / "merged.out"
    merge_kraken_outputs(str(merged), parts)

    c_ref = Classifier(
        [DATA], ClassifyOptions(print_progress=False, **geo, **kw),
        uid_database=uid,
    )
    ref_out, ref_rep = io.StringIO(), io.StringIO()
    c_ref.run([reads], kraken_fh=ref_out)
    c_ref.write_report(ref_rep)
    assert merged.read_text() == ref_out.getvalue()

    hosts[0].ensure_counts_files()
    rep = TaxReport(hosts[0].taxonomy, merged_counts)
    rep.set_cols(DEFAULT_COLS)
    buf = io.StringIO()
    rep.write(buf)
    assert buf.getvalue() == ref_rep.getvalue()

"""Native (C++) host path vs pure-Python path: identical outputs, including
across chunk boundaries and work-unit splits."""

import io
import os

import numpy as np
import pytest

from krakenuniq_tpu.classify import Classifier, ClassifyOptions
from krakenuniq_tpu.classify import pipeline as plmod

DATA = os.path.join(os.path.dirname(__file__), "golden", "data")

pytestmark = pytest.mark.skipif(
    plmod._native is None or not os.path.exists(os.path.join(DATA, "kraken.out")),
    reason="native extension or fixture missing",
)


def run(reads_path, use_native, work_unit_size=500_000, chunk_bytes=None):
    old_chunk = plmod._CHUNK_BYTES
    if chunk_bytes:
        plmod._CHUNK_BYTES = chunk_bytes
    try:
        c = Classifier(
            [DATA],
            ClassifyOptions(
                print_progress=False, use_native=use_native, work_unit_size=work_unit_size
            ),
        )
        kraken, cls, uncls = io.StringIO(), io.StringIO(), io.StringIO()
        c.run([reads_path], kraken_fh=kraken, classified_fh=cls, unclassified_fh=uncls)
        rep = io.StringIO()
        c.write_report(rep)
        return kraken.getvalue(), cls.getvalue(), uncls.getvalue(), rep.getvalue()
    finally:
        plmod._CHUNK_BYTES = old_chunk


@pytest.mark.parametrize("reads", ["reads.fa", "reads.fq"])
def test_native_equals_python(reads):
    path = os.path.join(DATA, reads)
    a = run(path, use_native=True)
    b = run(path, use_native=False)
    assert a == b


def test_native_small_chunks_and_units():
    """Tiny byte chunks + tiny work units stress carry/boundary logic."""
    path = os.path.join(DATA, "reads.fq")
    a = run(path, use_native=True, work_unit_size=2000, chunk_bytes=4096)
    b = run(path, use_native=False, work_unit_size=2000)
    assert a == b


def test_native_multiline_fasta_fallback(tmp_path):
    """Multi-line FASTA goes through the slow path transparently."""
    src = open(os.path.join(DATA, "reads.fa")).read().splitlines()
    out = tmp_path / "multiline.fa"
    with open(out, "w") as f:
        for line in src:
            if line.startswith(">"):
                f.write(line + "\n")
            else:
                for i in range(0, len(line), 37):
                    f.write(line[i : i + 37] + "\n")
    a = run(str(out), use_native=True)
    b = run(str(out), use_native=False)
    assert a == b
    # and the single-line parse of the same reads agrees
    c = run(os.path.join(DATA, "reads.fa"), use_native=True)
    assert a == c


def test_parser_truncated_inputs():
    """Chunk boundaries can truncate records arbitrarily; the parser must
    never read out of bounds (regression: segfault on header-without-newline)."""
    nv = plmod._native
    cases = [
        (b">r1\nACGT", False),
        (b">r1", False),
        (b">", False),
        (b">r1\nACGT\n>r2", False),
        (b"@q\nACGT\n+\nIIII", True),
        (b"@q\nACGT\n+", True),
        (b"@q\nACGT", True),
        (b"@q", True),
        (b"", False),
    ]
    for buf, fq in cases:
        n, offs, multi = nv.parse_unit(buf, fq)
        # offsets must stay within the buffer
        for i in range(n):
            for off, ln in ((offs[i, 0], offs[i, 1]), (offs[i, 2], offs[i, 3]),
                            (offs[i, 4], abs(offs[i, 5])), (offs[i, 6], offs[i, 7])):
                assert 0 <= off <= len(buf)
                assert 0 <= off + ln <= len(buf), (buf, i)


def test_encode_unit_packed_matches_unpacked():
    """encode_unit_packed + device unpack == encode_unit byte-for-byte,
    including ambiguous bases, lowercase, and padding lanes."""
    import jax

    from krakenuniq_tpu.classify.device_step import unpack_input

    nv = plmod._native
    buf = b">r1\nACGTNacgtNNRYKM\n>r2\nTTTT\n>r3\n" + b"ACGTA" * 40 + b"\n"
    n, offs, multi = nv.parse_unit(buf, False)
    assert n == 3 and not multi
    lb, batch = 224, 8
    codes, ambig, lengths = nv.encode_unit(buf, offs, lb, batch)
    pc, pa, plen = nv.encode_unit_packed(buf, offs, lb, batch)
    assert pc.shape == (batch, lb // 16) and pa.shape == (batch, lb // 32)
    np.testing.assert_array_equal(lengths, plen)
    ucodes, uambig = jax.jit(unpack_input)(pc, pa)
    np.testing.assert_array_equal(np.asarray(ucodes), codes)
    np.testing.assert_array_equal(np.asarray(uambig), ambig)
    with pytest.raises(ValueError):
        nv.encode_unit_packed(buf, offs, 100, batch)  # lb % 32 != 0


def test_tail_span_fetch_slice(tmp_path):
    """A span whose read count rounds below its padded height bucket takes
    the device-side sliced fetch (pipeline._start_native_span); outputs must
    match the pure-Python path. 17k reads -> bucket 32768, fetch 24576."""
    src = open(os.path.join(DATA, "library.fna")).read().splitlines()
    genome = "".join(l for l in src if not l.startswith(">"))
    rng = np.random.default_rng(7)
    path = tmp_path / "many.fa"
    n = 17_000
    starts = rng.integers(0, max(1, len(genome) - 60), size=n)
    with open(path, "w") as f:
        f.write(
            "".join(f">m{i}\n{genome[starts[i]:starts[i]+60]}\n" for i in range(n))
        )
    a = run(str(path), use_native=True)
    b = run(str(path), use_native=False)
    assert a == b


def test_extract_kmer_bins_matches_numpy_oracle():
    """The native rolling scanner (canonical k-mers + deque sliding-window
    minimizer, kuniq_native.extract_kmer_bins) is bit-identical to the
    numpy shift-cascade + window-min oracle, including ambiguity poisoning,
    lowercase bases, and short/edge sequences."""
    from krakenuniq_tpu._native_build import ensure_native
    from krakenuniq_tpu.build.db_build import extract_canonical_kmers
    from krakenuniq_tpu.utils.bits import INDEX2_XOR_MASK, bin_key

    nat = ensure_native()
    if nat is None or not hasattr(nat, "extract_kmer_bins"):
        pytest.skip("native extension unavailable")
    rng = np.random.default_rng(42)
    alphabet = np.frombuffer(b"ACGTNacgtn-X", dtype=np.uint8)
    cases = [
        b"",
        b"ACGT",  # shorter than k
        b"A" * 40,
        b"N" * 40,
        bytes(alphabet[rng.integers(0, len(alphabet), size=5000)]),
        bytes(alphabet[rng.integers(0, 4, size=5000)]),  # clean ACGT
    ]
    for k, nt in ((31, 15), (31, 12), (21, 7), (5, 3)):
        for raw in cases:
            ks, bs, cnt = nat.extract_kmer_bins(raw, k, nt, int(INDEX2_XOR_MASK))
            ks, bs = ks[:cnt], bs[:cnt]
            want_k = extract_canonical_kmers(raw, k)
            np.testing.assert_array_equal(ks, want_k)
            np.testing.assert_array_equal(bs, bin_key(want_k, k, nt))

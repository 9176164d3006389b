"""Full simulated-read accuracy loop (the reference's
tests/test-on-simulated-reads.sh:30-53, offline): simulate reads from the
fixture library with truth encoded in the read name, classify, grade, and
check sensitivity/precision. When the compiled reference binaries are
present (.golden-build, built by tests/golden/regen.sh), the same reads are
also driven through the reference classify + grade_classification for a
differential check."""

import os
import subprocess

import pytest

DATA = os.path.join(os.path.dirname(__file__), "golden", "data")
REFBIN = os.path.join(os.path.dirname(__file__), "..", ".golden-build", "src")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "library.fna")),
    reason="golden fixture missing",
)


def run_loop(tmp_path, error_rate, n_reads=400, seed=3):
    from krakenuniq_tpu.report.accuracy import simulate_and_grade

    return simulate_and_grade(
        DATA,
        str(tmp_path),
        library_fastas=[os.path.join(DATA, "library.fna")],
        n_reads=n_reads,
        read_len=100,
        error_rate=error_rate,
        seed=seed,
    )


def test_simulated_reads_error_free(tmp_path):
    stats, files = run_loop(tmp_path, error_rate=0.0)
    assert stats["total_reads"] == 400
    # error-free library substrings: essentially everything classified and
    # correct at species level; some reads LCA up at shared k-mer blocks
    assert stats["unidentified"] <= 4
    # the fixture genomes share sequence blocks, so a fraction of reads
    # legitimately LCA up to genus or higher (measured: 88.75% at species)
    assert stats["sensitivity"]["species"] >= 85.0
    assert stats["precision"]["species"] >= 99.0
    assert stats["sensitivity"]["genus"] >= stats["sensitivity"]["species"]
    # stats file has both read-level and taxon-level sections
    text = open(files["stats"]).read()
    assert text.count("#rank") == 2


def test_simulated_reads_with_errors(tmp_path):
    """2% substitution errors: k=21 k-mers survive often enough that
    sensitivity stays high and precision barely moves (the reference's
    claim that exact k-mer matching tolerates read error via the many
    windows per read)."""
    stats, _ = run_loop(tmp_path, error_rate=0.02)
    assert stats["sensitivity"]["species"] >= 75.0
    assert stats["precision"]["species"] >= 98.0


def test_simulated_strand_symmetry(tmp_path):
    """Reverse-complement reads classify identically (canonical k-mers)."""
    from krakenuniq_tpu.utils.simulate import simulate_reads
    from krakenuniq_tpu.formats.seqio import read_sequences
    import io

    from krakenuniq_tpu.classify import Classifier, ClassifyOptions

    seqs = {d.id: d.seq for d in read_sequences(os.path.join(DATA, "library.fna"))}
    fwd = simulate_reads(seqs, 50, read_len=100, seed=5, both_strands=False)
    from krakenuniq_tpu.utils.simulate import revcomp

    c = Classifier([DATA], ClassifyOptions(print_progress=False))

    def classify(reads):
        p = tmp_path / "r.fa"
        with open(p, "w") as f:
            for name, read in reads:
                f.write(f">{name}\n{read}\n")
        out = io.StringIO()
        c.run([str(p)], kraken_fh=out)
        return [l.split("\t")[2] for l in out.getvalue().splitlines()]

    calls_f = classify(fwd)
    calls_r = classify([(n, revcomp(r)) for n, r in fwd])
    assert calls_f == calls_r


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REFBIN, "classify")),
    reason="reference binaries not built (tests/golden/regen.sh)",
)
def test_differential_vs_reference(tmp_path):
    """The same simulated reads through the reference classify +
    grade_classification: kraken output byte-identical, grade stats agree
    on every count column (the per-read LCA-distance column is the
    documented deviation, VERDICT r2+)."""
    stats, files = run_loop(tmp_path, error_rate=0.01, n_reads=300, seed=11)

    ref_kraken = tmp_path / "ref.kraken.tsv"
    with open(ref_kraken, "w") as out:
        subprocess.run(
            [
                os.path.join(REFBIN, "classify"),
                "-d", os.path.join(DATA, "database.kdb"),
                "-i", os.path.join(DATA, "database.idx"),
                "-a", os.path.join(DATA, "taxDB"),
                "-p", "12",
                files["reads"],
            ],
            stdout=out,
            check=True,
        )
    assert open(files["kraken"]).read() == open(ref_kraken).read()

    # The reference grader CRASHES in its stats print at this fixture scale:
    # correct_reads_at_rank.at(rank) throws std::out_of_range for a rank no
    # read was ever judged at (here "assembly" -- the fixture has no
    # assembly-level nodes; grade_classification.cpp:188). The per-read
    # table it wrote before aborting is the comparable artifact; our
    # implementation fixes the crash (zero-filled counters).
    ref_grade = subprocess.run(
        [
            os.path.join(REFBIN, "grade_classification"),
            os.path.join(DATA, "taxDB"),
            os.path.join(DATA, "seqid2taxid.map"),
            str(ref_kraken),
            str(tmp_path / "ref.grade.tsv"),
        ],
        capture_output=True,
        text=True,
    )
    ref_rows = open(tmp_path / "ref.grade.tsv").read().splitlines()
    our_rows = open(files["per_read"]).read().splitlines()
    # the abort loses the tail of the reference's ofstream buffer and can
    # cut the last row mid-line; every complete row it flushed must match
    # ours exactly (all 9 columns, including the tree-distance column)
    ref_rows = ref_rows[:-1]
    assert len(ref_rows) >= 250
    assert our_rows[: len(ref_rows)] == ref_rows

#!/usr/bin/env python
"""Generate the golden differential-test fixture.

Builds a small synthetic library + taxonomy, constructs the database with the
COMPILED REFERENCE BINARIES (.golden-build/src), classifies a deterministic
read set with the reference classifier, and stores everything under
tests/golden/data/ for byte-comparison tests.

Run from the repo root:  python tests/golden/gen_fixture.py
(requires .golden-build/src binaries; see tests/golden/regen.sh)
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
BIN = os.path.join(REPO, ".golden-build", "src")
DATA = os.path.join(REPO, "tests", "golden", "data")

K, NT = 21, 7
HLL_P = 12

TAXONOMY = [
    # taxid, parent, rank, name
    (1, 1, "no rank", "root"),
    (2, 1, "superkingdom", "Bacteria"),
    (21, 2, "genus", "Genusalpha"),
    (211, 21, "species", "Genusalpha specone"),
    (212, 21, "species", "Genusalpha spectwo"),
    (22, 2, "genus", "Genusbeta"),
    (221, 22, "species", "Genusbeta specone"),
    (222, 22, "species", "Genusbeta spectwo"),
    (3, 1, "superkingdom", "Viruses"),
    (31, 3, "genus", "Virogenus"),
    (311, 31, "species", "Virogenus virone"),
]

BASES = np.array(list("ACGT"))


def rand_seq(rng, n):
    return "".join(BASES[rng.integers(0, 4, size=n)])


def mutate(rng, seq, rate=0.02):
    arr = np.array(list(seq))
    idx = np.flatnonzero(rng.random(len(arr)) < rate)
    arr[idx] = BASES[rng.integers(0, 4, size=len(idx))]
    return "".join(arr)


def revcomp(seq):
    return seq.translate(str.maketrans("ACGT", "TGCA"))[::-1]


def build_genomes(rng):
    shared_genus_a = rand_seq(rng, 400)  # shared within Genusalpha -> LCA 21
    shared_bact = rand_seq(rng, 300)  # shared across genera -> LCA 2
    genomes = {
        211: rand_seq(rng, 1500) + shared_genus_a + shared_bact,
        212: rand_seq(rng, 1400) + shared_genus_a,
        221: rand_seq(rng, 1600) + shared_bact,
        222: rand_seq(rng, 1300),
        311: rand_seq(rng, 900),
    }
    return genomes


def make_reads(rng, genomes):
    reads = []
    rid = 0
    taxa = list(genomes)
    for i in range(120):
        t = taxa[int(rng.integers(len(taxa)))]
        g = genomes[t]
        ln = int(rng.integers(60, 150))
        start = int(rng.integers(0, len(g) - ln))
        seq = g[start : start + ln]
        if i % 3 == 1:
            seq = mutate(rng, seq, 0.03)
        if i % 4 == 2:
            seq = revcomp(seq)
        if i % 10 == 5:  # sprinkle Ns
            pos = int(rng.integers(0, len(seq)))
            seq = seq[:pos] + "N" + seq[pos + 1 :]
        reads.append((f"read{rid}_tax{t}", seq))
        rid += 1
    for i in range(20):  # junk reads
        reads.append((f"junk{rid}", rand_seq(rng, int(rng.integers(60, 150)))))
        rid += 1
    reads.append(("tiny", "ACGTACGT"))  # shorter than k
    reads.append(("allN", "N" * 80))
    return reads


def write_dumps(tdir):
    os.makedirs(tdir, exist_ok=True)
    with open(os.path.join(tdir, "nodes.dmp"), "w") as f:
        for taxid, parent, rank, _ in TAXONOMY:
            f.write(f"{taxid}\t|\t{parent}\t|\t{rank}\t|\n")
    with open(os.path.join(tdir, "names.dmp"), "w") as f:
        for taxid, _, _, name in TAXONOMY:
            f.write(f"{taxid}\t|\t{name}\t|\t\t|\tscientific name\t|\n")


def main():
    os.makedirs(DATA, exist_ok=True)
    rng = np.random.default_rng(42)
    genomes = build_genomes(rng)

    lib_path = os.path.join(DATA, "library.fna")
    with open(lib_path, "w") as f:
        for t, g in genomes.items():
            f.write(f">seq_{t} simulated genome for taxid {t}\n")
            for i in range(0, len(g), 80):
                f.write(g[i : i + 80] + "\n")
    with open(os.path.join(DATA, "seqid2taxid.map"), "w") as f:
        for t in genomes:
            f.write(f"seq_{t}\t{t}\n")
    write_dumps(os.path.join(DATA, "taxonomy"))

    reads = make_reads(rng, genomes)
    with open(os.path.join(DATA, "reads.fa"), "w") as f:
        for rid, seq in reads:
            f.write(f">{rid} simulated\n{seq}\n")
    with open(os.path.join(DATA, "reads.fq"), "w") as f:
        for rid, seq in reads:
            f.write(f"@{rid} simulated\n{seq}\n+\n{'I' * len(seq)}\n")

    # --- jellyfish replacement: distinct canonical k-mers -> database.jdb
    from krakenuniq_tpu.formats import write_kdb
    from krakenuniq_tpu.utils import bits

    code = np.full(256, 255, np.uint8)
    for c, v in zip(b"ACGT", range(4)):
        code[c] = v
    chunks = []
    for g in genomes.values():
        arr = code[np.frombuffer(g.encode(), np.uint8)]
        km = np.zeros(len(arr) - K + 1, dtype=np.uint64)
        for t in range(K):
            km |= arr[t : t + len(km)].astype(np.uint64) << np.uint64(2 * (K - 1 - t))
        chunks.append(bits.canonical_representation(km, K))
    kmers = np.unique(np.concatenate(chunks))
    write_kdb(os.path.join(DATA, "database.jdb"), kmers, np.ones(len(kmers), np.uint32), k=K)

    env = dict(os.environ)

    def run(cmd, **kw):
        print("+", " ".join(cmd))
        subprocess.run(cmd, check=True, cwd=DATA, env=env, **kw)

    run([os.path.join(BIN, "db_sort"), "-z", "-t", "1", "-n", str(NT),
         "-d", "database.jdb", "-o", "database0.kdb", "-i", "database.idx"])
    with open(os.path.join(DATA, "taxDB"), "w") as f:
        subprocess.run(
            [os.path.join(BIN, "build_taxdb"), "taxonomy/names.dmp", "taxonomy/nodes.dmp"],
            check=True, cwd=DATA, stdout=f)
    run([os.path.join(BIN, "set_lcas"), "-M", "-x", "-t", "1",
         "-d", "database0.kdb", "-o", "database.kdb", "-i", "database.idx",
         "-b", "taxDB", "-m", "seqid2taxid.map", "-F", "library.fna"])

    classify = os.path.join(BIN, "classify")
    base = [classify, "-d", "database.kdb", "-i", "database.idx", "-a", "taxDB", "-t", "1"]
    # the reference classifier APPENDS report files (the Perl wrapper writes
    # the provenance header first); truncate so re-running over an existing
    # fixture tree stays byte-identical
    for rep in ("report.tsv", "report_fq.tsv", "report_p14.tsv"):
        open(os.path.join(DATA, rep), "w").close()
    # .counts caches would short-circuit count_taxons regeneration
    for stale in ("database.kdb.counts",):
        p = os.path.join(DATA, stale)
        if os.path.exists(p):
            os.remove(p)
    # default run (fasta)
    run(base + ["-p", str(HLL_P), "-o", "kraken.out", "-r", "report.tsv",
                "-C", "classified.fa", "-U", "unclassified.fa", "reads.fa"])
    # fastq input
    run(base + ["-p", str(HLL_P), "-o", "kraken_fq.out", "-r", "report_fq.tsv", "reads.fq"])
    # quick mode
    run(base + ["-p", str(HLL_P), "-q", "-m", "2", "-o", "kraken_quick.out", "reads.fa"])
    # higher precision
    run(base + ["-p", "14", "-o", "kraken_p14.out", "-r", "report_p14.tsv", "reads.fa"])
    # only-classified output
    run(base + ["-p", str(HLL_P), "-c", "-o", "kraken_onlyc.out", "reads.fa"])

    os.remove(os.path.join(DATA, "database0.kdb"))
    print("fixture written to", DATA)


if __name__ == "__main__":
    main()

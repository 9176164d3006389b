#!/usr/bin/env python
"""Generate the derived golden fixtures (everything beyond gen_fixture.py):

  - paired-end reads + read_merger.pl merge + classify   (kraken_paired.out)
  - hierarchical sub-databases db_bact / db_viral        (kraken_hier.out)
  - contaminant-taxid database db_contam                 (set_lcas -T)
  - UID database + classify                              (kraken_uid.out)
  - post-processing outputs from the reference Perl scripts
  - tool outputs (count_unique, query_taxdb)

Everything is produced by the COMPILED REFERENCE BINARIES and the reference
Perl scripts (staged into .golden-build by regen.sh); this script only
arranges deterministic inputs. Run AFTER gen_fixture.py (it reuses the base
fixture's genomes, reads, database and taxDB):

  tests/golden/regen.sh        # drives both generators
"""

import os
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import gen_fixture  # noqa: E402  (the base generator: shared genome stream)

BIN = os.path.join(REPO, ".golden-build", "src")
SCRIPTS = os.path.join(REPO, ".golden-build", "scripts")
DATA = os.path.join(REPO, "tests", "golden", "data")
K, NT, HLL_P = gen_fixture.K, gen_fixture.NT, gen_fixture.HLL_P

BASES = np.array(list("ACGT"))


def run(cmd, cwd=DATA, stdout=None, stdin=None):
    print("+", " ".join(map(str, cmd)))
    subprocess.run(list(map(str, cmd)), check=True, cwd=cwd, stdout=stdout, stdin=stdin)


def write_fasta(path, items, width=0):
    with open(path, "w") as f:
        for name, seq in items:
            f.write(f">{name}\n")
            if width:
                for i in range(0, len(seq), width):
                    f.write(seq[i : i + width] + "\n")
            else:
                f.write(seq + "\n")


def kmer_jdb(path, seqs):
    """Distinct canonical k-mers of seqs -> a Jellyfish-layout .jdb file
    (the same stand-in for `jellyfish count` the base generator uses)."""
    from krakenuniq_tpu.formats import write_kdb
    from krakenuniq_tpu.utils import bits

    code = np.full(256, 255, np.uint8)
    for c, v in zip(b"ACGT", range(4)):
        code[c] = v
    chunks = []
    for g in seqs:
        arr = code[np.frombuffer(g.encode(), np.uint8)]
        km = np.zeros(len(arr) - K + 1, dtype=np.uint64)
        for t in range(K):
            km |= arr[t : t + len(km)].astype(np.uint64) << np.uint64(2 * (K - 1 - t))
        chunks.append(bits.canonical_representation(km, K))
    kmers = np.unique(np.concatenate(chunks))
    write_kdb(path, kmers, np.ones(len(kmers), np.uint32), k=K)


def build_db(dbdir, genome_items, seqmap, taxdb_src, extra_set_lcas=()):
    """db_sort + set_lcas a library into dbdir with the reference binaries."""
    os.makedirs(dbdir, exist_ok=True)
    lib = os.path.join(dbdir, "library.fna.tmp")
    write_fasta(lib, genome_items)
    with open(os.path.join(dbdir, "seqid2taxid.map"), "w") as f:
        for sid, t in seqmap:
            f.write(f"{sid}\t{t}\n")
    shutil.copy(taxdb_src, os.path.join(dbdir, "taxDB"))
    kmer_jdb(os.path.join(dbdir, "database.jdb"), [g for _, g in genome_items])
    run([os.path.join(BIN, "db_sort"), "-z", "-t", "1", "-n", str(NT),
         "-d", "database.jdb", "-o", "database0.kdb", "-i", "database.idx"],
        cwd=dbdir)
    run([os.path.join(BIN, "set_lcas"), "-M", "-x", "-t", "1",
         "-d", "database0.kdb", "-o", "database.kdb", "-i", "database.idx",
         "-b", "taxDB", "-m", "seqid2taxid.map", "-F", "library.fna.tmp",
         *extra_set_lcas], cwd=dbdir)
    os.remove(os.path.join(dbdir, "database0.kdb"))
    os.remove(os.path.join(dbdir, "database.jdb"))
    os.remove(lib)


def gen_paired(rng, genomes):
    """Deterministic paired-end reads in the base generator's style: raw,
    mutated, and N-sprinkled variants over the fixture genomes."""
    taxa = list(genomes)
    pairs = []
    for i in range(30):
        t = taxa[int(rng.integers(len(taxa)))]
        g = genomes[t]
        frag_len = int(rng.integers(180, 300))
        start = int(rng.integers(0, len(g) - frag_len))
        frag = g[start : start + frag_len]
        l1 = int(rng.integers(60, 141))
        l2 = int(rng.integers(60, 141))
        r1 = frag[:l1]
        r2 = gen_fixture.revcomp(frag[-l2:])
        if i % 3 == 1:
            r1 = gen_fixture.mutate(rng, r1, 0.03)
        if i % 4 == 2:
            r2 = gen_fixture.mutate(rng, r2, 0.03)
        if i % 10 == 5:
            pos = int(rng.integers(0, len(r1)))
            r1 = r1[:pos] + "N" + r1[pos + 1 :]
        pairs.append((f"pair{i}", r1, r2))
    return pairs


def main():
    rng = np.random.default_rng(42)
    genomes = gen_fixture.build_genomes(rng)  # same stream as the base run
    classify = os.path.join(BIN, "classify")
    env_perl = dict(os.environ)

    def perl(script, args, out_name):
        with open(os.path.join(DATA, out_name), "w") as f:
            print("+", script, " ".join(map(str, args)), ">", out_name)
            subprocess.run(
                ["perl", os.path.join(SCRIPTS, script), *map(str, args)],
                check=True, cwd=DATA, stdout=f, env=env_perl)

    # ---- paired-end reads + reference merge + classify ------------------
    prng = np.random.default_rng(20260820)
    pairs = gen_paired(prng, genomes)
    for suffix, idx in (("1", 1), ("2", 2)):
        with open(os.path.join(DATA, f"reads_r{suffix}.fq"), "w") as f:
            for name, r1, r2 in pairs:
                seq = r1 if idx == 1 else r2
                f.write(f"@{name}/{suffix}\n{seq}\n+\n{'I' * len(seq)}\n")
    with open(os.path.join(DATA, "merged_golden.fa"), "w") as f:
        print("+ read_merger.pl reads_r1.fq reads_r2.fq > merged_golden.fa")
        subprocess.run(
            ["perl", os.path.join(SCRIPTS, "read_merger.pl"),
             "reads_r1.fq", "reads_r2.fq"],
            check=True, cwd=DATA, stdout=f, env=env_perl)
    run([classify, "-d", "database.kdb", "-i", "database.idx", "-a", "taxDB",
         "-t", "1", "-p", str(HLL_P), "-o", "kraken_paired.out",
         "merged_golden.fa"])

    # ---- hierarchical sub-databases -------------------------------------
    bact = [(f"seq_{t}", genomes[t]) for t in (211, 212, 221, 222)]
    viral = [(f"seq_{t}", genomes[t]) for t in (311,)]
    taxdb = os.path.join(DATA, "taxDB")
    build_db(os.path.join(DATA, "db_bact"), bact,
             [(f"seq_{t}", t) for t in (211, 212, 221, 222)], taxdb)
    build_db(os.path.join(DATA, "db_viral"), viral, [("seq_311", 311)], taxdb)
    for sub in ("db_bact", "db_viral"):
        for f in ("database.kdb.counts",):
            p = os.path.join(DATA, sub, f)
            if os.path.exists(p):
                os.remove(p)  # regenerate via the hier classify below
    open(os.path.join(DATA, "report_hier.tsv"), "w").close()  # classify appends
    run([classify,
         "-d", "db_bact/database.kdb", "-i", "db_bact/database.idx",
         "-d", "db_viral/database.kdb", "-i", "db_viral/database.idx",
         "-a", "taxDB", "-t", "1", "-p", str(HLL_P),
         "-o", "kraken_hier.out", "-r", "report_hier.tsv", "reads.fa"])

    # ---- contaminant-taxid database (set_lcas -T) ------------------------
    contam_dir = os.path.join(DATA, "db_contam")
    contam_tax = gen_fixture.TAXONOMY + [(32630, 1, "no rank", "synthetic construct")]
    os.makedirs(contam_dir, exist_ok=True)
    tdir = os.path.join(contam_dir, "taxonomy.tmp")
    os.makedirs(tdir, exist_ok=True)
    with open(os.path.join(tdir, "nodes.dmp"), "w") as f:
        for taxid, parent, rank, _ in contam_tax:
            f.write(f"{taxid}\t|\t{parent}\t|\t{rank}\t|\n")
    with open(os.path.join(tdir, "names.dmp"), "w") as f:
        for taxid, _, _, name in contam_tax:
            f.write(f"{taxid}\t|\t{name}\t|\t\t|\tscientific name\t|\n")
    with open(os.path.join(contam_dir, "taxDB"), "w") as f:
        subprocess.run([os.path.join(BIN, "build_taxdb"),
                        os.path.join(tdir, "names.dmp"), os.path.join(tdir, "nodes.dmp")],
                       check=True, cwd=contam_dir, stdout=f)
    shutil.rmtree(tdir)
    # vector_1 shares a 300bp block with seq_311 -> -T forces those k-mers
    # to the contaminant taxid (set_lcas.cpp:460-472, TIDs 32630/81077)
    citems = [("seq_211", genomes[211]), ("seq_311", genomes[311]),
              ("vector_1", genomes[311][100:400])]
    write_fasta(os.path.join(contam_dir, "library.fna"), citems)
    cmap = [("seq_211", 211), ("seq_311", 311), ("vector_1", 32630)]
    with open(os.path.join(contam_dir, "seqid2taxid.map"), "w") as f:
        for sid, t in cmap:
            f.write(f"{sid}\t{t}\n")
    kmer_jdb(os.path.join(contam_dir, "database.jdb"), [g for _, g in citems])
    run([os.path.join(BIN, "db_sort"), "-z", "-t", "1", "-n", str(NT),
         "-d", "database.jdb", "-o", "database0.kdb", "-i", "database.idx"],
        cwd=contam_dir)
    run([os.path.join(BIN, "set_lcas"), "-M", "-x", "-t", "1", "-T",
         "-d", "database0.kdb", "-o", "database.kdb", "-i", "database.idx",
         "-b", "taxDB", "-m", "seqid2taxid.map", "-F", "library.fna"],
        cwd=contam_dir)
    os.remove(os.path.join(contam_dir, "database0.kdb"))
    os.remove(os.path.join(contam_dir, "database.jdb"))

    # ---- UID database (set_lcas -I) + classify ---------------------------
    # build_db.sh:316-348: -I on a fresh zeroed copy of the sorted database
    shutil.copy(os.path.join(DATA, "database.jdb"), os.path.join(DATA, "uid0.jdb"))
    run([os.path.join(BIN, "db_sort"), "-z", "-t", "1", "-n", str(NT),
         "-d", "uid0.jdb", "-o", "uid0.kdb", "-i", "uid0.idx"])
    run([os.path.join(BIN, "set_lcas"), "-M", "-x", "-t", "1",
         "-I", "uid_to_taxid.map",
         "-d", "uid0.kdb", "-o", "uid_database.kdb", "-i", "uid0.idx",
         "-b", "taxDB", "-m", "seqid2taxid.map", "-F", "library.fna"])
    for f in ("uid0.jdb", "uid0.kdb", "uid0.idx"):
        os.remove(os.path.join(DATA, f))
    run([classify, "-d", "uid_database.kdb", "-i", "database.idx", "-a", "taxDB",
         "-t", "1", "-p", str(HLL_P), "-I", "uid_to_taxid.map",
         "-o", "kraken_uid.out", "reads.fa"])

    # ---- post-processing (reference Perl scripts) -------------------------
    perl("krakenuniq-report", ["--db", DATA, "kraken.out"], "postproc_report.tsv")
    perl("krakenuniq-translate", ["--db", DATA, "kraken.out"], "translate.txt")
    perl("krakenuniq-translate", ["--db", DATA, "--mpa-format", "kraken.out"],
         "translate_mpa.txt")
    perl("krakenuniq-filter", ["--db", DATA, "--threshold", "0.2", "kraken.out"],
         "filtered.out")
    perl("krakenuniq-mpa-report", ["--db", DATA, "kraken.out"], "mpa_report.tsv")
    perl("krakenuniq-extract-reads", ["-a", "21", "kraken.out", "reads.fa"],
         "extract_21.fa")
    perl("krakenuniq-extract-reads",
         ["-a", "-t", os.path.join(DATA, "taxDB"), "21", "kraken.out", "reads.fa"],
         "extract_21_subtree.fa")
    perl("krakenuniq-extract-reads", ["311", "kraken.out", "reads.fq"],
         "extract_311.fq")
    perl("krakenuniq-extract-reads", ["-a", "-i", "311", "kraken.out", "reads.fa"],
         "extract_not311.fa")

    # ---- tool outputs -----------------------------------------------------
    with open(os.path.join(DATA, "count_unique.out"), "w") as f:
        with open(os.path.join(DATA, "library.fna")) as lib:
            print("+ count_unique -k", K, "-p 14 < library.fna")
            subprocess.run([os.path.join(BIN, "count_unique"),
                            "-k", str(K), "-p", "14"],
                           check=True, cwd=DATA, stdin=lib, stdout=f)
    with open(os.path.join(DATA, "query_taxdb.out"), "w") as f:
        print("+ query_taxdb -L taxDB 211 311 22 1")
        subprocess.run([os.path.join(BIN, "query_taxdb"), "-L", "taxDB",
                        "211", "311", "22", "1"],
                       check=True, cwd=DATA, stdout=f)

    print("derived fixtures written to", DATA)


if __name__ == "__main__":
    main()

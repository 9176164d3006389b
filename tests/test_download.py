"""Downloader pipeline with an offline in-memory fetcher."""

import gzip
import io
import os
import tarfile

import pytest

from krakenuniq_tpu.build.download import Downloader, filter_fasta


def make_fetcher(responses: dict[str, bytes]):
    calls = []

    def fetch(url: str) -> bytes:
        calls.append(url)
        for key, val in responses.items():
            if key in url:
                return val
        raise OSError(f"no fixture for {url}")

    fetch.calls = calls
    return fetch


def make_taxdump() -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tar:
        for name, content in (
            ("nodes.dmp", b"1\t|\t1\t|\tno rank\t|\n562\t|\t1\t|\tspecies\t|\n"),
            ("names.dmp", b"1\t|\troot\t|\t\t|\tscientific name\t|\n"),
        ):
            info = tarfile.TarInfo(name)
            info.size = len(content)
            tar.addfile(info, io.BytesIO(content))
    return buf.getvalue()


ASSEMBLY_SUMMARY = (
    "#   See ftp site\n"
    "# assembly_accession\tbioproject\tbiosample\twgs_master\trefseq_category\ttaxid\t"
    "species_taxid\torganism_name\tinfraspecific_name\tisolate\tversion_status\t"
    "assembly_level\trelease_type\tgenome_rep\tseq_rel_date\tasm_name\tsubmitter\t"
    "gbrs_paired_asm\tpaired_asm_comp\tftp_path\texcluded_from_refseq\trelation_to_type_material\n"
    "GCF_001\tPRJ1\tSAM1\t\trepresentative genome\t562\t562\tEscherichia coli\t\t\t"
    "latest\tComplete Genome\tMajor\tFull\t2020/01/01\tASM1\tX\t\t\t"
    "https://ftp.example/genomes/GCF_001_ASM1\t\t\n"
    "GCF_002\tPRJ2\tSAM2\t\tna\t9606\t9606\tHomo sapiens\t\t\tlatest\t"
    "Scaffold\tMajor\tFull\t2020/01/01\tASM2\tX\t\t\t"
    "https://ftp.example/genomes/GCF_002_ASM2\t\t\n"
)

GENOME_FA = b">NC_1.1 Escherichia coli chromosome\n" + b"ACGT" * 30 + b"\n>NC_tiny\nACGT\n"


def test_taxonomy_download(tmp_path):
    fetch = make_fetcher({"taxdump.tar.gz": make_taxdump()})
    dl = Downloader(str(tmp_path), fetch=fetch, verbose=False)
    dl.download("taxonomy")
    assert (tmp_path / "taxonomy" / "nodes.dmp").exists()
    assert (tmp_path / "taxonomy" / "names.dmp").exists()
    # restartable: second call does not fetch again
    n_calls = len(fetch.calls)
    dl.download("taxonomy")
    assert len(fetch.calls) == n_calls


def test_refseq_assembly_download(tmp_path):
    fetch = make_fetcher(
        {
            "assembly_summary.txt": ASSEMBLY_SUMMARY.encode(),
            "GCF_001_ASM1_genomic.fna.gz": gzip.compress(GENOME_FA),
            "GCF_002_ASM2_genomic.fna.gz": gzip.compress(b">h9606\nAAAA\n"),
        }
    )
    dl = Downloader(str(tmp_path), fetch=fetch, min_seq_len=10, verbose=False)
    n = dl.download_assemblies("refseq/bacteria/Complete_Genome")
    assert n == 1  # the human Scaffold assembly is filtered by level
    lib = tmp_path / "library" / "bacteria"
    fna = (lib / "GCF_001_ASM1_genomic.fna").read_bytes()
    assert b"NC_1.1" in fna
    assert b"NC_tiny" not in fna  # min-seq-len filtered
    mapping = (lib / "GCF_001_ASM1_genomic.map").read_text()
    assert mapping == "NC_1.1\t562\n"


def test_column_filters(tmp_path):
    fetch = make_fetcher(
        {
            "assembly_summary.txt": ASSEMBLY_SUMMARY.encode(),
            "GCF_002_ASM2_genomic.fna.gz": gzip.compress(b">chr1\n" + b"ACGT" * 10 + b"\n"),
        }
    )
    dl = Downloader(str(tmp_path), fetch=fetch, verbose=False)
    n = dl.download_assemblies("refseq/vertebrate_mammalian/Any/species_taxid=9606")
    assert n == 1
    mapping = (tmp_path / "library" / "vertebrate_mammalian" / "GCF_002_ASM2_genomic.map").read_text()
    assert mapping == "chr1\t9606\n"


def test_contaminants(tmp_path):
    fetch = make_fetcher(
        {
            "UniVec": b">uv1 adapter\nACGTACGTACGT\n",
            "emvec": gzip.compress(b">ev1\nTTTTGGGG\n"),
        }
    )
    dl = Downloader(str(tmp_path), fetch=fetch, verbose=False)
    dl.download("contaminants")
    lib = tmp_path / "library" / "contaminants"
    assert (lib / "UniVec.fna").exists()
    assert (lib / "UniVec.map").read_text() == "uv1\t32630\n"  # synthetic construct


def test_filter_fasta_kraken_taxid_convention():
    fasta, mapping = filter_fasta(b">kraken:taxid|777|seqA desc\nACGT\n", taxid=1)
    assert mapping == [("kraken:taxid|777|seqA", 777)]


def test_eutils_search(tmp_path):
    esearch = (
        b"<eSearchResult><Count>3</Count><RetMax>0</RetMax>"
        b"<QueryKey>1</QueryKey><WebEnv>WE123</WebEnv></eSearchResult>"
    )
    fetch = make_fetcher(
        {"esearch.fcgi": esearch, "efetch.fcgi": b">v1\nACGT\n>v2\nGGGG\n"}
    )
    dl = Downloader(str(tmp_path), fetch=fetch, verbose=False)
    n = dl.download_search("viral-neighbors", "viruses[Organism]")
    assert n == 1
    files = os.listdir(tmp_path / "library" / "viral-neighbors")
    assert any(f.startswith("viral-neighbors.0") for f in files)


def test_cli_pattern_errors(capsys):
    from krakenuniq_tpu.cli.download_main import main

    assert main(["bogus-pattern", "-o", "/tmp"]) == 64
    assert main(["refseq/not_a_domain", "-o", "/tmp"]) == 64
    assert main(["nucleotide", "-o", "/tmp"]) == 64


# ---- round-4 parity: nt subsets, comma fan-out, e-utils targets, threads ----

NT_FASTA = (
    b">AC_BAC.1 Escherichia coli segment\n" + b"ACGT" * 10 + b"\n"
    b">AC_VIR.1 some virus\n" + b"GGCC" * 10 + b"\n"
    b">AC_ENV.1 environmental thing\n" + b"TTAA" * 10 + b"\n"
    b">AC_HUM.1 human\n" + b"AACC" * 10 + b"\n"
)

# taxonomy: root 1; bacteria 2 -> {561 -> 562}; viruses 10239 -> 11000;
# 2 -> env 48479 (named 'environmental samples'); human 9606
NT_NODES = (
    b"1\t|\t1\t|\tno rank\t|\n"
    b"2\t|\t1\t|\tsuperkingdom\t|\n"
    b"561\t|\t2\t|\tgenus\t|\n"
    b"562\t|\t561\t|\tspecies\t|\n"
    b"48479\t|\t2\t|\tno rank\t|\n"
    b"10239\t|\t1\t|\tsuperkingdom\t|\n"
    b"11000\t|\t10239\t|\tspecies\t|\n"
    b"9606\t|\t1\t|\tspecies\t|\n"
)
NT_NAMES = (
    b"1\t|\troot\t|\t\t|\tscientific name\t|\n"
    b"48479\t|\tenvironmental samples\t|\t\t|\tscientific name\t|\n"
    b"562\t|\tEscherichia coli\t|\t\t|\tscientific name\t|\n"
)
NT_MAP_GB = gzip.compress(
    b"accession\taccession.version\ttaxid\tgi\n"
    b"AC_BAC\tAC_BAC.1\t562\t11\n"
    b"AC_VIR\tAC_VIR.1\t11000\t12\n"
    b"AC_ENV\tAC_ENV.1\t48479\t13\n"
    b"AC_HUM\tAC_HUM.1\t9606\t14\n"
)
NT_MAP_WGS = gzip.compress(b"accession\taccession.version\ttaxid\tgi\n")


def _nt_fixture(tmp_path, **kw):
    fetch = make_fetcher(
        {
            "taxdump.tar.gz": make_taxdump(),
            "nt.gz": gzip.compress(NT_FASTA),
            "nucl_gb.accession2taxid.gz": NT_MAP_GB,
            "nucl_wgs.accession2taxid.gz": NT_MAP_WGS,
        }
    )
    dl = Downloader(str(tmp_path), fetch=fetch, verbose=False, **kw)
    tax = tmp_path / "taxonomy"
    tax.mkdir(exist_ok=True)
    (tax / "nodes.dmp").write_bytes(NT_NODES)
    (tax / "names.dmp").write_bytes(NT_NAMES)
    return dl, fetch


def test_nt_taxa_filtering(tmp_path):
    """`nt` with --taxa: each entry gets its own filtered FASTA + ac->taxid
    map; descendants resolve through nodes.dmp; non-selected taxa are
    excluded (krakenuniq-download:889-1000)."""
    dl, fetch = _nt_fixture(tmp_path, taxa="bacteria,viral")
    dl.download_nt()
    bact = (tmp_path / "library" / "nt-bacteria.fna").read_bytes()
    assert b"AC_BAC.1" in bact and b"ACGT" in bact
    assert b"AC_HUM" not in bact and b"AC_VIR" not in bact
    # env subtree NOT excluded by default (descendant of bacteria)
    assert b"AC_ENV.1" in bact
    viral = (tmp_path / "library" / "nt-viral.fna").read_bytes()
    assert b"AC_VIR.1" in viral and b"AC_BAC" not in viral
    bmap = (tmp_path / "library" / "nt-bacteria.fna.map").read_text()
    assert "AC_BAC.1\t562" in bmap
    # restartable: outputs present => no re-filtering work
    n_calls = len(fetch.calls)
    dl.download_nt()
    assert len(fetch.calls) == n_calls


def test_nt_exclude_environmental(tmp_path):
    dl, _ = _nt_fixture(
        tmp_path, taxa="bacteria", exclude_environmental_taxa=True
    )
    dl.download_nt()
    bact = (tmp_path / "library" / "nt-bacteria.fna").read_bytes()
    assert b"AC_BAC.1" in bact and b"AC_ENV" not in bact


def test_nt_taxid_entry(tmp_path):
    """--taxa taxID562 selects exactly that subtree."""
    dl, _ = _nt_fixture(tmp_path, taxa="taxID562")
    dl.download_nt()
    out = (tmp_path / "library" / "nt-taxID562.fna").read_bytes()
    assert b"AC_BAC.1" in out and b"AC_VIR" not in out and b"AC_ENV" not in out


def test_microbial_nt_pattern_dispatch(tmp_path):
    """'microbial-nt' runs taxonomy + the nt path with the default taxa."""
    dl, _ = _nt_fixture(tmp_path, taxa=None)
    # taxonomy fixture files already present; dispatch must not raise
    dl.download("microbial-nt")
    assert (tmp_path / "library" / "nt-bacteria.fna").exists()
    assert (tmp_path / "library" / "nt-viral.fna").exists()


def test_comma_fanout_domains_and_levels(tmp_path):
    """refseq/bacteria,viral/Complete_Genome,Scaffold iterates the cross
    product (krakenuniq-download:269-279)."""
    viral_summary = ASSEMBLY_SUMMARY.replace("bacteria", "viral")
    fetch = make_fetcher(
        {
            "/genomes/refseq/bacteria/assembly_summary.txt": ASSEMBLY_SUMMARY.encode(),
            "/genomes/refseq/viral/assembly_summary.txt": viral_summary.encode(),
            "GCF_001_ASM1_genomic.fna.gz": gzip.compress(GENOME_FA),
            "GCF_002_ASM2_genomic.fna.gz": gzip.compress(b">h9606\n" + b"AAAA" * 10 + b"\n"),
        }
    )
    dl = Downloader(str(tmp_path), fetch=fetch, verbose=False)
    n = dl.download_assemblies("refseq/bacteria,viral/Complete_Genome,Scaffold")
    # per domain: 1 Complete Genome + 1 Scaffold assembly
    assert n == 4
    assert (tmp_path / "library" / "bacteria" / "GCF_001_ASM1_genomic.fna").exists()
    assert (tmp_path / "library" / "viral" / "GCF_002_ASM2_genomic.fna").exists()


def test_threaded_fetch_pool(tmp_path):
    """--threads > 1 fetches assemblies through a thread pool with
    identical outputs."""
    fetch = make_fetcher(
        {
            "assembly_summary.txt": ASSEMBLY_SUMMARY.encode(),
            "GCF_001_ASM1_genomic.fna.gz": gzip.compress(GENOME_FA),
            "GCF_002_ASM2_genomic.fna.gz": gzip.compress(b">h9606\n" + b"AAAA" * 10 + b"\n"),
        }
    )
    dl = Downloader(str(tmp_path), fetch=fetch, verbose=False, threads=4)
    n = dl.download_assemblies("refseq/bacteria/Any")
    assert n == 2
    assert (tmp_path / "library" / "bacteria" / "GCF_001_ASM1_genomic.fna").exists()
    assert (tmp_path / "library" / "bacteria" / "GCF_002_ASM2_genomic.fna").exists()


def test_eutils_assembly_and_genome_targets(tmp_path):
    """'assembly'/'genome' e-utilities databases with fielded accession
    search (krakenuniq-download:284-305)."""
    esearch = (
        b"<eSearchResult><Count>1</Count><RetMax>0</RetMax>"
        b"<QueryKey>1</QueryKey><WebEnv>WE1</WebEnv></eSearchResult>"
    )
    fa = b">NC_5.1 assembly seq\n" + b"ACGT" * 10 + b"\n"
    fetch = make_fetcher({"esearch.fcgi": esearch, "efetch.fcgi": fa})
    dl = Downloader(str(tmp_path), fetch=fetch, verbose=False)
    n = dl.download_eutils_accessions("assembly", ["GCF_0001", "GCF_0002"])
    assert n == 1
    assert (tmp_path / "library" / "assembly" / "assembly.0.fna").exists()
    es = [u for u in fetch.calls if "esearch" in u]
    assert "db=assembly" in es[0]
    assert "Assembly+Accession" in es[0] or "Assembly%20Accession" in es[0]

    dl2 = Downloader(str(tmp_path), fetch=fetch, verbose=False)
    dl2.download_search("genome", "txid2[organism]", db="genome")
    assert (tmp_path / "library" / "genome" / "genome.0.fna").exists()
    assert any("db=genome" in u and "esearch" in u for u in fetch.calls)


def test_cli_nt_flags_are_wired(tmp_path, monkeypatch, capsys):
    """The CLI passes --taxa/--exclude-environmental-taxa through and warns
    on the (reference-unimplemented) --filter-unplaced instead of silently
    accepting it."""
    from krakenuniq_tpu.cli import download_main

    seen = {}

    class FakeDL:
        def __init__(self, db_dir, **kw):
            seen.update(kw)

        def download(self, pattern):
            seen["pattern"] = pattern

    monkeypatch.setattr(
        "krakenuniq_tpu.build.download.Downloader", FakeDL
    )
    rc = download_main.main(
        ["nt", "-o", str(tmp_path), "--taxa", "viral", "--threads", "3",
         "--exclude-environmental-taxa", "--filter-unplaced"]
    )
    assert rc == 0
    assert seen["taxa"] == "viral"
    assert seen["threads"] == 3
    assert seen["exclude_environmental_taxa"] is True
    assert seen["pattern"] == "nt"
    assert "--filter-unplaced" in capsys.readouterr().err


def test_domain_level_category_flags(tmp_path):
    """--domain/--assembly-level fill pattern parts the pattern omits
    (krakenuniq-download:271-272); --category keeps only assemblies whose
    refseq_category matches exactly (krakenuniq-download:1204)."""
    fetch = make_fetcher(
        {
            "assembly_summary.txt": ASSEMBLY_SUMMARY.encode(),
            "GCF_001_ASM1_genomic.fna.gz": gzip.compress(GENOME_FA),
        }
    )
    dl = Downloader(str(tmp_path), fetch=fetch, verbose=False)
    # a category nothing carries downloads nothing
    assert dl.download_assemblies(
        "refseq/bacteria/Any", category="reference genome"
    ) == 0
    # bare section: domain and level come from the flags
    n = dl.download_assemblies(
        "refseq",
        default_domains="bacteria",
        default_level="Complete_Genome",
        category="representative genome",
    )
    assert n == 1
    assert (tmp_path / "library" / "bacteria" / "GCF_001_ASM1_genomic.fna").exists()


def test_cli_assembly_flags_are_wired(tmp_path, monkeypatch):
    """-d/-a/-c reach download_assemblies, --force aliases --overwrite, and
    the reference's dead flags (-t/--nt-fna/-l/--ncbidb) are accepted."""
    from krakenuniq_tpu.cli import download_main

    seen = {}

    class FakeDL:
        def __init__(self, db_dir, **kw):
            seen.update(kw)

        def download_assemblies(self, pattern, **kw):
            seen["pattern"] = pattern
            seen.update(kw)
            return 0

    monkeypatch.setattr("krakenuniq_tpu.build.download.Downloader", FakeDL)
    rc = download_main.main(
        ["refseq", "-o", str(tmp_path), "-d", "archaea", "-a", "Chromosome",
         "-c", "reference genome", "--force",
         "-t", "2157", "--nt-fna", "/x/nt.fna", "-l", "--ncbidb", "assembly"]
    )
    assert rc == 0
    assert seen["pattern"] == "refseq"
    assert seen["default_domains"] == "archaea"
    assert seen["default_level"] == "Chromosome"
    assert seen["category"] == "reference genome"
    assert seen["overwrite"] is True

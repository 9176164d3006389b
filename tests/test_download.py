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

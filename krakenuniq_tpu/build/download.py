"""NCBI reference-library downloader (reference scripts/krakenuniq-download).

Supports the same target patterns as the reference Perl downloader
(krakenuniq-download:264-316): `taxonomy`, `contaminants` (UniVec/EmVec),
`viral-neighbors`, `refseq/DOMAIN[/ASSEMBLY_LEVEL[/COL=VAL]*]`,
`genbank/DOMAIN[...]`, and e-utilities searches/accession fetches
(`nucleotide` with --search/--ac). Downloads are restartable: existing
outputs are skipped unless `overwrite` is set.

The network layer is injectable (`fetch: url -> bytes`) so the pipeline is
fully testable offline; the default uses urllib over https.
"""

from __future__ import annotations

import gzip
import os
import re
import sys
from typing import Callable, Iterable

NCBI_FTP = "https://ftp.ncbi.nlm.nih.gov"
EUTILS = "https://eutils.ncbi.nlm.nih.gov/entrez/eutils"
UNIVEC_URL = f"{NCBI_FTP}/pub/UniVec/UniVec"
EMVEC_URL = "https://ftp.ebi.ac.uk/pub/databases/emvec/emvec.dat.gz"
TAXDUMP_URL = f"{NCBI_FTP}/pub/taxonomy/taxdump.tar.gz"

TID_SYNTHETIC = 32630  # 'synthetic construct' (UniVec)
TID_ARTIFICIAL = 81077  # 'artificial sequences' (EmVec)

# refseq/genbank domain directories the reference accepts
DOMAINS = {
    "archaea",
    "bacteria",
    "fungi",
    "invertebrate",
    "plant",
    "protozoa",
    "vertebrate_mammalian",
    "vertebrate_other",
    "viral",
    "mitochondrion",
    "plasmid",
    "plastid",
    "human",
}

VIRAL_NEIGHBORS_TERM = (
    '"viruses"[Organism] AND srcdb_genbank[Properties] '
    "NOT wgs[PROP] NOT cellular organisms[ORGN] "
    'AND nuccore genome samespecies[Filter] NOT "sequence from type"[Filter]'
)

KRAKEN_PREFIX = "kraken:taxid|"
EFETCH_BATCH = 10_000


def _default_fetch(url: str) -> bytes:
    import urllib.request

    req = urllib.request.Request(url, headers={"User-Agent": "krakenuniq-tpu"})
    with urllib.request.urlopen(req, timeout=600) as resp:
        return resp.read()


def _maybe_gunzip(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)
    return data


def filter_fasta(
    data: bytes, taxid: int, min_seq_len: int = 0
) -> tuple[bytes, list[tuple[str, int]]]:
    """Filter a FASTA byte blob by minimum sequence length and derive its
    seqid->taxid mapping.

    The mapping taxid is `taxid` unless the header uses the
    `kraken:taxid|NNN|...` convention (set_lcas.cpp:314-323), which wins."""
    out: list[bytes] = []
    mapping: list[tuple[str, int]] = []
    header: bytes | None = None
    chunks: list[bytes] = []

    def flush():
        if header is None:
            return
        seq = b"".join(chunks)
        if min_seq_len and len(seq) < min_seq_len:
            return
        seqid = header[1:].split()[0].decode()
        t = taxid
        if seqid.startswith(KRAKEN_PREFIX):
            m = re.match(r"\d+", seqid[len(KRAKEN_PREFIX) :])
            if m:
                t = int(m.group())
        mapping.append((seqid, t))
        out.append(header + b"\n" + seq + b"\n")

    for line in data.splitlines():
        if line.startswith(b">"):
            flush()
            header = line
            chunks = []
        elif header is not None:
            chunks.append(line.strip())
    flush()
    return b"".join(out), mapping


class Downloader:
    def __init__(
        self,
        db_dir: str,
        fetch: Callable[[str], bytes] | None = None,
        overwrite: bool = False,
        dust: bool = False,
        min_seq_len: int = 0,
        verbose: bool = True,
    ):
        self.db_dir = db_dir
        self.fetch = fetch or _default_fetch
        self.overwrite = overwrite
        self.dust = dust
        self.min_seq_len = min_seq_len
        self.verbose = verbose
        self._warned_dust = False

    def _log(self, msg: str) -> None:
        if self.verbose:
            print(msg, file=sys.stderr)

    def _lib_dir(self, name: str) -> str:
        d = os.path.join(self.db_dir, "library", name)
        os.makedirs(d, exist_ok=True)
        return d

    def _dustmask(self, fasta: bytes) -> bytes:
        """Mask low-complexity regions with dustmasker when available
        (the reference shells out to it too, krakenuniq-download)."""
        import shutil
        import subprocess

        exe = shutil.which("dustmasker")
        if exe is None:
            if not self._warned_dust:
                self._log("dustmasker not found; skipping low-complexity masking")
                self._warned_dust = True
            return fasta
        proc = subprocess.run(
            [exe, "-outfmt", "fasta"], input=fasta, capture_output=True, check=True
        )
        # dustmasker lowercases masked regions; the reference turns them to N
        out = []
        for line in proc.stdout.splitlines(keepends=True):
            if line.startswith(b">"):
                out.append(line)
            else:
                out.append(re.sub(rb"[acgt]", b"N", line))
        return b"".join(out)

    def _write_library_file(
        self, lib: str, stem: str, fasta: bytes, taxid: int
    ) -> bool:
        d = self._lib_dir(lib)
        fna = os.path.join(d, stem + ".fna")
        if os.path.exists(fna) and not self.overwrite:
            return False
        filtered, mapping = filter_fasta(fasta, taxid, self.min_seq_len)
        if self.dust:
            filtered = self._dustmask(filtered)
        with open(fna, "wb") as f:
            f.write(filtered)
        with open(os.path.join(d, stem + ".map"), "w") as f:
            for seqid, t in mapping:
                if t:
                    f.write(f"{seqid}\t{t}\n")
        return True

    # ---- patterns ----------------------------------------------------------

    def download(self, pattern: str) -> None:
        if pattern == "taxonomy":
            self.download_taxonomy()
        elif pattern == "contaminants":
            self.download_contaminants()
        elif pattern == "viral-neighbors":
            self.download_search("viral-neighbors", VIRAL_NEIGHBORS_TERM)
        else:
            raise ValueError(f"unknown download pattern: {pattern!r}")

    def download_taxonomy(self) -> None:
        tax_dir = os.path.join(self.db_dir, "taxonomy")
        nodes = os.path.join(tax_dir, "nodes.dmp")
        names = os.path.join(tax_dir, "names.dmp")
        if os.path.exists(nodes) and os.path.exists(names) and not self.overwrite:
            self._log("taxonomy present, skipping")
            return
        os.makedirs(tax_dir, exist_ok=True)
        self._log(f"fetching {TAXDUMP_URL}")
        data = self.fetch(TAXDUMP_URL)
        import io
        import tarfile

        with tarfile.open(fileobj=io.BytesIO(data), mode="r:*") as tar:
            for member in tar.getmembers():
                base = os.path.basename(member.name)
                if base in ("nodes.dmp", "names.dmp", "merged.dmp", "delnodes.dmp"):
                    src = tar.extractfile(member)
                    if src is not None:
                        with open(os.path.join(tax_dir, base), "wb") as dst:
                            dst.write(src.read())

    def download_contaminants(self) -> None:
        univec = self.fetch(UNIVEC_URL)
        self._write_library_file("contaminants", "UniVec", univec, TID_SYNTHETIC)
        try:
            emvec = _maybe_gunzip(self.fetch(EMVEC_URL))
        except OSError as e:
            self._log(f"EmVec fetch failed ({e}); continuing with UniVec only")
            return
        if emvec.startswith(b">"):
            fasta = emvec
        else:
            fasta = _embl_to_fasta(emvec)
        self._write_library_file("contaminants", "EmVec", fasta, TID_ARTIFICIAL)

    def download_assemblies(self, pattern: str, fna_types: str = "genomic") -> int:
        """`refseq/DOMAIN[/ASSEMBLY_LEVEL[/COL=VAL]*]` (or genbank/...).

        ASSEMBLY_LEVEL: Complete_Genome, Chromosome, Scaffold, Contig, or Any.
        COL=VAL filters match assembly_summary.txt columns exactly."""
        parts = pattern.split("/")
        section, domain = parts[0], parts[1] if len(parts) > 1 else ""
        if section not in ("refseq", "genbank"):
            raise ValueError(f"bad section {section!r}")
        if domain not in DOMAINS:
            raise ValueError(
                f"unknown domain {domain!r}; expected one of {sorted(DOMAINS)}"
            )
        level = None
        col_filters: list[tuple[str, str]] = []
        for extra in parts[2:]:
            if "=" in extra:
                col, val = extra.split("=", 1)
                col_filters.append((col, val))
            else:
                level = extra.replace("_", " ")
        if level == "Any":
            level = None

        url = f"{NCBI_FTP}/genomes/{section}/{domain}/assembly_summary.txt"
        self._log(f"fetching {url}")
        summary = self.fetch(url).decode("utf-8", "replace")
        header: list[str] = []
        n = 0
        for line in summary.splitlines():
            if line.startswith("#"):
                if "assembly_accession" in line:
                    header = line.lstrip("# ").rstrip("\n").split("\t")
                continue
            if not header or not line.strip():
                continue
            row = dict(zip(header, line.split("\t")))
            if level and row.get("assembly_level") != level:
                continue
            if row.get("version_status", "latest") != "latest":
                continue
            if any(row.get(c) != v for c, v in col_filters):
                continue
            ftp_path = row.get("ftp_path", "")
            if not ftp_path or ftp_path == "na":
                continue
            base = ftp_path.rstrip("/").rsplit("/", 1)[-1]
            taxid = int(row.get("taxid") or 0)
            got_any = False
            for fna_type in fna_types.split(","):
                stem = f"{base}_{fna_type}"
                d = self._lib_dir(domain)
                if os.path.exists(os.path.join(d, stem + ".fna")) and not self.overwrite:
                    got_any = True
                    continue
                file_url = f"{ftp_path}/{stem}.fna.gz"
                self._log(f"fetching {file_url}")
                try:
                    fasta = _maybe_gunzip(self.fetch(file_url))
                except OSError as e:
                    self._log(f"  failed: {e}")
                    continue
                self._write_library_file(domain, stem, fasta, taxid)
                got_any = True
            if got_any:
                n += 1
        self._log(f"{pattern}: {n} assemblies")
        return n

    # ---- e-utilities -------------------------------------------------------

    def download_search(
        self,
        name: str,
        term: str,
        retmode: str = "text",
        rettype: str = "fasta",
    ) -> int:
        """esearch (usehistory) + batched efetch; writes library/NAME/NAME.i.fna.
        Returns the number of fetched batches."""
        from urllib.parse import quote

        url = (
            f"{EUTILS}/esearch.fcgi?db=nuccore&usehistory=y&retmax=0"
            f"&term={quote(term)}"
        )
        self._log(f"esearch: {term}")
        xml = self.fetch(url).decode("utf-8", "replace")

        def tag(t: str) -> str:
            m = re.search(rf"<{t}>([^<]*)</{t}>", xml)
            if not m:
                raise OSError(f"esearch response missing <{t}>")
            return m.group(1)

        count = int(tag("Count"))
        query_key = tag("QueryKey")
        webenv = tag("WebEnv")
        self._log(f"  {count} records")
        batches = 0
        for start in range(0, count, EFETCH_BATCH):
            i = start // EFETCH_BATCH
            d = self._lib_dir(name)
            out = os.path.join(d, f"{name}.{i}.fna")
            if os.path.exists(out) and not self.overwrite:
                batches += 1
                continue
            fetch_url = (
                f"{EUTILS}/efetch.fcgi?db=nuccore&query_key={query_key}"
                f"&WebEnv={quote(webenv)}&retstart={start}&retmax={EFETCH_BATCH}"
                f"&rettype={rettype}&retmode={retmode}"
            )
            data = _maybe_gunzip(self.fetch(fetch_url))
            filtered, mapping = filter_fasta(data, 0, self.min_seq_len)
            if self.dust:
                filtered = self._dustmask(filtered)
            with open(out, "wb") as f:
                f.write(filtered)
            with open(os.path.join(d, f"{name}.{i}.map"), "w") as f:
                for seqid, t in mapping:
                    if t:
                        f.write(f"{seqid}\t{t}\n")
            batches += 1
        return batches

    def download_accessions(self, accessions: Iterable[str], rettype: str = "fasta") -> int:
        from urllib.parse import quote

        acs = [a.strip() for a in accessions if a.strip()]
        d = self._lib_dir("nucleotide")
        n = 0
        for i in range(0, len(acs), 100):
            chunk = acs[i : i + 100]
            out = os.path.join(d, f"nucleotide.{i // 100}.fna")
            if os.path.exists(out) and not self.overwrite:
                n += 1
                continue
            url = (
                f"{EUTILS}/efetch.fcgi?db=nuccore&id={quote(','.join(chunk))}"
                f"&rettype={rettype}&retmode=text"
            )
            data = _maybe_gunzip(self.fetch(url))
            filtered, mapping = filter_fasta(data, 0, self.min_seq_len)
            with open(out, "wb") as f:
                f.write(filtered)
            with open(os.path.join(d, f"nucleotide.{i // 100}.map"), "w") as f:
                for seqid, t in mapping:
                    if t:
                        f.write(f"{seqid}\t{t}\n")
            n += 1
        return n


def _embl_to_fasta(embl: bytes) -> bytes:
    """Minimal EMBL flat-file -> FASTA (EmVec ships as EMBL .dat)."""
    out: list[bytes] = []
    seqid = None
    seq: list[bytes] = []
    for line in embl.splitlines():
        if line.startswith(b"ID"):
            fields = line[2:].strip().split(b";")
            seqid = fields[0].strip().split()[0] if fields and fields[0].strip() else b"emvec"
            seq = []
        elif line.startswith(b"  ") and seqid is not None:
            seq.append(re.sub(rb"[^A-Za-z]", b"", line))
        elif line.startswith(b"//") and seqid is not None:
            out.append(b">" + seqid + b"\n" + b"".join(seq).upper() + b"\n")
            seqid = None
    return b"".join(out)

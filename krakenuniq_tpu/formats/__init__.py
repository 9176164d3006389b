"""Readers/writers for the reference on-disk formats.

Implementing these exactly lets a reference-built database directory
(`database.kdb`, `database.idx`, `taxDB`, `database.kdb.counts`,
`seqid2taxid.map`) be used directly by the TPU framework, and vice versa.
"""

from .kdb import KdbHeader, read_kdb, write_kdb, KRAKEN_DB_MAGIC
from .index import read_index, write_index, KRAKEN_IDX_MAGIC_V1, KRAKEN_IDX_MAGIC_V2
from .counts import read_counts, write_counts
from .seqmap import read_seqid2taxid, write_seqid2taxid

__all__ = [
    "KdbHeader",
    "read_kdb",
    "write_kdb",
    "read_index",
    "write_index",
    "read_counts",
    "write_counts",
    "read_seqid2taxid",
    "write_seqid2taxid",
    "KRAKEN_DB_MAGIC",
    "KRAKEN_IDX_MAGIC_V1",
    "KRAKEN_IDX_MAGIC_V2",
]

"""On-disk cache of the built device hash table.

Building the table for a 48M-key database costs ~100s of host work (murmur
+ cuckoo placement + plane scatters) plus a device self-check -- per
process. The reference amortizes its analogous cost (sorting + index
construction) by writing database.idx once at build time
(build_db.sh:194-209); we do the same for the probe layout: the table
planes are written to `<kdb>.ht` after the first successful build and
later loads are a single bulk file read + device_put.

Validity: the table stores DENSE taxon ids, so it depends on both the kdb
pair file and the taxonomy (taxDB) that defined the dense remap. The header
records (size, mtime_ns) of each dependency and the layout version; any
mismatch is a silent rebuild.

Format: an uncompressed .npz holding `meta` (json) and the plane arrays
`p0[, p1]` -- (disp4, rows) for the default CHD layout, one plane for the
fused fallback, (ptags, confirm) for the raw-valued (UID) two-level
layout (db/hash_table.py).
"""

from __future__ import annotations

import json
import os

import numpy as np

_VERSION = 5  # bump when the plane layout or value space changes (5: CHD layout)


def _dep_stat(path: str):
    st = os.stat(path)
    return [int(st.st_size), int(st.st_mtime_ns)]


def _meta(kdb_path: str, taxdb_path: str | None, lb: int, store_raw: bool, extra=None):
    deps = {os.path.basename(kdb_path): _dep_stat(kdb_path)}
    if taxdb_path is not None and os.path.exists(taxdb_path):
        deps[os.path.basename(taxdb_path)] = _dep_stat(taxdb_path)
    meta = {
        "version": _VERSION,
        "lb": int(lb),
        "store_raw": bool(store_raw),
        "deps": deps,
    }
    if extra:
        meta["extra"] = extra
    return meta


def save_ht_cache(
    ht_path: str,
    host_planes: tuple,
    lb: int,
    kdb_path: str,
    taxdb_path: str | None,
    store_raw: bool,
    extra=None,
) -> None:
    """Atomic write; failures (read-only DB dirs) are non-fatal. `extra` is
    side metadata (e.g. shard bounds, the value-pool rows) returned verbatim
    on load; numpy-array values are stored as npz arrays, the rest as json."""
    extra_arrays = {}
    if extra:
        extra = dict(extra)
        for k in list(extra):
            if isinstance(extra[k], np.ndarray):
                extra_arrays[f"x_{k}"] = extra.pop(k)
        extra = extra or None
    meta = _meta(kdb_path, taxdb_path, lb, store_raw, extra)
    arrays = {f"p{i}": np.asarray(p) for i, p in enumerate(host_planes)}
    arrays.update(extra_arrays)
    tmp = ht_path + ".tmp"
    try:
        with open(tmp, "wb") as fh:
            np.savez(fh, meta=np.frombuffer(json.dumps(meta).encode(), np.uint8), **arrays)
        os.replace(tmp, ht_path)
    except OSError:
        try:
            os.unlink(tmp)
        except OSError:
            pass


def load_ht_cache(
    ht_path: str, kdb_path: str, taxdb_path: str | None, store_raw: bool
):
    """Returns (host_planes, lb, extra) or None on miss/staleness/corruption."""
    if not os.path.exists(ht_path):
        return None
    try:
        z = np.load(ht_path)
        meta = json.loads(bytes(z["meta"]).decode())
        extra = meta.get("extra")
        if meta != _meta(kdb_path, taxdb_path, meta.get("lb", 0), store_raw, extra):
            return None
        planes = []
        i = 0
        while f"p{i}" in z:  # chunked caches hold one entry per chunk plane
            planes.append(z[f"p{i}"])
            i += 1
        if not planes:
            return None
        x_keys = [k for k in z.files if k.startswith("x_")]
        if x_keys:
            extra = dict(extra or {})
            for k in x_keys:
                extra[k[2:]] = z[k]
        return tuple(planes), int(meta["lb"]), extra
    except Exception:
        return None

"""Mesh construction and the sharded classify step.

Layout: a 2D `Mesh` with axes ("data", "db").
  * The database planes are minimizer-range sharded along "db" (the model
    axis -- the DB is the model) and replicated along "data".
  * Read batches are sharded along "data" and replicated along "db".
  * Inside shard_map each db-shard searches only its minimizer range; the
    per-k-mer results are combined with a psum over "db" (exactly-one-shard
    invariant), after which resolution/HLL proceed replicated.

Hierarchical multi-database lookups shard EACH database along "db" and keep
the reference's first-DB-wins rule (classify.cpp:927-936): the psum-merged
word of database i only fills lanes earlier databases missed (the loop in
classify_step_core). UID (raw-valued) tables ride the same path with their
two-level plane stacks.

Collectives ride ICI; there is no host round-trip between lookup and
resolve. This is the spatial generalization of the reference's serial
`--preload-size` chunk loop (classify.cpp:566-791).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..classify.device_step import (
    StepConfig,
    _probe_chunk_core,
    classify_step_core,
)
from .partition import ShardedDBPlanes, ShardedHashPlanes


def make_mesh(n_data: int, n_db: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if len(devices) < n_data * n_db:
        raise ValueError(f"need {n_data * n_db} devices, have {len(devices)}")
    grid = devices[: n_data * n_db].reshape(n_data, n_db)
    return Mesh(grid, axis_names=("data", "db"))


def make_sharded_classify_fn(
    mesh: Mesh,
    planes,  # ShardedHashPlanes | ShardedDBPlanes | list of them (per database)
    taxid_table: np.ndarray,
    tin: np.ndarray,
    tout: np.ndarray,
    parent: np.ndarray,
    root_dense,
    cfg: StepConfig,
    dev_planes: tuple | None = None,
):
    """Returns a jitted fn(codes, ambig, lengths) -> outputs dict, running the
    classify step over the mesh with each database minimizer-sharded along
    "db". `planes` may be a single sharded-plane set or a list (hierarchical
    multi-DB, probed in order)."""
    planes_list = list(planes) if isinstance(planes, (list, tuple)) else [planes]
    n_db = mesh.shape["db"]
    hash_mode = isinstance(planes_list[0], ShardedHashPlanes)
    for p in planes_list:
        assert p.n_shards == n_db, (p.n_shards, n_db)
    cfg = StepConfig(
        **{
            **cfg.__dict__,
            "db_axis": "db",
            "data_axis": "data",
            "lookup_mode": "hash" if hash_mode else "bsearch",
            "hash_lbs": tuple(p.lb for p in planes_list) if hash_mode else (),
            "raw_dbs": (
                tuple(p.store_raw for p in planes_list) if hash_mode else cfg.raw_dbs
            ),
        }
    )
    repl = NamedSharding(mesh, P())

    # flatten every database's plane leaves (shard-stacked along axis 0) into
    # one positional list; `arities` regroups them inside the shard_map body
    flat_host: list = []
    flat_specs: list = []
    arities: list[int] = []
    for p in planes_list:
        if hash_mode:
            leaves = tuple(p.planes)
            specs = tuple(P("db", *([None] * (a.ndim - 1))) for a in leaves)
        else:
            leaves = (p.keys, p.vals, p.vals_dense, p.offsets, p.bin_start)
            specs = (
                P("db", None), P("db", None), P("db", None), P("db", None), P("db"),
            )
        arities.append(len(leaves))
        flat_host.extend(leaves)
        flat_specs.extend(specs)
    n_flat = len(flat_host)
    if dev_planes is None:
        dev_planes = tuple(
            jax.device_put(x, NamedSharding(mesh, s))
            for x, s in zip(flat_host, flat_specs)
        )
    tax_args = tuple(
        jax.device_put(np.asarray(x), repl) for x in (taxid_table, tin, tout, parent)
    )
    root_dense = jax.device_put(np.int32(root_dense), repl)

    def core(*args):
        flat = args[:n_flat]
        taxid_table, tin, tout, parent, root, codes, ambig, lengths = args[n_flat:]
        db_planes = []
        i = 0
        for a in arities:
            # drop the leading (length-1) shard-block axis of every leaf
            db_planes.append(tuple(x[0] for x in flat[i : i + a]))
            i += a
        return classify_step_core(
            tuple(db_planes), taxid_table, tin, tout, parent, root,
            codes, ambig, lengths, cfg,
        )

    out_specs = {
        "taxa": P("data", None),
        "taxa_dense": P("data", None),
        "ambig": P("data", None),
        "processed": P("data", None),
        "hll_lanes": P("data", None),
        "enc": P("data", None),
        "call": P("data"),
        "call_dense": P("data"),
        "hits": P("data"),
        "n_kmers": P("data"),
    }
    if cfg.with_kmers:
        out_specs["canon"] = P("data", None)
    if cfg.max_runs > 0:
        # the psum-combined taxa are replicated along "db", so the RLE pack
        # runs redundantly per db-shard and any copy is the answer
        out_specs["packed"] = P("data", None)
        if cfg.dense_runs:
            out_specs["hll_enc"] = P("data", None)
            out_specs["hll_dense"] = P("data", None)
        else:
            out_specs["hll_pairs"] = P("data", None)
        if cfg.local_dict and cfg.dense_runs:
            # the merged span-global dictionary is identical on every shard
            out_specs["lut"] = P()
    if cfg.outputs is not None:
        out_specs = {k: out_specs[k] for k in cfg.outputs}

    shard_fn = jax.shard_map(
        core,
        mesh=mesh,
        in_specs=tuple(flat_specs)
        + (
            P(),  # taxid_table
            P(),  # tin
            P(),  # tout
            P(),  # parent
            P(),  # root
            P("data", None),  # codes
            P("data", None),  # ambig
            P("data"),  # lengths
        ),
        out_specs=out_specs,
        check_vma=False,
    )

    def fn(codes, ambig, lengths):
        return shard_fn(*dev_planes, *tax_args, root_dense, codes, ambig, lengths)

    return jax.jit(fn), dev_planes


def make_sharded_probe_fn(mesh: Mesh, cfg: StepConfig, plane_ndims: tuple):
    """OOC x mesh probe: one chunk GROUP (mesh_db stacked chunk tables of one
    database) resident at a time; each db-shard probes its chunk, the words
    psum-merge over "db" (exactly-one-chunk invariant, classify.cpp:447), and
    the result folds into the span accumulator (first-nonzero precedence --
    the temporal merge of classify.cpp:390-485).

    Returns fn(acc, planes, codes, ambig, lengths) -> acc. `planes` is the
    group's stacked plane tuple, device_put with P("db", ...) by the caller
    (tables change every group; they must be arguments, not captures).
    `plane_ndims` is the UNSTACKED ndim of each chunk plane (1 entry for
    CHD tables, 2 for raw/UID two-level stacks) -- the specs here must
    mirror the caller's P("db", *([None]*ndim)) shardings exactly, so both
    derive from the same per-plane ndims instead of a hardcoded rank."""
    cfg = StepConfig(**{**cfg.__dict__, "db_axis": "db", "data_axis": "data"})
    n_planes = len(plane_ndims)

    def core(acc, *rest):
        planes = tuple(x[0] for x in rest[:n_planes])  # drop shard-block axis
        codes, ambig, lengths = rest[n_planes:]
        return _probe_chunk_core(acc, planes, codes, ambig, lengths, cfg)

    plane_specs = tuple(P("db", *([None] * nd)) for nd in plane_ndims)
    shard_fn = jax.shard_map(
        core,
        mesh=mesh,
        in_specs=(P("data", None),)
        + plane_specs
        + (P("data", None), P("data", None), P("data")),
        out_specs=P("data", None),
        check_vma=False,
    )
    return jax.jit(shard_fn, donate_argnums=(0,))


def make_sharded_acc_classify_fn(
    mesh: Mesh,
    taxid_table: np.ndarray,
    tin: np.ndarray,
    tout: np.ndarray,
    parent: np.ndarray,
    root_dense,
    cfg: StepConfig,
):
    """OOC x mesh finish pass: classify_step_core in "acc" mode over the
    accumulated word plane (already chunk- and shard-merged), data-parallel
    over "data" and replicated over "db". Returns fn(acc, codes, ambig,
    lengths) -> outputs dict with the same contract as the resident mesh
    program."""
    cfg = StepConfig(
        **{
            **cfg.__dict__,
            "db_axis": None,  # acc is fully merged; no psum in the finish
            "data_axis": "data",
            "lookup_mode": "acc",
            "hash_lbs": (),
        }
    )
    repl = NamedSharding(mesh, P())
    tax_args = tuple(
        jax.device_put(np.asarray(x), repl) for x in (taxid_table, tin, tout, parent)
    )
    root_dense = jax.device_put(np.int32(root_dense), repl)

    def core(taxid_table, tin, tout, parent, root, acc, codes, ambig, lengths):
        return classify_step_core(
            acc, taxid_table, tin, tout, parent, root, codes, ambig, lengths, cfg
        )

    out_specs = {
        "taxa": P("data", None),
        "taxa_dense": P("data", None),
        "ambig": P("data", None),
        "processed": P("data", None),
        "hll_lanes": P("data", None),
        "enc": P("data", None),
        "call": P("data"),
        "call_dense": P("data"),
        "hits": P("data"),
        "n_kmers": P("data"),
    }
    if cfg.with_kmers:
        out_specs["canon"] = P("data", None)
    if cfg.max_runs > 0:
        out_specs["packed"] = P("data", None)
        if cfg.dense_runs:
            out_specs["hll_enc"] = P("data", None)
            out_specs["hll_dense"] = P("data", None)
        else:
            out_specs["hll_pairs"] = P("data", None)
        if cfg.local_dict and cfg.dense_runs:
            out_specs["lut"] = P()
    if cfg.outputs is not None:
        out_specs = {k: out_specs[k] for k in cfg.outputs}

    shard_fn = jax.shard_map(
        core,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(), P(),
            P("data", None),  # acc
            P("data", None),  # codes
            P("data", None),  # ambig
            P("data"),  # lengths
        ),
        out_specs=out_specs,
        check_vma=False,
    )

    def fn(acc, codes, ambig, lengths):
        return shard_fn(*tax_args, root_dense, acc, codes, ambig, lengths)

    return jax.jit(fn)

"""Mesh construction and the sharded classify step.

Layout: a 2D `Mesh` with axes ("data", "db").
  * The database planes are minimizer-range sharded along "db" (the model
    axis -- the DB is the model) and replicated along "data".
  * Read batches are sharded along "data" and replicated along "db".
  * Inside shard_map each db-shard searches only its minimizer range; the
    per-k-mer results are combined with a psum over "db" (exactly-one-shard
    invariant), after which resolution/HLL proceed replicated.

Collectives ride ICI; there is no host round-trip between lookup and
resolve. This is the spatial generalization of the reference's serial
`--preload-size` chunk loop (classify.cpp:566-791).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..classify.device_step import StepConfig, classify_step_core
from .partition import ShardedDBPlanes, ShardedHashPlanes


def make_mesh(n_data: int, n_db: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if len(devices) < n_data * n_db:
        raise ValueError(f"need {n_data * n_db} devices, have {len(devices)}")
    grid = devices[: n_data * n_db].reshape(n_data, n_db)
    return Mesh(grid, axis_names=("data", "db"))


def make_sharded_classify_fn(
    mesh: Mesh,
    planes: ShardedDBPlanes,
    taxid_table: np.ndarray,
    tin: np.ndarray,
    tout: np.ndarray,
    parent: np.ndarray,
    root_dense,
    cfg: StepConfig,
    dev_planes: tuple | None = None,
):
    """Returns a jitted fn(codes, ambig, lengths) -> outputs dict, running the
    classify step over the mesh with the DB minimizer-sharded along "db"."""
    n_db = mesh.shape["db"]
    assert planes.n_shards == n_db, (planes.n_shards, n_db)
    hash_mode = isinstance(planes, ShardedHashPlanes)
    cfg = StepConfig(
        **{
            **cfg.__dict__,
            "db_axis": "db",
            "lookup_mode": "hash" if hash_mode else "bsearch",
            "hash_lbs": (planes.lb,) if hash_mode else (),
        }
    )

    db_sharding = NamedSharding(mesh, P("db", None))
    db_sharding3 = NamedSharding(mesh, P("db", None, None))
    scalar_sharding = NamedSharding(mesh, P("db"))
    repl = NamedSharding(mesh, P())

    if dev_planes is None:
        if hash_mode:
            dev_planes = (jax.device_put(planes.fused, db_sharding3),)
        else:
            dev_planes = (
                jax.device_put(planes.keys, db_sharding),
                jax.device_put(planes.vals, db_sharding),
                jax.device_put(planes.vals_dense, db_sharding),
                jax.device_put(planes.offsets, db_sharding),
                jax.device_put(planes.bin_start, scalar_sharding),
            )
    tax_args = tuple(
        jax.device_put(np.asarray(x), repl) for x in (taxid_table, tin, tout, parent)
    )
    root_dense = jax.device_put(np.int32(root_dense), repl)

    if hash_mode:

        def core(fused, taxid_table, tin, tout, parent, root, codes, ambig, lengths):
            db_planes = ((fused[0],),)
            return classify_step_core(
                db_planes, taxid_table, tin, tout, parent, root, codes, ambig, lengths, cfg
            )

    else:

        def core(keys, vals, vals_dense, offsets, bin_start, taxid_table, tin, tout, parent, root, codes, ambig, lengths):
            db_planes = ((keys[0], vals[0], vals_dense[0], offsets[0], bin_start[0]),)
            return classify_step_core(
                db_planes, taxid_table, tin, tout, parent, root, codes, ambig, lengths, cfg
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
    if cfg.outputs is not None:
        out_specs = {k: out_specs[k] for k in cfg.outputs}

    if hash_mode:
        plane_specs = (P("db", None, None),)
    else:
        plane_specs = (
            P("db", None),  # keys
            P("db", None),  # vals
            P("db", None),  # vals_dense
            P("db", None),  # offsets
            P("db"),  # bin_start
        )
    shard_fn = jax.shard_map(
        core,
        mesh=mesh,
        in_specs=plane_specs
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
        return shard_fn(
            *dev_planes, *tax_args, root_dense, codes, ambig, lengths
        )

    return jax.jit(fn), dev_planes

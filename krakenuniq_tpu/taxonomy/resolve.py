"""Device (JAX) implementation of KrakenUniq's read-level tree resolution.

Semantics (reference krakenutil.cpp:149-200): each distinct hit taxon is a
candidate; its score is the sum of hit counts over its root path; the answer
is the max-score candidate, with ties resolved by the LCA of all tied
candidates; empty hits => 0.

TPU formulation: instead of walking parent chains per candidate, we use
Euler-tour intervals: hit j contributes to candidate i iff
tin[t_j] <= tin[t_i] < tout[t_j]. Working per k-mer position (duplicate taxa
naturally sum), each candidate's score is an interval-stabbing count
  score_i = #{hits j : tin_j <= tin_i < tout_j},
with two formulations dispatched by backend:

  * TPU: a pallas kernel tiles the O(W^2) all-pairs compare cube over
    batch blocks held in VMEM -- ~1.1G lane comparisons at B=65536, W=130
    are ~6 ms of pure VPU time once the [TB, W, W] intermediate never
    touches HBM. (Round 3 used two [B, 3W] event sorts, measured 53-91 ms;
    the same cube through plain XLA materializes to HBM and only reaches
    76 ms -- tools/resolve_cube_exp.py.)
  * elsewhere (CPU tests, virtual meshes): the event-sort form -- sort
    starts/ends/queries per row, read a running sum at query positions,
    and return scores to lane order with a second sort (in lieu of a
    scatter, which XLA:TPU emits poorly).

Both produce identical score integers. Tie-LCA is the deepest node on the
argmax candidate's parent chain whose interval contains every tied
candidate; found with a fixed (max-depth) chain walk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_SCORE_TB = 64  # batch rows per grid step (measured best; 256 overflows
# the Mosaic stack -- the static j-unroll's temporaries scale with TB)


def _make_score_kernel(w: int):
    """Kernel over one [TB, W] batch tile: static unroll over hit lanes j,
    each contributing a lane-splat compare-accumulate -- pure elementwise
    VPU work, no cross-lane reductions and no [TB, W, W] intermediate (a
    rank-3 compare cube + lane-axis reduce ran 5x slower). Non-hit lanes
    are pre-masked outside (tin=+inf sentinel), so the kernel sees only
    two input planes."""

    def kernel(tins_ref, touts_ref, score_ref):
        tins = tins_ref[:]  # [TB, W] i32, non-hit lanes = 2^30 sentinel
        touts = touts_ref[:]
        q = tins
        acc = jnp.zeros(q.shape, jnp.int32)
        for j in range(w):
            tj = tins[:, j : j + 1]
            oj = touts[:, j : j + 1]
            acc = acc + ((tj <= q) & (oj > q)).astype(jnp.int32)
        score_ref[:] = acc

    return kernel


def _scores_pallas(tins, touts, hit_mask, interpret: bool = False):
    """Interval-stabbing scores on TPU: all-pairs compares, one [TB, W]
    batch tile per grid step."""
    b, w = tins.shape
    # sentinel-mask non-hit j lanes: tin=2^30 can never satisfy tin_j <= q
    # (queries pack below 2^29); q at non-hit lanes scores garbage that the
    # caller masks out
    big = jnp.int32(1) << jnp.int32(30)
    tins = jnp.where(hit_mask, tins, big)
    touts = jnp.where(hit_mask, touts, jnp.int32(-1))
    # the Mosaic stack holds ~O(unroll) [tb, w] temporaries: shrink the
    # batch tile as w grows so tb*w stays at the measured-safe budget.
    # Mosaic block sublane dims must be multiples of 8 -- tb is computed
    # 8-aligned and small batches are PADDED up to it below (never clamp
    # tb to an unaligned b).
    tb = max(8, (_SCORE_TB * 130 // w) & ~7)
    pad = (-b) % tb
    if pad:
        z = ((0, pad), (0, 0))
        tins = jnp.pad(tins, z)
        touts = jnp.pad(touts, z)
    # x64 is on in this package: a literal 0 in the index map traces as
    # i64, which Mosaic refuses to return -- pin it to i32
    spec = pl.BlockSpec(
        (tb, w), lambda i: (i, jnp.int32(0)), memory_space=pltpu.VMEM
    )
    score = pl.pallas_call(
        _make_score_kernel(w),
        out_shape=jax.ShapeDtypeStruct((b + pad, w), jnp.int32),
        grid=((b + pad) // tb,),
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(tins, touts)
    return score[:b]


def _scores_sort(tins, touts, hit_mask):
    """Event-sort interval-stabbing scores (non-TPU backends)."""
    # Event keys pack value<<2 | type so a plain i32 sort orders starts
    # (type 0) and ends (type 1) before the queries (type 2) that share
    # their value -- i.e. both counts are side='right'. Euler times are
    # < 2*T <= 2^28 (guarded at every entry path: the Classifier
    # constructor raises for larger dense-mode taxonomies,
    # classify/pipeline.py; pool mode is capped far lower by the u16 id
    # space), so the packed key fits int32 strictly below the non-hit
    # sentinel at 2^30.
    b, w = tins.shape
    big = jnp.int32(1) << jnp.int32(30)
    k_start = jnp.where(hit_mask, (tins << 2), big)
    k_end = jnp.where(hit_mask, (touts << 2) | 1, big)
    k_query = (tins << 2) | 2
    keys = jnp.concatenate([k_start, k_end, k_query], axis=1)  # [B, 3W]
    lane = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32), (b, w))
    payload = jnp.concatenate([jnp.full((b, 2 * w), w, jnp.int32), lane], axis=1)
    ks, ps = jax.lax.sort((keys, payload), num_keys=1)
    typ = ks & 3
    weight = (typ == 0).astype(jnp.int32) - (typ == 1).astype(jnp.int32)
    running = jnp.cumsum(weight, axis=1)  # at a query: #starts<=q - #ends<=q
    # return scores to lane order with a second sort (payload w sorts last)
    back_key = jnp.where(typ == 2, ps, jnp.int32(3 * w))
    _, score = jax.lax.sort((back_key, running), num_keys=1)
    return score[:, :w]


@functools.partial(jax.jit, static_argnames=("max_depth",))
def resolve_reads(
    taxa_dense: jax.Array,  # int32 [B, W] dense taxon ids per k-mer (0 = no hit)
    hit_mask: jax.Array,  # bool  [B, W] True where a DB hit occurred
    tin: jax.Array,  # int32 [T]
    tout: jax.Array,  # int32 [T]
    parent: jax.Array,  # int32 [T] dense parent (self for roots)
    root_dense: jax.Array,  # int32 scalar: dense index of taxid 1
    max_depth: int,
) -> jax.Array:
    """Returns the dense call per read: int32 [B]."""
    t = jnp.where(hit_mask, taxa_dense, 0)
    # ONE row-gather for both interval endpoints: XLA:TPU element-gathers
    # run ~8-11 ns/element even from a VMEM-sized table, while [T, 2] row
    # gathers take the fast path (measured 153ms -> 48ms on [65536, 120])
    io = jnp.stack([tin, tout], axis=1)  # [T, 2]
    rows = jnp.take(io, t, axis=0)  # [B, W, 2]
    tins = rows[..., 0]
    touts = rows[..., 1]

    # the kernel's O(W^2) compares and static j-unroll suit the short-read
    # buckets (W <= 482 at the 512 length bucket); long-read buckets keep
    # the O(W log W) event sort, where it is asymptotically right anyway
    w = taxa_dense.shape[1]
    if jax.default_backend() == "tpu" and w <= 512:
        score = _scores_pallas(tins, touts, hit_mask)
    else:
        score = _scores_sort(tins, touts, hit_mask)
    score = jnp.where(hit_mask, score, 0)

    max_score = jnp.max(score, axis=1)  # [B]
    classified = max_score > 0
    tied = (score == max_score[:, None]) & hit_mask  # [B, W]

    # interval hull of the tied set
    big = jnp.int32(2**31 - 1)
    tmin = jnp.min(jnp.where(tied, tins, big), axis=1)  # [B]
    tmax = jnp.max(jnp.where(tied, tins, -1), axis=1)  # [B]

    # start from the first argmax candidate and walk up; the first node whose
    # interval contains [tmin, tmax] is the LCA of the tied set
    start = jnp.take_along_axis(t, jnp.argmax(score, axis=1)[:, None], axis=1)[:, 0]

    # early-exit walk: the common case (tied set within one lineage, or a
    # single candidate) contains its own hull immediately, so most batches
    # finish in 1-3 iterations instead of max_depth+1 -- each iteration is
    # two [B]-sized computed-index gathers (~1 ms at B=65536), so the
    # while_loop's dynamic trip count is worth ~30 ms/span over fori_loop
    def cond(carry):
        i, node, best, found = carry
        return (i <= max_depth) & ~jnp.all(found)

    def step(carry):
        i, node, best, found = carry
        nrows = jnp.take(io, node, axis=0)  # [B, 2]
        ok = (nrows[:, 0] <= tmin) & (tmax < nrows[:, 1])
        best = jnp.where(ok & ~found, node, best)
        found = found | ok
        node = jnp.take(parent, node)
        return i + 1, node, best, found

    init = (
        jnp.int32(0),
        start,
        jnp.full_like(start, root_dense),
        jnp.zeros_like(classified),
    )
    _, _, best, found = jax.lax.while_loop(cond, step, init)
    # disconnected tied sets fall back to the root (krakenutil.cpp:117)
    call = jnp.where(found, best, root_dense)
    return jnp.where(classified, call, 0).astype(jnp.int32)

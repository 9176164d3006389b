"""The pallas interval-stabbing score kernel (taxonomy/resolve.py) must
produce the same score integers as the event-sort formulation -- the TPU
classify path calls the kernel, the CPU/test path the sort, and every
byte-exactness guarantee rides on their equality. Runs the kernel in
pallas interpret mode (no TPU in CI)."""

import jax.numpy as jnp
import numpy as np
import pytest

from krakenuniq_tpu.taxonomy import resolve as R


@pytest.mark.parametrize("trial,b,w", [(0, 67, 30), (1, 64, 130), (2, 5, 7)])
def test_pallas_scores_match_sort(trial, b, w):
    rng = np.random.default_rng(trial)
    tins = rng.integers(0, 5000, size=(b, w)).astype(np.int32)
    touts = (tins + rng.integers(1, 2500, size=(b, w))).astype(np.int32)
    hit = rng.random((b, w)) < 0.7
    # the sort form gates events on hit_mask internally; the kernel takes
    # raw intervals and sentinel-masks inside -- exactly as resolve_reads
    # feeds them
    s_sort = R._scores_sort(
        jnp.asarray(tins), jnp.asarray(touts), jnp.asarray(hit)
    )
    s_pal = R._scores_pallas(
        jnp.asarray(tins), jnp.asarray(touts), jnp.asarray(hit), interpret=True
    )
    hm = jnp.asarray(hit)
    assert bool(
        jnp.all(jnp.where(hm, s_sort, 0) == jnp.where(hm, s_pal, 0))
    )


def test_pallas_scores_all_miss():
    b, w = 8, 33
    z = jnp.zeros((b, w), jnp.int32)
    hm = jnp.zeros((b, w), bool)
    s = R._scores_pallas(z, z, hm, interpret=True)
    assert bool(jnp.all(jnp.where(hm, s, 0) == 0))

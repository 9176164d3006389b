import os, time
import numpy as np
import krakenuniq_tpu
import jax, jax.numpy as jnp
from krakenuniq_tpu.db.hash_table import GOLDEN

cache = os.path.expanduser("~/.cache/kuniq_bench_db_40_120000_31_9_v2.npz")
z = np.load(cache, allow_pickle=True)
htags, hvals, lb = z["htags"], z["hvals"], int(z["hash_lb"])
nb = htags.shape[0]

# build the two-level planes on host from the existing placement
tags = htags  # u64 [nb,4] murmur hashes (0 = empty)
vals = hvals  # u64 [nb,4] dense<<32 | taxid
occupied = tags != 0
b1 = (tags >> np.uint64(64 - lb)).astype(np.int64)
b2 = ((tags * GOLDEN) >> np.uint64(64 - lb)).astype(np.int64)
rows = np.arange(nb, dtype=np.int64)[:, None]
is_c1 = b1 == rows
hc = np.where(is_c1, tags, tags * GOLDEN)
ptags = ((hc << np.uint64(lb)) >> np.uint64(32)).astype(np.uint32)
ptags[~occupied] = 0
confirm = np.zeros((nb * 4, 4), np.uint32)
confirm[:, 0] = (tags & np.uint64(0xFFFFFFFF)).reshape(-1)
confirm[:, 1] = (tags >> np.uint64(32)).reshape(-1)
confirm[:, 2] = (vals & np.uint64(0xFFFFFFFF)).reshape(-1)
confirm[:, 3] = (vals >> np.uint64(32)).reshape(-1)

dptags = jax.device_put(jnp.asarray(ptags))
dconfirm = jax.device_put(jnp.asarray(confirm))
dtags = jax.device_put(jnp.asarray(tags))
dvals = jax.device_put(jnp.asarray(vals))

def lookup2(ptags, confirm, h, valid):
    shift = np.uint64(64 - lb)
    hg = h * GOLDEN
    r1 = (h >> shift).astype(jnp.int32)
    r2 = (hg >> shift).astype(jnp.int32)
    p1 = ((h << np.uint64(lb)) >> np.uint64(32)).astype(jnp.uint32)
    p2 = ((hg << np.uint64(lb)) >> np.uint64(32)).astype(jnp.uint32)
    t1 = jnp.take(ptags, r1, axis=0)
    t2 = jnp.take(ptags, r2, axis=0)
    eq1 = t1 == p1[:, None]
    dup = (r1 == r2)[:, None]
    eq2 = (t2 == p2[:, None]) & ~dup
    has1 = jnp.any(eq1, axis=1)
    has2 = jnp.any(eq2, axis=1)
    c1 = jnp.argmax(eq1, axis=1).astype(jnp.int32)
    c2 = jnp.argmax(eq2, axis=1).astype(jnp.int32)
    flat = jnp.where(has1, r1 * 4 + c1, r2 * 4 + c2)
    crow = jnp.take(confirm, flat, axis=0)
    hlo = (h & np.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hhi = (h >> np.uint64(32)).astype(jnp.uint32)
    ok = (has1 | has2) & (crow[:, 0] == hlo) & (crow[:, 1] == hhi) & valid
    taxon = jnp.where(ok, crow[:, 2], 0).astype(jnp.uint32)
    dense = jnp.where(ok, crow[:, 3], 0).astype(jnp.int32)
    return taxon, dense

from krakenuniq_tpu.lookup.hash_lookup import hash_lookup_kmers

N = 65536 * 130
rng = np.random.default_rng(1)
# mix: 70% present keys (from table), 30% absent
occ_flat = np.flatnonzero(occupied.reshape(-1))
pick = occ_flat[rng.integers(0, len(occ_flat), N)]
h_np = tags.reshape(-1)[pick]
absent = rng.integers(1, 2**63, N).astype(np.uint64)
use_абs = rng.random(N) < 0.3
h_np = np.where(use_абs, absent, h_np)
valid_np = rng.random(N) < 0.97
h = jax.device_put(jnp.asarray(h_np)); valid = jax.device_put(jnp.asarray(valid_np))

f_new = jax.jit(lookup2)
f_old = jax.jit(lambda t, v, h, m: hash_lookup_kmers(t, v, h, m, lb))
tn, dn = f_new(dptags, dconfirm, h, valid)
to, do = f_old(dtags, dvals, h, valid)
np.testing.assert_array_equal(np.asarray(tn), np.asarray(to))
np.testing.assert_array_equal(np.asarray(dn), np.asarray(do))
print("equal results")

def bench(name, f, *a):
    out = f(*a); _ = np.asarray(out[0].ravel()[:1])
    ts = []
    for _ in range(3):
        t = time.time(); out = f(*a); _ = np.asarray(out[0].ravel()[:1])
        ts.append(time.time()-t)
    dt = min(ts) - 0.026
    print(f"{name:24s} {dt*1e3:8.1f} ms   {dt/N*1e9:6.2f} ns/q")

bench("old 4xu64 4-gather", f_old, dtags, dvals, h, valid)
bench("new two-level u32", f_new, dptags, dconfirm, h, valid)

"""Microbenchmark gather/scatter/sort variants for the binning pipeline."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np

MAXP = 312320
MPP = 573440
P = 100_000
NV = 24

rng = np.random.default_rng(0)


def timeit(fn, variants, iters=NV):
    out = jax.block_until_ready(fn(*variants[0]))
    t0 = time.time()
    for i in range(iters):
        out = fn(*variants[i % len(variants)])
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3


def mk_idx(n, hi):
    return [jnp.asarray(np.sort(rng.integers(0, hi, n)).astype(np.int32))
            for _ in range(NV)]


table16 = jnp.asarray(rng.random((P, 16)).astype(np.float32))
table8 = jnp.asarray(rng.random((P, 8)).astype(np.float32))
table2 = jnp.asarray(rng.random((P, 2)).astype(np.float32))
rows16 = [jnp.asarray(rng.random((MAXP, 16)).astype(np.float32)) for _ in range(NV)]
g_mpp = mk_idx(MPP, P)
g_maxp = mk_idx(MAXP, P)
pos_mpp = [jnp.asarray((np.sort(rng.choice(MPP, MAXP, replace=False))).astype(np.int32)) for _ in range(4)]

tile_v = [jnp.asarray(rng.integers(0, 2040, MAXP).astype(np.int32)) for _ in range(NV)]
depth_v = [jnp.asarray(rng.random(MAXP).astype(np.float32)) for _ in range(NV)]
ops_v = [[jnp.asarray(rng.random(MAXP).astype(np.float32)) for _ in range(11)]
         for _ in range(NV)]

tests = []
tests.append(("gather [573k,16]", lambda g: table16[g].sum(), [(g,) for g in g_mpp]))
tests.append(("gather [573k,16] masked", lambda g: jnp.where((g < P - 1)[:, None], table16[jnp.clip(g, 0, P - 1)], 0.0).sum(), [(g,) for g in g_mpp]))
tests.append(("gather [312k,16]", lambda g: table16[g].sum(), [(g,) for g in g_maxp]))
tests.append(("gather [312k,8]", lambda g: table8[g].sum(), [(g,) for g in g_maxp]))
tests.append(("gather [312k,2]", lambda g: table2[g].sum(), [(g,) for g in g_maxp]))
tests.append(("scatter rows [312k,16]->[573k]", lambda r, p: jnp.zeros((MPP, 16), jnp.float32).at[p].set(r, mode="drop", unique_indices=True).sum(), [(r, pos_mpp[i % 4]) for i, r in enumerate(rows16)]))
tests.append(("sort 2key+1op", lambda t, d, o: jax.lax.sort((t, d, o[0]), num_keys=2, is_stable=True)[2].sum(), [(t, d, o) for t, d, o in zip(tile_v, depth_v, ops_v)]))
tests.append(("sort 2key+11op", lambda t, d, o: sum(x.sum() for x in jax.lax.sort((t, d) + tuple(o), num_keys=2, is_stable=True)[2:]), [(t, d, o) for t, d, o in zip(tile_v, depth_v, ops_v)]))
tests.append(("transpose [573k,16]->[16,573k]", lambda g: table16[g].T.sum(axis=1).sum(), [(g,) for g in g_mpp]))

for name, fn, variants in tests:
    ms = timeit(jax.jit(fn), variants)
    print(f"{name:32s} {ms:7.3f} ms")

"""Microbenchmark the pieces of expand_slots / emit on TPU."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np
from deblurgs_tpu.ops import binning as B

MAXP = 312320
P = 100_000

rng = np.random.default_rng(0)
area_np = rng.integers(0, 6, P).astype(np.int32)
area = jnp.asarray(area_np)


def timeit(fn, variants, iters=24):
    """variants: list of distinct arg tuples (the remote tunnel value-caches
    identical dispatches, so each call must differ)."""
    out = jax.block_until_ready(fn(*variants[0]))
    t0 = time.time()
    for i in range(iters):
        out = fn(*variants[i % len(variants)])
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3


def piece_cumsum(a):
    return jnp.cumsum(a)[-1]

def piece_scatter(a):
    offsets = jnp.cumsum(a)
    starts = (offsets - a).astype(jnp.int32)
    gids = jnp.arange(P, dtype=jnp.int32)
    idx = jnp.where(a > 0, starts, MAXP)
    marks = jnp.full(MAXP, -1, jnp.int32).at[idx].set(gids, mode="drop", unique_indices=True)
    return marks.sum()

def piece_cummax(a):
    offsets = jnp.cumsum(a)
    starts = (offsets - a).astype(jnp.int32)
    gids = jnp.arange(P, dtype=jnp.int32)
    idx = jnp.where(a > 0, starts, MAXP)
    marks = jnp.full(MAXP, -1, jnp.int32).at[idx].set(gids, mode="drop", unique_indices=True)
    return B._cummax_1d(marks).sum()

def piece_gather(a):
    g, valid, local, total = B.expand_slots(a, MAXP)
    return g.sum() + local.sum()

def piece_cummax_only(m):
    return B._cummax_1d(m).sum()

def piece_gather_only(st, g):
    return st[g].sum()

def piece_sort(t, d, g):
    s = jax.lax.sort((t, d, g), num_keys=2, is_stable=True)
    return s[0].sum() + s[2].sum()

marks = jnp.asarray(rng.integers(-1, P, MAXP).astype(np.int32))
starts = jnp.asarray(np.sort(rng.integers(0, MAXP, P)).astype(np.int32))
gidx = jnp.asarray(rng.integers(0, P, MAXP).astype(np.int32))
tile = jnp.asarray(rng.integers(0, 2040, MAXP).astype(np.int32))
depth = jnp.asarray(rng.random(MAXP).astype(np.float32))

NV = 24
area_v = [jnp.asarray(rng.integers(0, 6, P).astype(np.int32)) for _ in range(NV)]
marks_v = [jnp.asarray(rng.integers(-1, P, MAXP).astype(np.int32)) for _ in range(NV)]
gidx_v = [jnp.asarray(rng.integers(0, P, MAXP).astype(np.int32)) for _ in range(NV)]
tile_v = [jnp.asarray(rng.integers(0, 2040, MAXP).astype(np.int32)) for _ in range(NV)]
depth_v = [jnp.asarray(rng.random(MAXP).astype(np.float32)) for _ in range(NV)]

for name, fn, variants in [
    ("cumsum P", piece_cumsum, [(a,) for a in area_v]),
    ("  +scatter", piece_scatter, [(a,) for a in area_v]),
    ("  +cummax", piece_cummax, [(a,) for a in area_v]),
    ("full expand", piece_gather, [(a,) for a in area_v]),
    ("cummax alone", piece_cummax_only, [(m,) for m in marks_v]),
    ("gather starts[g]", piece_gather_only, [(starts, g) for g in gidx_v]),
    ("sort 2key 3op", piece_sort,
     [(t, d, g) for t, d, g in zip(tile_v, depth_v, gidx_v)]),
]:
    ms = timeit(jax.jit(fn), variants)
    print(f"{name:18s} {ms:7.3f} ms")

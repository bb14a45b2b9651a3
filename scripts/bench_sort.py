"""Micro-benchmark: pair-sort alternatives at bench scale (~480k pairs).

Compares the round-1 scheme (2-key lexicographic sort over (tile, depth)
with a gid payload) against a depth-presorted single-key scheme (sort P
Gaussians by depth once, expand pairs in depth order, stable sort by tile
only). Pipelined timing, distinct inputs per call.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def timeit(fn, variants, iters):
    out = fn(*variants[0])
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(iters):
        out = fn(*variants[i % len(variants)])
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max_pairs", type=int, default=485376)
    ap.add_argument("--num_tiles", type=int, default=2040)
    ap.add_argument("--p", type=int, default=100_000)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    mp, nt, P = args.max_pairs, args.num_tiles, args.p

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    tile = jax.random.randint(ks[0], (mp,), 0, nt, dtype=jnp.int32)
    depth = jax.random.uniform(ks[1], (mp,), jnp.float32)
    gid = jax.random.randint(ks[2], (mp,), 0, P, dtype=jnp.int32)
    pdepth = jax.random.uniform(ks[3], (P,), jnp.float32)

    def twokey(tile, depth, gid):
        return jax.lax.sort((tile, depth, gid), num_keys=2, is_stable=True)

    def onekey(tile, gid):
        return jax.lax.sort((tile, gid), num_keys=1, is_stable=True)

    def onekey_unstable(tile, gid):
        # combined (tile, gid-as-tiebreak) single key would need 64 bits;
        # this measures the raw unstable single-key cost floor
        return jax.lax.sort((tile, gid), num_keys=1, is_stable=False)

    def gsort(pdepth):
        idx = jnp.arange(P, dtype=jnp.int32)
        return jax.lax.sort((pdepth, idx), num_keys=1, is_stable=True)

    def sort_key_val_1(tile, gid):
        return jax.lax.sort_key_val(tile, gid, is_stable=True)

    # one distinct input per timed call — the remote tunnel value-caches
    # repeated identical dispatches; permutations differ per variant so no
    # value-dependent shortcut can apply
    vks = jax.random.split(jax.random.PRNGKey(7), args.iters)
    variants_3 = [
        (jax.random.randint(k, (mp,), 0, nt, dtype=jnp.int32), depth, gid)
        for k in vks
    ]
    variants_2 = [(t, g) for (t, _, g) in variants_3]
    variants_g = [(jax.random.uniform(k, (P,), jnp.float32),) for k in vks]
    jax.block_until_ready((variants_3, variants_2, variants_g))

    for name, fn, v in [
        ("2key stable (t,d)+gid", twokey, variants_3),
        ("1key stable t+gid    ", onekey, variants_2),
        ("1key unstable t+gid  ", onekey_unstable, variants_2),
        ("sort_key_val stable  ", sort_key_val_1, variants_2),
        ("gaussian depth sort P", gsort, variants_g),
    ]:
        dt = timeit(jax.jit(fn), v, args.iters)
        print(f"{name} {dt * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Microbenchmark: VPU elementwise throughput f32 vs bf16, and the blend
chunk-core op mix — informs whether a reduced-precision kernel interior
could halve the compositing cost (v5e VPU bf16 packing question)."""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C, NSTEP = 1024, 128, 4000


def make_kernel(dtype, n_ops):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        acc = x
        for _ in range(n_ops):
            acc = acc * x + x
        o_ref[...] = acc

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(NSTEP,),
            in_specs=[pl.BlockSpec((R, C), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, C), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, C), dtype),
        )(x)

    return run


def timeit(fn, variants, iters=12):
    out = jax.block_until_ready(fn(variants[0]))
    t0 = time.time()
    for i in range(iters):
        out = fn(variants[i % len(variants)])
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


for dtype in (jnp.float32, jnp.bfloat16):
    for n_ops in (8, 32):
        key = jax.random.PRNGKey(0)
        variants = [
            (jax.random.uniform(jax.random.PRNGKey(i), (R, C),
                                jnp.float32) * 0.1 + 0.5).astype(dtype)
            for i in range(12)
        ]
        dt = timeit(make_kernel(dtype, n_ops), variants)
        # 2 ops (mul+add) per loop iter per element
        ops = 2 * n_ops * R * C * NSTEP
        print(f"{jnp.dtype(dtype).name:9s} n_ops={n_ops:3d}: {dt*1e3:7.2f} ms "
              f"→ {ops/dt/1e12:6.2f} Tops/s")

# transcendental rate
def make_transc(fn_name):
    f = getattr(jnp, fn_name)

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        acc = x
        for _ in range(8):
            acc = f(acc * 0.25)
        o_ref[...] = acc

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(NSTEP,),
            in_specs=[pl.BlockSpec((R, C), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, C), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        )(x)

    return run


for name in ("exp", "log1p", "sqrt"):
    variants = [jax.random.uniform(jax.random.PRNGKey(i), (R, C), jnp.float32)
                for i in range(12)]
    dt = timeit(make_transc(name), variants)
    ops = 8 * R * C * NSTEP
    print(f"{name:9s} x8      : {dt*1e3:7.2f} ms → "
          f"{ops/dt/1e9:7.1f} Gcalls/s")

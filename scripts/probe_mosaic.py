"""Minimal Mosaic compile probes for the remote TPU compiler.

Each probe is a tiny pallas kernel exercising one suspect pattern; run on
device to learn which lowerings the current libtpu/Mosaic accepts.

Usage: python scripts/probe_mosaic.py [names...]
"""

import functools
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _run(kernel, out_shape, *args):
    fn = pl.pallas_call(kernel, out_shape=out_shape)
    return jax.jit(fn)(*args)


def probe_bf16_matmul(px):
    def kernel(x_ref, m_ref, o_ref):
        hi = x_ref[...].astype(jnp.bfloat16)
        lo = (x_ref[...] - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        m = m_ref[...].astype(jnp.bfloat16)
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[...] = dot(hi, m) + dot(lo, m)

    x = jnp.ones((px, 128), jnp.float32)
    m = jnp.ones((128, 128), jnp.float32)
    return _run(kernel, jax.ShapeDtypeStruct((px, 128), jnp.float32), x, m)


def probe_bf16_single(px):
    def kernel(x_ref, m_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...].astype(jnp.bfloat16), m_ref[...].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    x = jnp.ones((px, 128), jnp.float32)
    m = jnp.ones((128, 128), jnp.float32)
    return _run(kernel, jax.ShapeDtypeStruct((px, 128), jnp.float32), x, m)


def probe_dyn_mask_bf16(px):
    # the mixed kernel's exact pattern: data-dependent 0/1 mask -> bf16 dot
    def kernel(t_ref, x_ref, o_ref):
        trow = t_ref[...]
        ri = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        segcol = jax.lax.dot_general(
            (ri == ci).astype(jnp.float32), trow,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        m2 = ((segcol == trow) & (ri < ci)).astype(jnp.float32)
        hi = x_ref[...].astype(jnp.bfloat16)
        lo = (x_ref[...] - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        m2b = m2.astype(jnp.bfloat16)
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[...] = dot(hi, m2b) + dot(lo, m2b)

    t = jnp.ones((1, 128), jnp.float32)
    x = jnp.ones((px, 128), jnp.float32)
    return _run(kernel, jax.ShapeDtypeStruct((px, 128), jnp.float32), t, x)


PROBES = {
    "bf16x2_256": lambda: probe_bf16_matmul(256),
    "bf16x2_1024": lambda: probe_bf16_matmul(1024),
    "bf16_single_256": lambda: probe_bf16_single(256),
    "dynmask_256": lambda: probe_dyn_mask_bf16(256),
}


def main():
    names = sys.argv[1:] or list(PROBES)
    for name in names:
        try:
            out = PROBES[name]()
            jax.block_until_ready(out)
            print(f"{name}: OK sum={float(out.sum()):.1f}", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")
            key = next((l for l in msg if "Mosaic" in l or "error" in l.lower()),
                       msg[0])
            print(f"{name}: FAIL {key[:200]}", flush=True)


if __name__ == "__main__":
    main()

"""Sub-frame sharding over a device mesh (shard_map + GSPMD collectives).

Design (SURVEY.md §5 "long-context" analog): the f sub-frames of one blurry
observation are this workload's sequence axis. Each device renders its
contiguous block of sub-frames with the (replicated) Gaussian parameters;
the blur mean, temporal-smoothness loss and densification statistics are
computed on the sharded [f, ...] arrays outside the shard_map region, where
GSPMD inserts the psum/all-gather collectives — including the gradient
all-reduce onto the replicated parameters in the backward pass.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def make_mesh(n_devices: int | None = None, axis: str = "sf") -> Mesh:
    """1-D device mesh over the sub-frame axis.

    Falls back to the virtual CPU device pool when the default platform has
    fewer devices than requested (single-chip dev box validating multi-chip
    shardings via ``--xla_force_host_platform_device_count``).
    """
    devs = jax.devices()
    if n_devices is not None and len(devs) < n_devices:
        cpu = jax.devices("cpu")
        if len(cpu) >= n_devices:
            devs = cpu
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devs)} "
                f"(and {len(jax.devices('cpu'))} cpu)")
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))


def sharded_subframe_render(render_one, mesh: Mesh, axis: str = "sf"):
    """Wrap a per-subframe render fn into a sharded batched render.

    ``render_one(replicated, (cam, vsp)) -> pytree`` renders one sub-frame
    from replicated scene state (Gaussian tensors, background, masks — must
    be passed explicitly, NOT closed over: closure-captured tracers carry
    outer-context shardings that clash with the Manual mesh region).

    Returns ``(replicated, cams_batched, vsp_batched) -> stacked pytree``
    with the leading (sub-frame) axis sharded over ``mesh``; inside each
    shard sub-frames render sequentially (``lax.map``), bounding live
    rasterizer state per device exactly like the reference's serial loop —
    but f/n_dev deep instead of f.
    """

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,   # scan carries start replicated, become varying
    )
    def go(replicated, cams_local, vsp_local):
        return jax.lax.map(lambda args: render_one(replicated, args),
                           (cams_local, vsp_local))

    return go


def sharded_block_render(render_block, mesh: Mesh, axis: str = "sf"):
    """Like :func:`sharded_subframe_render` but each device renders its
    whole local view block in ONE call (``render_block(replicated,
    cams_local, vsp_local) -> pytree`` with a leading local-view axis) —
    composes the batched multi-view rasterizer with sub-frame sharding:
    one launch per device instead of one per sub-frame."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def go(replicated, cams_local, vsp_local):
        return render_block(replicated, cams_local, vsp_local)

    return go

"""Multi-host initialization + host-local data sharding.

SURVEY.md §2.3/§5: the reference is single-process; here multi-host runs
use ``jax.distributed`` with collectives riding ICI within a slice and DCN
across slices (inserted by GSPMD — see ``parallel/shard.py``). The pieces a
multi-host launcher needs:

- :func:`initialize` — one call per host before any jax op;
- :func:`global_mesh` — a mesh over all devices of all hosts;
- :func:`host_local_camera_split` — which training images this host should
  load/decode (each host only materializes its own shard of the image
  stack; the blurred observation consumed by a step is broadcast from the
  host that owns it via ``jax.make_array_from_process_local_data``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """``jax.distributed.initialize`` wrapper (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = "sf") -> Mesh:
    """1-D mesh over every device of every host (sub-frame axis)."""
    return Mesh(np.array(jax.devices()), (axis,))


def host_local_camera_split(n_cameras: int) -> list[int]:
    """Camera indices this host is responsible for loading/decoding.

    Contiguous blocks, matching a camera-axis ``NamedSharding`` over the
    global device mesh so :func:`assemble_global_images` can hand each
    process's decoded images directly to
    ``jax.make_array_from_process_local_data`` (a round-robin split would
    need a cross-host shuffle first)."""
    pid, n = jax.process_index(), jax.process_count()
    lo = pid * n_cameras // n
    hi = (pid + 1) * n_cameras // n
    return list(range(lo, hi))


def data_mesh(axis: str = "cam") -> Mesh:
    """1-D mesh over every device of every host for camera-sharded data."""
    return Mesh(np.array(jax.devices()), (axis,))


def assemble_global_images(images: np.ndarray, mesh: Mesh | None = None,
                           axis: str = "cam"):
    """Build the global training-image stack from per-host decoded shards.

    ``images``: the full [N, H, W, 3] stack where only this host's
    :func:`host_local_camera_split` rows need real data (others may be
    zeros — they are never read from this process). Returns a global
    ``jax.Array`` sharded along the camera axis; index it inside ``jit``
    (``select_camera``) so XLA inserts the owning-shard broadcast.
    """
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    if jax.process_count() <= 1:
        return jnp.asarray(images)
    mesh = mesh or data_mesh(axis)
    n = images.shape[0]
    n_dev = mesh.size
    pad = (-n) % n_dev
    if pad:
        images = np.concatenate(
            [images, np.zeros((pad,) + images.shape[1:], images.dtype)])
    sharding = NamedSharding(mesh, PartitionSpec(axis))
    mine = host_local_camera_split(images.shape[0])
    local = images[mine[0]: mine[-1] + 1]
    return jax.make_array_from_process_local_data(sharding, local,
                                                  images.shape)


def select_camera(gts, idx):
    """Replicated [H, W, 3] for camera ``idx`` from a (possibly
    camera-sharded) global stack — jitted so the owning shard's broadcast
    is an XLA collective."""
    import functools

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    if jax.process_count() <= 1:
        return gts[idx]
    out_sharding = NamedSharding(data_mesh(), PartitionSpec())
    f = jax.jit(lambda g, i: jnp.take(g, i, axis=0),
                out_shardings=out_sharding)
    return f(gts, idx)

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
    """Camera indices this host is responsible for loading (contiguous
    round-robin blocks)."""
    pid, n = jax.process_index(), jax.process_count()
    return [i for i in range(n_cameras) if i % n == pid]

"""Tile binning: pair expansion, depth sort, per-tile ranges (static shapes).

TPU-native equivalent of the CUDA binning stage (reference
``rasterizer_impl.cu:70-138, 198-346``):

- cub ``DeviceScan::InclusiveSum``       → ``jnp.cumsum``
- ``duplicateWithKeys`` (dynamic emit)   → fixed-capacity slot→Gaussian lookup
                                           via vectorized ``searchsorted``
- cub 64-bit radix sort of tile‖depth    → lexicographic ``lax.sort`` on
                                           (tile, depth, id), stable
- ``identifyTileRanges``                 → ``searchsorted`` over sorted tiles

All shapes are static: ``max_pairs`` is a fixed capacity; unused slots carry a
sentinel tile id that sorts last. Overflow (``num_pairs > max_pairs``) is
reported so the host can re-jit with a bigger capacity.

Purely integer/index computation — no gradients flow through this module.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from deblurgs_tpu.ops.preprocess import PreprocessOut


class Binning(NamedTuple):
    pair_gauss: jax.Array  # [max_pairs] int32 Gaussian index (sorted); P for invalid
    pair_tile: jax.Array   # [max_pairs] int32 tile id (sorted); num_tiles for invalid
    tile_start: jax.Array  # [num_tiles] int32 start offset into pair arrays
    tile_stop: jax.Array   # [num_tiles] int32 one-past-end offset
    num_pairs: jax.Array   # [] int32 total pairs emitted (pre-capacity-clip)
    max_per_tile: jax.Array  # [] int32 — k_max adequacy diagnostic


def bin_gaussians(
    pre: PreprocessOut,
    *,
    tiles_x: int,
    tiles_y: int,
    max_pairs: int,
) -> Binning:
    """Expand (Gaussian × touched-tile) pairs and sort by (tile, depth).

    The emitted order within a Gaussian is row-major over its rect, and the
    sort is stable — matching the CUDA emit order + stable radix sort, so
    equal-depth orderings agree with the reference.
    """
    num_tiles = tiles_x * tiles_y
    area = pre.tiles_touched.astype(jnp.int32)
    offsets_incl = jnp.cumsum(area)                      # [P]
    total = offsets_incl[-1] if area.shape[0] > 0 else jnp.int32(0)
    offsets_excl = offsets_incl - area

    slots = jnp.arange(max_pairs, dtype=jnp.int32)
    # slot -> owning Gaussian (first g with offsets_incl[g] > slot)
    gauss = jnp.searchsorted(offsets_incl, slots, side="right").astype(jnp.int32)
    valid = slots < jnp.minimum(total, max_pairs)
    g_safe = jnp.clip(gauss, 0, area.shape[0] - 1)

    local = slots - offsets_excl[g_safe]
    rect = pre.rect[g_safe]                              # [max_pairs, 4]
    width = jnp.maximum(rect[:, 2] - rect[:, 0], 1)
    dy = local // width
    dx = local - dy * width
    tile = (rect[:, 1] + dy) * tiles_x + (rect[:, 0] + dx)

    tile = jnp.where(valid, tile, num_tiles).astype(jnp.int32)
    depth_key = jnp.where(valid, pre.depth[g_safe], jnp.inf).astype(jnp.float32)
    gid = jnp.where(valid, g_safe, area.shape[0]).astype(jnp.int32)

    sorted_tile, _, sorted_gauss = jax.lax.sort(
        (tile, depth_key, gid), num_keys=2, is_stable=True
    )

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(jnp.int32)
    tile_stop = jnp.searchsorted(sorted_tile, tile_ids, side="right").astype(jnp.int32)

    return Binning(
        pair_gauss=sorted_gauss,
        pair_tile=sorted_tile,
        tile_start=tile_start,
        tile_stop=tile_stop,
        num_pairs=total,
        max_per_tile=jnp.max(tile_stop - tile_start),
    )

"""Tile binning: pair expansion, depth sort, per-tile ranges (static shapes).

TPU-native equivalent of the CUDA binning stage (reference
``rasterizer_impl.cu:70-138, 198-346``):

- cub ``DeviceScan::InclusiveSum``       → ``jnp.cumsum``
- ``duplicateWithKeys`` (dynamic emit)   → fixed-capacity slot→Gaussian
                                           mapping via **scatter + cumsum**
                                           (a marker per Gaussian start, then
                                           a prefix sum — O(P + max_pairs)
                                           vector work; binary search per
                                           slot is ~100× slower on TPU)
- cub 64-bit radix sort of tile‖depth    → lexicographic ``lax.sort`` on
                                           (tile, depth, id), stable
- ``identifyTileRanges``                 → branchless binary search over the
                                           sorted tile ids (num_tiles ≪
                                           max_pairs queries, so search wins
                                           here; scatter-min/max with
                                           duplicate indices costs 3-4 ms at
                                           this scale — measured on a v5e)

Per-pair attributes travel via one *row gather* from a packed [P, 8] table
(row gathers of ≥128-bit rows hit the fast TPU gather path; per-field
element gathers do not).

All shapes are static: ``max_pairs`` is a fixed capacity; unused slots carry
a sentinel tile id that sorts last. Overflow (``num_pairs > max_pairs``) is
reported so the host can re-jit with a bigger capacity.

Purely integer/index computation — no gradients flow through this module.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from deblurgs_tpu.ops.preprocess import PreprocessOut


def _cumsum_1d(x: jax.Array) -> jax.Array:
    """Two-level inclusive cumsum (XLA's 1-D cumsum lowering can be slow on
    long vectors; a [rows, 512] blocked scan + row-offset broadcast is
    robustly fast and exact for integer inputs)."""
    n = x.shape[0]
    cols = 512
    if n % cols != 0:
        return jnp.cumsum(x)
    within = jnp.cumsum(x.reshape(n // cols, cols), axis=1)
    row_off = jnp.concatenate(
        [jnp.zeros(1, x.dtype), jnp.cumsum(within[:, -1])[:-1]])
    return (within + row_off[:, None]).reshape(-1)


def _cummax_1d(x: jax.Array) -> jax.Array:
    """Two-level inclusive cumulative max (same blocking as :func:`_cumsum_1d`)."""
    n = x.shape[0]
    cols = 512
    if n % cols != 0:
        return jax.lax.cummax(x)
    within = jax.lax.cummax(x.reshape(n // cols, cols), axis=1)
    row_max = jax.lax.cummax(within[:, -1])
    row_off = jnp.concatenate([jnp.full(1, jnp.iinfo(x.dtype).min, x.dtype),
                               row_max[:-1]])
    return jnp.maximum(within, row_off[:, None]).reshape(-1)


def searchsorted_right(sorted_arr: jax.Array, queries: jax.Array) -> jax.Array:
    """First index i with ``sorted_arr[i] > q`` per query (branchless binary
    search unrolled to ceil(log2(n)) gather rounds). Only profitable when
    the query count is small relative to the array being searched — each
    round is one random gather per query."""
    n = sorted_arr.shape[0]
    nbits = max((n - 1).bit_length(), 1)
    lo = jnp.zeros(queries.shape, jnp.int32)
    hi = jnp.full(queries.shape, n, jnp.int32)
    for _ in range(nbits):
        mid = (lo + hi) >> 1
        go_right = sorted_arr[jnp.minimum(mid, n - 1)] <= queries
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


class Binning(NamedTuple):
    pair_gauss: jax.Array  # [max_pairs] int32 Gaussian index (sorted); P for invalid
    pair_tile: jax.Array   # [max_pairs] int32 tile id (sorted); num_tiles for invalid
    tile_start: jax.Array  # [num_tiles] int32 start offset into pair arrays
    tile_stop: jax.Array   # [num_tiles] int32 one-past-end offset
    num_pairs: jax.Array   # [] int32 total pairs emitted (pre-capacity-clip)
    max_per_tile: jax.Array  # [] int32 — k_max adequacy diagnostic


def expand_slots(area: jax.Array, max_pairs: int):
    """Slot → owning-Gaussian map without per-slot binary search.

    Scatters each emitting Gaussian's id at its first slot, then a running
    max recovers the owning Gaussian per slot. Only Gaussians with
    ``area > 0`` scatter, and their start offsets are strictly increasing —
    so the scatter has **unique indices** (the fast TPU scatter path;
    duplicate-index scatter-adds serialize).
    Returns (gauss [max_pairs] int32 — clamped to [0, P-1], valid mask,
    local offset within the Gaussian's rect, total emitted count).
    """
    P = area.shape[0]
    offsets_incl = jnp.cumsum(area)
    total = offsets_incl[-1] if P > 0 else jnp.int32(0)
    starts = (offsets_incl - area).astype(jnp.int32)

    gids = jnp.arange(P, dtype=jnp.int32)
    scatter_idx = jnp.where(area > 0, starts, max_pairs)
    marks = jnp.full(max_pairs, -1, jnp.int32).at[scatter_idx].set(
        gids, mode="drop", unique_indices=True)
    gauss = _cummax_1d(marks)
    slots = jnp.arange(max_pairs, dtype=jnp.int32)
    valid = slots < jnp.minimum(total, max_pairs)
    gauss = jnp.clip(gauss, 0, P - 1).astype(jnp.int32)
    # run start per slot via scatter + cummax instead of ``starts[gauss]``
    # (a [max_pairs] element gather — see expand_compact)
    smarks = jnp.full(max_pairs, -1, jnp.int32).at[scatter_idx].set(
        jnp.where(area > 0, starts, 0), mode="drop", unique_indices=True)
    local = slots - jnp.clip(_cummax_1d(smarks), 0, None)
    return gauss, valid, local, total


def expand_compact(area: jax.Array, max_pairs: int):
    """Slot expansion in COMPACT (emitting-Gaussian) id space.

    Like :func:`expand_slots` but the per-slot owner is the *rank* of the
    Gaussian among those with ``area > 0`` — ranks increase by exactly +1
    across runs, so any 128 consecutive slots span ≤ 128 consecutive
    compact rows. That bounded-window property is what lets the Pallas
    segmented-broadcast kernel (``pallas_blend.broadcast_fields``) expand a
    compacted per-Gaussian table into slot space with sequential DMA +
    one-hot MXU matmuls instead of a per-row HBM gather (TPU gathers cost
    ~15 ns per row regardless of width).

    Returns (gauss_c [max_pairs] compact rank per slot, ids [P] compact →
    original id (padding rows repeat the last id), valid, local, total).
    """
    P = area.shape[0]
    offsets_incl = jnp.cumsum(area)
    total = offsets_incl[-1] if P > 0 else jnp.int32(0)
    starts = (offsets_incl - area).astype(jnp.int32)
    emit = area > 0
    rank = jnp.cumsum(emit.astype(jnp.int32)) - 1          # [P]

    # compact → original id map (unique scatter over the emitting set)
    ids = jnp.full((P,), -1, jnp.int32).at[
        jnp.where(emit, rank, P)].set(
        jnp.arange(P, dtype=jnp.int32), mode="drop", unique_indices=True)
    ids = jnp.clip(jax.lax.cummax(ids), 0, P - 1)

    scatter_idx = jnp.where(emit, starts, max_pairs)
    marks = jnp.full(max_pairs, -1, jnp.int32).at[scatter_idx].set(
        jnp.where(emit, rank, 0), mode="drop", unique_indices=True)
    gauss_c = jnp.clip(_cummax_1d(marks), 0, P - 1)
    slots = jnp.arange(max_pairs, dtype=jnp.int32)
    valid = slots < jnp.minimum(total, max_pairs)
    # per-slot run start via a second unique scatter + cummax (start values
    # are non-decreasing across runs, so cummax recovers them exactly).
    # The former ``starts[ids][gauss_c]`` formulation was a [max_pairs]
    # element gather — ~15 ns/row on TPU ≈ 3.8 ms at bench scale, measured
    # as the whole pipeline's second-largest stage (r5 profile).
    smarks = jnp.full(max_pairs, -1, jnp.int32).at[scatter_idx].set(
        jnp.where(emit, starts, 0), mode="drop", unique_indices=True)
    run_start = jnp.clip(_cummax_1d(smarks), 0, None)
    local = slots - run_start
    return gauss_c, ids, valid, local, total


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
    P = pre.depth.shape[0]
    area = pre.tiles_touched.astype(jnp.int32)
    gauss, valid, local, total = expand_slots(area, max_pairs)

    # packed per-Gaussian attribute table → one fast row gather.
    # Rect coords are stored as exact f32 VALUES (they are < 2^24), never
    # bitcast: small-int bit patterns are f32 denormals, and TPU flushes
    # denormals to zero in any arithmetic/layout op — a bitcast round trip
    # silently zeroed rect origins on real hardware (CPU tests can't see it)
    x0f = pre.rect[:, 0].astype(jnp.float32)
    y0f = pre.rect[:, 1].astype(jnp.float32)
    wf = jnp.maximum(pre.rect[:, 2] - pre.rect[:, 0], 1).astype(jnp.float32)
    table = jnp.stack(
        [x0f, y0f, wf, pre.depth,
         jnp.zeros_like(wf), jnp.zeros_like(wf),
         jnp.zeros_like(wf), jnp.zeros_like(wf)],
        axis=-1,
    )                                                            # [P, 8]
    rows = table[gauss]                                          # [max_pairs, 8]
    depth_key = rows[:, 3]

    # f32 arithmetic is exact here: local < rect area ≤ num_tiles < 2^24,
    # and a/b for ints with b ≤ tiles_x is never within 2^-13 of a wrong
    # integer boundary
    localf = local.astype(jnp.float32)
    dy = jnp.floor(localf / rows[:, 2])
    dx = localf - dy * rows[:, 2]
    tile = ((rows[:, 1] + dy) * tiles_x + (rows[:, 0] + dx)).astype(jnp.int32)

    tile = jnp.where(valid, tile, num_tiles).astype(jnp.int32)
    depth_key = jnp.where(valid, depth_key, jnp.inf).astype(jnp.float32)
    gid = jnp.where(valid, gauss, P).astype(jnp.int32)

    sorted_tile, _, sorted_gauss = jax.lax.sort(
        (tile, depth_key, gid), num_keys=2, is_stable=True
    )

    # per-tile ranges: binary search over the sorted tile ids (identify-
    # TileRanges equivalent; only num_tiles queries, so search beats the
    # scatter-min/max formulation by ~3 ms at bench scale)
    tq = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = searchsorted_right(sorted_tile, tq - 1)
    tile_stop = searchsorted_right(sorted_tile, tq)

    return Binning(
        pair_gauss=sorted_gauss,
        pair_tile=sorted_tile,
        tile_start=tile_start,
        tile_stop=tile_stop,
        num_pairs=total,
        max_per_tile=jnp.max(tile_stop - tile_start),
    )

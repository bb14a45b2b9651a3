"""Mosaic (Pallas TPU) kernels for the tile compositing hot loop.

TPU-first reformulation of ``renderCUDA`` fwd/bwd (reference
``forward.cu:273-392``, ``backward.cu:463-640``). The CUDA design is one
thread per pixel with a *sequential* per-Gaussian loop (transmittance ``T``
recurrence, early exit at ``T < 1e-4``, back-to-front backward). That shape
is hostile to a vector machine, so the math is re-derived:

**Prefix-product formulation.** Let ``mult_j = 1 - alpha_j`` for eligible
pairs (else 1) and ``P_j`` the running *unfrozen* product. The reference's
early-stop semantics ("freeze before compositing the pair that would push T
below 1e-4") are *exactly*:

    composite_j  ⟺  eligible_j ∧ P_j ≥ 1e-4
    weight_j      =  alpha_j · P_{j-1}
    final_T       =  last composited P_j

because P is non-increasing, so once it crosses the threshold no later pair
can composite. This turns the sequential recurrence into a cumulative
product — ``U · exp(prefix(log mult))`` with the prefix sum computed on the
MXU (``mult ≥ 0.01`` thanks to the 0.99 alpha clamp, so the log is safe).

**Power as a bilinear form (MXU).** The Gaussian falloff
``power = -0.5(ca·dx² + cc·dy²) - cb·dx·dy`` with ``dx = x - px`` is a
rank-6 bilinear form between 6 per-pair features and the fixed per-tile
pixel features ``[1, p, q, p², q², p·q]`` — ONE [PX, 8] × [8, CHUNK] MXU
matmul replaces ~10 elementwise [PX, CHUNK] passes. Coordinates are shifted
to the tile origin in-kernel (tiny per-pair row ops) so the feature split
stays exact in float32.

**Backward without back-to-front.** With suffix sums expressed as
``total − prefix``, the hand-derived gradient

    dL/dalpha_j = dL/dO · (P_{j-1} c_j − S_j / (1−alpha_j)),
    S_j = Σ_{k>j} w_k c_k + final_T · bg

is algebraically identical to the CUDA ``accum_rec`` recurrence (divide
through by ``P_j``) but runs as a second *forward-order* streaming pass —
no ``n_contrib`` bookkeeping, no atomics: per-pair gradients land in the
pair's own slot of the sorted pair array and are segment-summed by Gaussian
id outside the kernel. The per-pair reductions over pixels are *moment
matmuls*: with ``N = G·dL_dalpha`` all six gradients (mean2d, conic,
opacity) are linear combinations of ``[1,p,q,p²,q²,pq]ᵀ @ N`` — one MXU
contraction instead of six elementwise reduction passes.

**Compact pairs, (tile × chunk-overlap) grid.** The kernels consume the
depth-sorted pair array *in place* — no CHUNK-aligned relayout. (An earlier
design scattered pairs into per-tile aligned segments; the relayout scatter
plus the alignment-padded field gather cost ~2.5 ms at 1080p/100k — TPU
gathers/scatters pay per ROW, so the ~1.8× row inflation from padding was
pure loss.) The grid enumerates (tile, overlapped-chunk) pairs: a 128-pair
chunk that straddles a tile boundary is visited once per tile with
complementary column masks, and since the visits are consecutive the
fields block is NOT re-fetched (Mosaic skips DMA on repeated block
indices). Scalar-prefetched maps drive the BlockSpec index maps; a tile's
output accumulators stay resident in VMEM across its steps and are written
back once. Per-tile running state (transmittance, the backward's prefix
dot) lives in VMEM scratch, reset on each tile's first step. Early exit
becomes a ``pl.when`` compute skip.

**Layout.** In-kernel arrays are [tile_px, CHUNK]: pixels ride the sublane
axis, pairs the lane axis. Pair fields live in HBM as [16, max_pairs] so
every [16, CHUNK] block slices the (128-aligned) lane axis — Mosaic rejects
minor-dim slices narrower than the 128 tiling, so the natural [max_pairs,
16] gather layout is transposed once at prepare time (bandwidth-bound,
shared by fwd+bwd via the VJP residuals).
"""

from __future__ import annotations

import functools
import os as _os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ALPHA_MIN = 1.0 / 255.0
_T_EPS = 1e-4
CHUNK = 128
NFIELD = 16
# field rows: 0 x, 1 y, 2 conic_a, 3 conic_b, 4 conic_c, 5 opacity,
#             6 r, 7 g, 8 b, 9 depth
# grad rows:  0 dmean_x, 1 dmean_y, 2 dca, 3 dcb, 4 dcc, 5 dopac,
#             6-8 dcolor, 9 ddepth


class Prepared(NamedTuple):
    """Shared fwd/bwd staging (saved as VJP residuals — the backward never
    re-runs the field gather or the step maps).

    ``window`` sub-tiles (consecutive tile ids) share each grid step: the
    step maps are per-sub-tile rows of shape [window, NS]."""

    fields: jax.Array      # [16, max_pairs] f32 pair field rows
    pair_gauss: jax.Array  # [max_pairs] int32 owning Gaussian (P = invalid)
    tile_start: jax.Array  # [nt_pad] int32 into the sorted pair array
    tile_stop: jax.Array   # [nt_pad] int32 one-past-end
    step_tile: jax.Array   # [NS] int32 WINDOW index per grid step
    step_chunk: jax.Array  # [window, NS] int32 source chunk per grid step
    step_start: jax.Array  # [n_win] int32 first grid step per window
    chunk_first: jax.Array  # [window, NS] int32 1 = first visit of the chunk
    # fused path only: pair_gauss holds COMPACT ranks; ids/n_emit map the
    # backward's compact segment sums to original Gaussian rows
    ids: jax.Array | None = None     # [P] compact → original id
    n_emit: jax.Array | None = None  # [] int32 emitting-Gaussian count
    owner: jax.Array | None = None   # [max_pairs] int32 slot's tile % window
                                     # (window > 1 backward select-sum)
    num_steps: jax.Array | None = None  # [] int32 REAL step count (dynamic
                                        # grid trims the clamped no-op tail
                                        # of the static NS bound)


def _num_steps_static(max_pairs: int, num_tiles: int, window: int = 1) -> int:
    """Upper bound on (window × lockstep-chunk) grid steps: a window's step
    count is max over its sub-tiles of ceil(cnt/CHUNK) (+1 boundary chunk),
    ≤ (Σ cnt)/CHUNK + 1 — so Σ ≤ max_pairs/CHUNK + n_windows. Empty windows
    claim one mask-empty step each (inside the +n_windows)."""
    n_win = -(-num_tiles // window)
    return max_pairs // CHUNK + n_win


def _step_maps(num_tiles, tile_start, tile_stop, max_pairs, window: int = 1):
    """(window × lockstep-chunk) grid maps from per-tile pair ranges.

    Each grid step advances ``window`` consecutive tiles' chunk streams in
    lockstep; sub-tiles with fewer chunks than the window's max repeat
    their last chunk index (repeated block indices skip the DMA and the
    kernel's j-range gate skips the compute)."""
    ns = _num_steps_static(max_pairs, num_tiles, window)
    nt_pad = -(-num_tiles // window) * window
    n_win = nt_pad // window
    tile_start = tile_start.astype(jnp.int32)
    tile_stop = tile_stop.astype(jnp.int32)
    if nt_pad != num_tiles:
        # padded tiles are empty: start = stop = max_pairs (gates all false)
        pad = jnp.full((nt_pad - num_tiles,), max_pairs, jnp.int32)
        tile_start = jnp.concatenate([tile_start, pad])
        tile_stop = jnp.concatenate([tile_stop, pad])
    cnt = tile_stop - tile_start
    first_chunk = tile_start // CHUNK
    # empty tiles take 1 step (their output must still be initialized)
    nsteps_t = jnp.where(cnt > 0,
                         (tile_stop - 1) // CHUNK - first_chunk + 1, 1)
    nsteps_w = jnp.max(nsteps_t.reshape(n_win, window), axis=1)
    step_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         jnp.cumsum(nsteps_w)[:-1].astype(jnp.int32)])

    # step → window: unique scatter of window ids at each window's first
    # step, then running max (tail steps inherit the last window)
    marks = jnp.full((ns,), -1, jnp.int32).at[step_start].set(
        jnp.arange(n_win, dtype=jnp.int32), mode="drop",
        unique_indices=True)
    step_win = jnp.clip(jax.lax.cummax(marks), 0, n_win - 1)
    steps = jnp.arange(ns, dtype=jnp.int32)
    j = steps - step_start[step_win]
    fc_w = first_chunk.reshape(n_win, window)
    # clamp each sub-tile's stream to ITS OWN last chunk: an overshooting
    # lockstep position must re-map the tile's final block (repeat → DMA
    # skipped, kernel preserves), never a foreign block — Mosaic writes
    # back whatever the out buffer holds for every mapped index
    lc_w = (first_chunk + nsteps_t - 1).reshape(n_win, window)
    step_chunk = jnp.stack(
        [jnp.clip(jnp.minimum(fc_w[step_win, q] + j, lc_w[step_win, q]),
                  0, max_pairs // CHUNK - 1)
         for q in range(window)], axis=0)                  # [window, NS]
    chunk_first = jnp.concatenate(
        [jnp.ones((window, 1), jnp.int32),
         (step_chunk[:, 1:] != step_chunk[:, :-1]).astype(jnp.int32)],
        axis=1)
    num_steps = (step_start[-1] + nsteps_w[-1]).astype(jnp.int32)
    return (tile_start, tile_stop, step_win, step_chunk, step_start,
            chunk_first, num_steps)


def _broadcast_kernel(w_ref, ctab_a, ctab_b, gc_ref, out_ref):
    """Segmented broadcast: expand compact table rows into slot space.

    Each output chunk's 128 slots reference ≤ 128 consecutive compact rows
    (ranks increase by +1 across runs — ``binning.expand_compact``), so a
    256-row window (two 128-row blocks) always covers them; the expansion
    is a one-hot [256, CHUNK] selection matmul on the MXU — no HBM gather.
    """
    c = pl.program_id(0)
    base_row = w_ref[c] * CHUNK    # w_ref holds window BLOCK indices
    ctab = jnp.concatenate([ctab_a[...], ctab_b[...]], axis=0)  # [256, 16]
    rel = gc_ref[...] - base_row                                # [1, CHUNK]
    ri = jax.lax.broadcasted_iota(jnp.int32, (2 * CHUNK, CHUNK), 0)
    oh = (rel == ri).astype(jnp.float32)                        # [256, CHUNK]
    out_ref[...] = jax.lax.dot_general(
        ctab, oh, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                           # [16, CHUNK]


def broadcast_fields(ctable, gauss_c, *, interpret=False, total=None):
    """[P, 16] compact table + [max_pairs] compact ranks → [16, max_pairs]
    slot-space field rows (Pallas; see :func:`_broadcast_kernel`).

    Chunks past the capacity padding produce garbage outputs, which the
    caller already masks via the ``valid`` sentinel keys (a dynamic grid
    trimming them was A/B'd on device and measured a no-op)."""
    P = ctable.shape[0]
    max_pairs = gauss_c.shape[0]
    nc = max_pairs // CHUNK
    p_pad = ((P + CHUNK - 1) // CHUNK) * CHUNK + CHUNK
    ctable = jnp.pad(ctable, ((0, p_pad - P), (0, 0)))
    win_blk = gauss_c[::CHUNK] >> 7                      # [nc] window block
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((CHUNK, NFIELD), lambda c, w: (w[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, NFIELD), lambda c, w: (w[c] + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK), lambda c, w: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((NFIELD, CHUNK), lambda c, w: (0, c),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        _broadcast_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((NFIELD, max_pairs), jnp.float32)],
        interpret=interpret,
    )(win_blk, ctable, ctable, gauss_c[None, :])[0]


def _tile_visible(cfg, fslot, tcx, tcy):
    """Per-pair visibility over its tile box: max alpha ≥ 1/255 anywhere.

    ``power`` is concave (the conic is PSD by construction: +0.3 px
    dilation keeps det > 0), so its max over the box is 0 when the mean
    lies inside, else the max of the four edge maxima — each a 1-D concave
    quadratic with a clamped stationary point. Exact, hence conservative
    only through the continuous-box relaxation (box ⊇ pixel grid)."""
    mx, my = fslot[0], fslot[1]
    a, b, c = fslot[2], fslot[3], fslot[4]
    opac = fslot[5]
    x0 = tcx * cfg.tile_w
    x1 = x0 + (cfg.tile_w - 1)
    y0 = tcy * cfg.tile_h
    y1 = y0 + (cfg.tile_h - 1)
    inside = (mx >= x0) & (mx <= x1) & (my >= y0) & (my <= y1)

    def q(dx, dy):
        return -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy

    def edge_x(xe):
        dx = mx - xe
        py = jnp.clip(my + b * dx / jnp.maximum(c, 1e-12), y0, y1)
        return q(dx, my - py)

    def edge_y(ye):
        dy = my - ye
        px = jnp.clip(mx + b * dy / jnp.maximum(a, 1e-12), x0, x1)
        return q(mx - px, dy)

    pmax = jnp.maximum(jnp.maximum(edge_x(x0), edge_x(x1)),
                       jnp.maximum(edge_y(y0), edge_y(y1)))
    pmax = jnp.where(inside, 0.0, pmax)
    # visible ⟺ opac · exp(pmax) ≥ 1/255 ⟺ pmax ≥ -log(255 · opac).
    # The margin keeps boundary pairs whose in-kernel power (MXU bilinear
    # form, different summation order / bf16-pass rounding) could land on
    # the other side of the gate — culling must agree with the kernel's own
    # eligibility decision, not just the exact one.
    thresh = -jnp.log(jnp.maximum(255.0 * opac, 1e-12))
    return pmax >= thresh - (0.05 + 0.01 * jnp.abs(thresh))


def _sort_stage(cfg, means2d, conic, opacity, color, depth, rect, area,
                max_pairs: int):
    """Shared fused staging: expansion → segmented broadcast → through-sort
    fields. Returns (fields [16, max_pairs] with rows 10-12 holding the
    sorted tile id and tile origin (f32 exact), s_tile, s_gc, ids, n_emit,
    tile_start, tile_stop, total, max_per_tile)."""
    from deblurgs_tpu.ops import binning as binning_lib

    num_tiles = cfg.num_tiles
    total_tiles = cfg.total_tiles
    P = means2d.shape[0]                  # = n_images · per-image P
    p_img = P // cfg.n_images
    gauss_c, ids, valid, local, total = binning_lib.expand_compact(
        area.astype(jnp.int32), max_pairs)
    n_emit = jnp.sum((area > 0).astype(jnp.int32))

    x0f = rect[:, 0].astype(jnp.float32)
    y0f = rect[:, 1].astype(jnp.float32)
    wf = jnp.maximum(rect[:, 2] - rect[:, 0], 1).astype(jnp.float32)
    # col 13: stacked-tile offset of the row's image (batched rendering —
    # image s owns tiles [s·num_tiles, (s+1)·num_tiles))
    if cfg.n_images > 1:
        toff = ((jnp.arange(P, dtype=jnp.int32) // p_img)
                * num_tiles).astype(jnp.float32)[:, None]
    else:
        toff = jnp.zeros((P, 1), jnp.float32)
    table = jnp.concatenate(
        [means2d, conic, opacity[:, None], color, depth[:, None],
         x0f[:, None], y0f[:, None], wf[:, None], toff,
         jnp.zeros((P, NFIELD - 14), jnp.float32)],
        axis=-1,
    )                                                    # [P, 16]
    ctable = table[ids]                                  # [P, 16] (P rows)
    fslot = broadcast_fields(ctable, gauss_c, interpret=cfg.interpret,
                             total=total)

    # per-slot tile id (f32 arithmetic exact: values < 2^24, see binning)
    localf = local.astype(jnp.float32)
    dy = jnp.floor(localf / fslot[12])
    dx = localf - dy * fslot[12]
    tcx = fslot[10] + dx                                 # tile coords
    tcy = fslot[11] + dy
    tile = (fslot[13] + tcy * cfg.tiles_x + tcx).astype(jnp.int32)
    tile = jnp.where(valid, tile, total_tiles)

    if cfg.tile_cull and not cfg.need_n_contrib:
        # EXACT per-pair tile cull: a rect-binned pair whose alpha stays
        # below 1/255 over the whole tile box can never pass the kernel's
        # eligibility gate (forward.cu:337: skip alpha < 1/255), so images
        # and gradients are bit-for-bit unaffected — retire it to the sort
        # tail, shrinking the blend volume (the CUDA reference keeps all
        # rect pairs; exact culling is the TPU win that offsets the
        # vectorized kernel's inability to early-out per pixel). The max of
        # the concave quadratic `power` over the box is 0 if the mean lies
        # inside, else the max of the four clamped edge maxima. Disabled
        # when n_contrib is requested: culling shifts the reference's
        # index-within-full-rect-list diagnostic.
        keep = _tile_visible(cfg, fslot, tcx, tcy)
        tile = jnp.where(keep, tile, total_tiles)
        valid = valid & keep
    # large FINITE sentinel: the sorted depth row doubles as field row 9,
    # and a masked column's `w = 0` would turn an inf into 0·inf = NaN in
    # the CD contraction (matmuls sum masked columns too)
    depth_key = jnp.where(valid, fslot[9], jnp.float32(3e37))
    gc_sent = jnp.where(valid, gauss_c, P).astype(jnp.int32)

    sorted_ops = jax.lax.sort(
        (tile, depth_key, gc_sent) + tuple(fslot[i] for i in range(9)),
        num_keys=2, is_stable=True,
    )
    s_tile, s_depth, s_gc = sorted_ops[0], sorted_ops[1], sorted_ops[2]
    # rows 10-12: tile id + tile origin per slot (f32 exact, < 2^24) — the
    # mixed-layout kernel reads per-column tile identity/origin from the
    # fields block itself (a chunk spans several tiles). Origins come from
    # the PER-IMAGE tile id (int math — stacked ids mod num_tiles)
    s_tile_img = s_tile % num_tiles if cfg.n_images > 1 else s_tile
    tyi_i = s_tile_img // cfg.tiles_x
    s_tilef = s_tile.astype(jnp.float32)
    tx0 = ((s_tile_img - tyi_i * cfg.tiles_x)
           * cfg.tile_w).astype(jnp.float32)
    ty0 = (tyi_i * cfg.tile_h).astype(jnp.float32)
    fields = jnp.stack(
        list(sorted_ops[3:12]) + [s_depth, s_tilef, tx0, ty0]
        + [jnp.zeros_like(s_depth)] * (NFIELD - 13), axis=0)

    tq = jnp.arange(total_tiles, dtype=jnp.int32)
    from deblurgs_tpu.ops.binning import searchsorted_right
    tile_start = searchsorted_right(s_tile, tq - 1)
    tile_stop = searchsorted_right(s_tile, tq)
    max_per_tile = jnp.max(tile_stop - tile_start)
    return (fields, s_tile, s_gc, ids, n_emit, tile_start, tile_stop,
            total, max_per_tile)


def prepare_fused(cfg, means2d, conic, opacity, color, depth, rect, area,
                  max_pairs: int):
    """Expansion → segmented broadcast → through-sort field staging.

    Replaces [gather rect rows] + [sort ids] + [gather field rows] with ONE
    compact-table build (P rows), a sequential-DMA broadcast kernel, and a
    sort that carries the field rows as operands — TPU gathers/scatters
    cost per row (~15 ns), so at 1080p bench scale this removes ~600k
    gathered rows from the hot path. Returns (Prepared, num_pairs,
    max_per_tile). With ``cfg.layout == "mixed"`` the step maps come from
    :mod:`pallas_blend_mixed` (single-pass mixed-tile chunk grid)."""
    (fields, s_tile, s_gc, ids, n_emit, tile_start, tile_stop,
     total, max_per_tile) = _sort_stage(
        cfg, means2d, conic, opacity, color, depth, rect, area, max_pairs)

    if getattr(cfg, "layout", "lockstep") == "mixed":
        from deblurgs_tpu.ops import pallas_blend_mixed as mixed

        prep = mixed.prepare_mixed(cfg, fields, s_tile, s_gc, ids, n_emit,
                                   tile_start, tile_stop, total, max_pairs)
        return prep, total, max_per_tile
    if cfg.n_images > 1:
        raise NotImplementedError(
            "batched multi-view rendering requires layout='mixed'")

    num_tiles = cfg.num_tiles
    (tile_start, tile_stop, step_tile, step_chunk, step_start,
     chunk_first, num_steps) = _step_maps(num_tiles, tile_start, tile_stop,
                                          max_pairs, cfg.window)
    owner = (s_tile % cfg.window).astype(jnp.int32) if cfg.window > 1 \
        else None
    prep = Prepared(
        fields=fields, pair_gauss=s_gc,
        tile_start=tile_start, tile_stop=tile_stop,
        step_tile=step_tile, step_chunk=step_chunk, step_start=step_start,
        chunk_first=chunk_first, ids=ids, n_emit=n_emit, owner=owner,
        num_steps=num_steps)
    return prep, total, max_per_tile


def prepare(cfg, pair_gauss, pair_tile, tile_start, tile_stop,
            means2d, conic, opacity, color, depth) -> Prepared:
    """Field gather + step maps from a pre-built :class:`Binning` (the
    gather-based staging path; the training hot path uses
    :func:`prepare_fused`, which replaces the per-row gathers with the
    segmented-broadcast kernel + through-sort fields)."""
    num_tiles = cfg.num_tiles
    max_pairs = pair_gauss.shape[0]
    assert max_pairs % CHUNK == 0, "max_pairs must be CHUNK-aligned"
    owner = (pair_tile % cfg.window).astype(jnp.int32) if cfg.window > 1 \
        else None
    (tile_start, tile_stop, step_tile, step_chunk, step_start,
     chunk_first, num_steps) = _step_maps(num_tiles, tile_start, tile_stop,
                                          max_pairs, cfg.window)

    P = means2d.shape[0]
    g = jnp.clip(pair_gauss, 0, P - 1)
    table = jnp.concatenate(
        [
            means2d,                       # x, y
            conic,                         # a, b, c
            opacity[:, None],
            color,                         # r, g, b
            depth[:, None],
            jnp.zeros((P, NFIELD - 10), jnp.float32),
        ],
        axis=-1,
    )                                                     # [P, 16]
    fields = jnp.where((pair_gauss < P)[:, None], table[g], 0.0)
    return Prepared(fields=fields.T, pair_gauss=pair_gauss,
                    tile_start=tile_start, tile_stop=tile_stop,
                    step_tile=step_tile, step_chunk=step_chunk,
                    step_start=step_start, chunk_first=chunk_first,
                    owner=owner, num_steps=num_steps)


def _utri(exclusive: bool = False):
    """Upper-triangular ones [CHUNK, CHUNK]: ``x @ utri`` is the inclusive
    (strict upper → exclusive) prefix sum along the lane (pair) axis. Built
    with iota (kernels cannot capture host constants)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return ((ri < ci) if exclusive else (ri <= ci)).astype(jnp.float32)


_PREFIX_IMPL = _os.environ.get("DEBLURGS_PREFIX_IMPL", "bf16x2")


def _grid_size(prep: Prepared):
    # static bound only: a dynamic grid (= prep.num_steps, trimming the
    # masked tail) was A/B'd on device and measured a no-op — dead steps
    # skip their @pl.when bodies and their block DMAs are pipelined out
    # (runs/r3_m32_dyngrid.log: 18.84 vs 18.89 ms)
    return prep.step_tile.shape[0]


def _prefix_lane(x, exclusive: bool = False):
    """Inclusive (or exclusive) prefix sum along the lane (last) axis via a
    [CHUNK, CHUNK] upper-triangular ones-matmul on the MXU.

    Default: **double-bfloat16** operands (x = hi + lo split) with f32
    accumulation — two single-pass bf16 matmuls instead of the multi-pass
    exact-f32 MXU contraction, ~3× faster on a v5e (4.1 ms → 1.3 ms at
    1080p/100k bench scale) with ≤|x|·2⁻¹⁷ input-rounding error, well
    inside the kernel's 1e-4 parity budget. ``DEBLURGS_PREFIX_IMPL=f32``
    selects the exact contraction; a Hillis-Steele lane-rotation scan was
    also measured and is ~30% slower end-to-end than even the f32 matmul
    (lane rotations are shuffle ops the VPU doesn't stream).
    """
    if _PREFIX_IMPL == "f32":
        return jnp.dot(x, _utri(exclusive),
                       preferred_element_type=jnp.float32)
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    ut = _utri(exclusive).astype(jnp.bfloat16)
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    return dot(hi, ut) + dot(lo, ut)


def _pixel_features(cfg):
    """Tile-local pixel features [PX, 8] = [1, p, q, p², q², p·q, 0, 0]
    (p, q = pixel coords relative to the tile origin — small, so the
    bilinear power/moment factorization is exact in f32)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (cfg.tile_px, 1), 0)
    p = jax.lax.rem(i, cfg.tile_w).astype(jnp.float32)
    q = jax.lax.div(i, cfg.tile_w).astype(jnp.float32)
    one = jnp.ones((cfg.tile_px, 1), jnp.float32)
    zero = jnp.zeros((cfg.tile_px, 1), jnp.float32)
    return jnp.concatenate([one, p, q, p * p, q * q, p * q, zero, zero], 1)


def _tile_origin(cfg, t):
    tx0 = (jax.lax.rem(t, cfg.tiles_x) * cfg.tile_w).astype(jnp.float32)
    ty0 = (jax.lax.div(t, cfg.tiles_x) * cfg.tile_h).astype(jnp.float32)
    return tx0, ty0


def _chunk_core(data, tx0, ty0, pf, U, base, start, stop):
    """Shared per-chunk math. ``data``: [16, CHUNK] VMEM block holding the
    sorted pairs [base, base+CHUNK); only columns in [start, stop) belong to
    this step's tile (the rest are masked ineligible).

    Returns per-chunk arrays oriented [PX, CHUNK] plus per-pair rows
    [1, CHUNK].
    """
    xl = data[0:1, :] - tx0                       # [1, CHUNK] tile-local
    yl = data[1:2, :] - ty0
    ca = data[2:3, :]
    cb = data[3:4, :]
    cc = data[4:5, :]
    opac = data[5:6, :]
    b0 = -0.5 * (ca * xl * xl + cc * yl * yl) - cb * xl * yl
    b1 = ca * xl + cb * yl
    b2 = cc * yl + cb * xl
    zero = jnp.zeros_like(b0)
    b8 = jnp.concatenate(
        [b0, b1, b2, -0.5 * ca, -0.5 * cc, -cb, zero, zero], 0)  # [8, CHUNK]
    power = jax.lax.dot_general(
        pf, b8, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                             # [PX, CHUNK] (MXU)
    # min(power, 0) clamp: eligible lanes always have power ≤ 0, so the
    # clamp is exact where G matters — but it must NOT be skipped for the
    # ineligible lanes: the MXU bilinear form's cancellation error scales
    # with its term magnitudes (ca·xl² can be ~1e8 for hugely anisotropic
    # splats, and det can go numerically negative), so computed power can
    # exceed +88 and exp overflows to inf. The backward then computes
    # G · dL_dalpha with a masked-zero dL_dalpha — inf·0 = NaN — which the
    # moment matmul spreads into the pair's mean2d/conic/opacity grads
    # (the round-3 meso-joint NaN at it≈6800; color grads carry no G
    # factor, which is why f_dc stayed finite in the poisoned state).
    G = jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(0.99, opac * G)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    pos = base + col
    within = (pos >= start) & (pos < stop)        # [1, CHUNK]
    elig = within & (power <= 0.0) & (alpha >= _ALPHA_MIN)
    alpha_eff = jnp.where(elig, alpha, 0.0)
    mult = 1.0 - alpha_eff
    logm = jnp.log(mult)
    # EXCLUSIVE prefix → P_prev directly (one exp), then P_run by a single
    # multiply — the inclusive form needs a [PX, CHUNK] divide to recover
    # P_prev, and VPU division is a multi-pass reciprocal+NR sequence
    csum_ex = _prefix_lane(logm, exclusive=True)
    P_prev = U * jnp.exp(csum_ex)                 # [PX, CHUNK]
    P_run = P_prev * mult
    live = P_run >= _T_EPS
    w = jnp.where(live, alpha_eff, 0.0) * P_prev
    comp = live & elig
    return dict(G=G, mult=mult, P_run=P_run, P_prev=P_prev, w=w, comp=comp,
                xl=xl, yl=yl, ca=ca, cb=cb, cc=cc, opac=opac, col=col,
                within=within)


def _tile_step_scalars(cfg, start, stop, j):
    """Per-(sub-)tile scalar step geometry. Returns (fc, last, real,
    is_last): the tile's first/last chunk indices, whether lockstep
    position ``j`` is a real chunk of this tile (vs a clamped repeat when
    another sub-tile of the window has more chunks), and whether it is the
    tile's unique final chunk step (fires even for empty tiles)."""
    cnt = stop - start
    fc = jax.lax.div(start, CHUNK)
    nst = jnp.where(cnt > 0,
                    jax.lax.div(stop - 1, CHUNK) - fc + 1, 1)
    last = fc + nst - 1
    real = (fc + j) <= last
    is_last = (fc + j) == last
    return fc, last, real, is_last


def _forward_kernel(cfg, window, sw_ref, sc_ref, ss_ref, cf_ref, start_ref,
                    stop_ref, *refs):
    field_refs = refs[:window]
    if cfg.need_n_contrib:
        cd_out, t_out, ncon_out, u_scr, ncon_scr = refs[window:]
    else:
        cd_out, t_out, u_scr = refs[window:]
        ncon_out = ncon_scr = None
    c = pl.program_id(0)
    w = sw_ref[c]
    j = c - ss_ref[w]
    px_n = cfg.tile_px

    @pl.when(c == ss_ref[w])
    def _():
        # first step of this window: reset accumulators (the out blocks
        # were just switched by the pipeline). T / n_contrib / the running
        # product live in [PX, 1] COLUMN layout end to end — outputs
        # included; the host transposes once. (An in-kernel conversion to
        # row layout costs either a per-step relayout matmul or, on each
        # tile's last step, materializing a [PX, PX] identity — ~1M VPU
        # lanes per tile, which measured as ~9 ms at 1080p/100k.)
        u_scr[...] = jnp.ones((window, px_n, 1), jnp.float32)
        t_out[...] = jnp.ones((window, px_n, 1), jnp.float32)
        if cfg.need_n_contrib:
            ncon_scr[...] = jnp.zeros((window, px_n, 1), jnp.float32)
        cd_out[...] = jnp.zeros((window, 4, px_n), jnp.float32)

    pf = _pixel_features(cfg)
    for q in range(window):
        t = w * window + q
        start = start_ref[t]
        stop = stop_ref[t]
        _, _, real, is_last = _tile_step_scalars(cfg, start, stop, j)
        base = sc_ref[q, c] * CHUNK
        U = u_scr[q]

        @pl.when(real & (base < stop) & (jnp.max(U) >= _T_EPS))
        def _(q=q, t=t, start=start, stop=stop, base=base, U=U):
            tx0, ty0 = _tile_origin(cfg, t)
            data = field_refs[q][...]                    # [16, CHUNK]
            cc = _chunk_core(data, tx0, ty0, pf, U, base, start, stop)
            P_run, wgt, comp = cc["P_run"], cc["w"], cc["comp"]

            # color+depth: [4, CHUNK] ⨯ [PX, CHUNK] → [4, PX] (MXU)
            cd_out[q] += jax.lax.dot_general(
                data[6:10, :], wgt,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if cfg.need_n_contrib:
                # n_contrib = composited index within the tile's list
                idx1 = (base + cc["col"] - start + 1).astype(jnp.float32)
                ncon_scr[q] = jnp.maximum(
                    ncon_scr[q],
                    jnp.max(jnp.where(comp, idx1, 0.0), axis=1,
                            keepdims=True))
            # frozen output T = last composited P; unfrozen U multiplies on
            t_out[q] = jnp.minimum(
                t_out[q],
                jnp.min(jnp.where(comp, P_run, 2.0), axis=1, keepdims=True))
            u_scr[q] = P_run[:, CHUNK - 1:]

        if cfg.need_n_contrib:

            @pl.when(is_last)
            def _(q=q):
                ncon_out[q] = ncon_scr[q].astype(jnp.int32)


def _backward_kernel(cfg, window, sw_ref, sc_ref, ss_ref, cf_ref, start_ref,
                     stop_ref, *refs):
    field_refs = refs[:window]
    dl_ref, bgdot_ref = refs[window], refs[window + 1]
    grads_outs = refs[window + 2:window + 2 + window]
    u_scr, w_scr = refs[window + 2 + window:]
    c = pl.program_id(0)
    w = sw_ref[c]
    j = c - ss_ref[w]
    px_n = cfg.tile_px

    @pl.when(c == ss_ref[w])
    def _():
        u_scr[...] = jnp.ones((window, px_n, 1), jnp.float32)
        w_scr[...] = jnp.zeros((window, px_n, 1), jnp.float32)

    pf = _pixel_features(cfg)
    for q in range(window):
        t = w * window + q
        start = start_ref[t]
        stop = stop_ref[t]
        _, _, real, _ = _tile_step_scalars(cfg, start, stop, j)
        base = sc_ref[q, c] * CHUNK
        U = u_scr[q]
        grads_out = grads_outs[q]
        compute = real & (base < stop) & (jnp.max(U) >= _T_EPS)
        # a chunk straddling a tile boundary is visited by consecutive
        # steps of this operand's stream; only the first writer may clear
        # the whole block
        prev = jnp.where(cf_ref[q, c] == 1,
                         jnp.zeros((NFIELD, CHUNK), jnp.float32),
                         grads_out[...])

        @pl.when(compute)
        def _(q=q, t=t, start=start, stop=stop, base=base, U=U, prev=prev,
              grads_out=grads_out):
            tx0, ty0 = _tile_origin(cfg, t)
            data = field_refs[q][...]
            cc = _chunk_core(data, tx0, ty0, pf, U, base, start, stop)
            G, mult, P_prev, wgt, comp = (cc["G"], cc["mult"], cc["P_prev"],
                                          cc["w"], cc["comp"])
            dl = dl_ref[q]                       # [4, PX]: color 0-2, depth 3
            bgdot = bgdot_ref[q]                 # [PX, 1] (host sends columns)

            # per-pair dl·c: [4, PX] ⨯ [4, CHUNK] → [PX, CHUNK] (MXU)
            dl_dot_c = jax.lax.dot_general(
                dl, data[6:10, :],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            # suffix via "total − prefix": host passes
            # bgdot_in = dl·Σtotal + T_fin·(bg·dL_color + zfar·dL_depth), so
            # S_j = Σ_{k>j} w_k (dl·c_k) + T_fin·bg_dot = bgdot_in − dlW_j
            wc = wgt * dl_dot_c                               # [PX, CHUNK]
            dlW = w_scr[q] + _prefix_lane(wc)                 # inclusive
            S = bgdot - dlW
            dL_dalpha = jnp.where(comp, dl_dot_c * P_prev - S / mult, 0.0)

            # moment matmul: all pixel reductions at once.
            # N = G·dL_dalpha; M = opac·N; with local pixel features (p, q):
            #   T0..T5 = Σ_px N·[1, p, q, p², q², pq] → one MXU contraction
            N = G * dL_dalpha                                 # [PX, CHUNK]
            mom = jax.lax.dot_general(
                pf, N, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                 # [8, CHUNK]
            xl, yl = cc["xl"], cc["yl"]
            ca, cb, ccc, opac = cc["ca"], cc["cb"], cc["cc"], cc["opac"]
            M0 = opac * mom[0:1, :]
            M1 = opac * mom[1:2, :]
            M2 = opac * mom[2:3, :]
            M3 = opac * mom[3:4, :]
            M4 = opac * mom[4:5, :]
            M5 = opac * mom[5:6, :]
            Sx = xl * M0 - M1                # Σ M·dx   (dx = xl − p)
            Sy = yl * M0 - M2                # Σ M·dy
            dmx = -ca * Sx - cb * Sy
            dmy = -ccc * Sy - cb * Sx
            dca = -0.5 * (xl * xl * M0 - 2.0 * xl * M1 + M3)
            dcb = -(xl * yl * M0 - xl * M2 - yl * M1 + M5)
            dcc = -0.5 * (yl * yl * M0 - 2.0 * yl * M2 + M4)
            dop = mom[0:1, :]                # Σ G·dL_dalpha
            # per-pair color/depth grads: [4, PX] ⨯ [PX, CHUNK] → [4, CHUNK]
            dcold = jnp.dot(dl, wgt, preferred_element_type=jnp.float32)
            gout = jnp.concatenate(
                [dmx, dmy, dca, dcb, dcc, dop, dcold,
                 jnp.zeros((NFIELD - 10, CHUNK), jnp.float32)],
                axis=0,
            )                                                 # [16, CHUNK]
            grads_out[...] = jnp.where(cc["within"], gout, prev)

            u_scr[q] = cc["P_run"][:, CHUNK - 1:]
            w_scr[q] = dlW[:, CHUNK - 1:]

        @pl.when(jnp.logical_not(compute))
        def _(start=start, stop=stop, base=base, real=real, prev=prev,
              grads_out=grads_out):
            # real steps skipped by early exit / empty tiles: this tile's
            # columns contribute exactly zero — but keep other writers'.
            # Clamped lockstep repeats (real == False) must preserve the
            # block verbatim: their ``within`` span was already written by
            # this tile's true last-chunk step.
            col = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
            pos = base + col
            within = (pos >= start) & (pos < stop) & real
            grads_out[...] = jnp.where(
                within, jnp.zeros((NFIELD, CHUNK), jnp.float32), prev)


def forward(cfg, prep):
    """Pallas forward. Returns tiled (C [T,PX,3], D [T,PX], T, n_con)."""
    if not isinstance(prep, Prepared):
        from deblurgs_tpu.ops import pallas_blend_mixed as mixed

        return mixed.forward_mixed(cfg, prep)
    nt, px_n = cfg.num_tiles, cfg.tile_px
    window = cfg.window
    nt_pad = prep.tile_start.shape[0]
    out_specs = [
        pl.BlockSpec((window, 4, px_n),
                     lambda c, sw, sc, ss, cf, b, e: (sw[c], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((window, px_n, 1),
                     lambda c, sw, sc, ss, cf, b, e: (sw[c], 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nt_pad, 4, px_n), jnp.float32),
        jax.ShapeDtypeStruct((nt_pad, px_n, 1), jnp.float32),
    ]
    scratch = [pltpu.VMEM((window, px_n, 1), jnp.float32)]
    if cfg.need_n_contrib:
        out_specs.append(
            pl.BlockSpec((window, px_n, 1),
                         lambda c, sw, sc, ss, cf, b, e: (sw[c], 0, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((nt_pad, px_n, 1), jnp.int32))
        scratch.append(pltpu.VMEM((window, px_n, 1), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(_grid_size(prep),),
        in_specs=[
            pl.BlockSpec((NFIELD, CHUNK),
                         (lambda c, sw, sc, ss, cf, b, e, q=q: (0, sc[q, c])),
                         memory_space=pltpu.VMEM)
            for q in range(window)
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        functools.partial(_forward_kernel, cfg, window),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=cfg.interpret,
    )(prep.step_tile, prep.step_chunk, prep.step_start, prep.chunk_first,
      prep.tile_start, prep.tile_stop,
      *([prep.fields] * window))
    cd, t_fin = outs[0], outs[1]
    C = jnp.moveaxis(cd[:nt, :3, :], 1, 2)        # [T, PX, 3]
    D = cd[:nt, 3, :]
    if cfg.need_n_contrib:
        ncon = outs[2][:nt, :, 0]
    else:
        ncon = jnp.zeros((nt, px_n), jnp.int32)
    return C, D, t_fin[:nt, :, 0], ncon


_REDUCE_IMPL = _os.environ.get("DEBLURGS_REDUCE", "segsum")


def _reduce_kernel(w_ref, g_ref, r_ref, out_a, out_b):
    """Windowed segmented reduction (inverse of :func:`_broadcast_kernel`):
    each grads chunk's ranks span ≤ 128 consecutive values, so a one-hot
    [CHUNK, 2·CHUNK] matmul routes its columns into two adjacent 128-rank
    output blocks (parity-interleaved buffers), accumulated in VMEM."""
    c = pl.program_id(0)
    blk = w_ref[c]                       # lower covered 128-rank block
    base = blk * CHUNK

    @pl.when((c == 0) | (w_ref[jnp.maximum(c - 1, 0)] < blk))
    def _():
        # first chunk whose lower block is blk: both bound buffer rows are
        # fresh (ranks advance ≤1 per slot so blk advances ≤1 per chunk,
        # and buffer A's row blk was never the previous upper — uppers live
        # in buffer B)
        out_a[...] = jnp.zeros((CHUNK, NFIELD), jnp.float32)
        out_b[...] = jnp.zeros((CHUNK, NFIELD), jnp.float32)

    rel = r_ref[...] - jnp.float32(base)                   # [1, CHUNK]
    ri = jax.lax.broadcasted_iota(
        jnp.int32, (CHUNK, CHUNK), 0).astype(jnp.float32)
    oh_lo = (rel == ri).astype(jnp.float32)                # [CHUNK, CHUNK]
    oh_hi = (rel == ri + CHUNK).astype(jnp.float32)
    g = g_ref[...]                                         # [NFIELD, CHUNK]
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_a[...] += dot(oh_lo, g)                            # [CHUNK, NFIELD]
    out_b[...] += dot(oh_hi, g)


def _reduce_sorted(pair_gauss, pair_grads, P, *, interpret=False):
    """Sort grads by compact rank, then windowed-matmul reduce → [P, 16].

    Replaces the unsorted scatter-add lowering of ``segment_sum``: compact
    ranks 0..n_emit-1 are all present, so after the sort any 128-slot chunk
    spans ≤ 128 consecutive ranks and routes into two adjacent aligned
    output blocks."""
    max_pairs = pair_gauss.shape[0]
    # sentinel slots (P) sort after all real ranks and land in the padding
    # block sliced off below
    key = jnp.minimum(pair_gauss, P).astype(jnp.int32)
    ops = jax.lax.sort(
        (key,) + tuple(pair_grads[i] for i in range(10)), num_keys=1,
        is_stable=False)
    s_rank = ops[0]
    # zero sentinel columns: never-visited chunks hold uninitialized HBM
    # (possibly NaN) and the one-hot matmul would propagate 0·NaN = NaN
    # into real rows (the scatter-based segment_sum routes by index and is
    # immune — this path must mask)
    real = (s_rank < P)[None, :]
    g_sorted = jnp.stack(
        [jnp.where(real[0], o, 0.0) for o in ops[1:]]
        + [jnp.zeros_like(ops[1])] * (NFIELD - 10), axis=0)
    p_blocks = (P + CHUNK - 1) // CHUNK + 1
    nc = max_pairs // CHUNK
    rankf = s_rank.astype(jnp.float32)[None, :]
    win = jnp.minimum(s_rank[::CHUNK] // CHUNK,
                      jnp.int32(p_blocks - 1))             # [nc] lower block
    # parity-free dual buffers: out_a accumulates each chunk's lower-block
    # rows, out_b the upper; block b's total = a[b] rows written when b was
    # a lower block, plus b[b] rows written when it was the upper — both
    # buffers are indexed by the block id itself, so the host just adds.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((NFIELD, CHUNK), lambda c, w: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK), lambda c, w: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK, NFIELD), lambda c, w: (w[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, NFIELD),
                         lambda c, w: (jnp.minimum(w[c] + 1, p_blocks - 1),
                                       0),
                         memory_space=pltpu.VMEM),
        ],
    )
    out_a, out_b = pl.pallas_call(
        functools.partial(_reduce_kernel),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((p_blocks * CHUNK, NFIELD), jnp.float32),
            jax.ShapeDtypeStruct((p_blocks * CHUNK, NFIELD), jnp.float32),
        ],
        interpret=interpret,
    )(win, g_sorted, rankf)
    # buffer rows never bound by any chunk hold uninitialized values — mask
    # by the blocks each buffer actually touched before combining
    touched_a = jnp.zeros((p_blocks,), jnp.int32).at[win].set(
        1, mode="drop")
    touched_b = jnp.zeros((p_blocks,), jnp.int32).at[
        jnp.minimum(win + 1, p_blocks - 1)].set(1, mode="drop")
    rep = lambda m: jnp.repeat(m, CHUNK)[:, None] == 1
    out = (jnp.where(rep(touched_a), out_a, 0.0)
           + jnp.where(rep(touched_b), out_b, 0.0))
    return out[:P]


def reduce_pair_grads(prep, pair_grads, num_gaussians, interpret=False):
    """Segment-sum pair grads by Gaussian id (deterministic, atomics-free)
    and, on the fused path, scatter the compact sums back to original rows.
    ``pair_grads``: [NFIELD, max_pairs]. Returns [P, NFIELD] sums."""
    P = num_gaussians
    if _REDUCE_IMPL == "window" and prep.ids is not None:
        sums = _reduce_sorted(prep.pair_gauss, pair_grads, P,
                              interpret=interpret)
    else:
        seg = jnp.minimum(prep.pair_gauss, P)
        sums = jax.ops.segment_sum(pair_grads.T, seg,
                                   num_segments=P + 1)[:P]
    if prep.ids is not None:
        # fused path: pair_gauss holds COMPACT ranks — scatter the compact
        # sums back to original rows (ids is unique on the first n_emit
        # rows; the padding tail repeats the last id and its sums are zero)
        ids_u = jnp.where(jnp.arange(P) < prep.n_emit, prep.ids, P)
        sums = jnp.zeros_like(sums).at[ids_u].set(
            sums, mode="drop", unique_indices=True)
    return sums


def backward(cfg, prep, num_gaussians, bg,
             final_T_t, dL_dpix_t, dL_dpixd_t, C_t, D_t):
    """Pallas backward from the shared ``Prepared`` residuals.

    ``C_t``/``D_t``: the forward's pre-background color/depth sums — used
    for the total−prefix suffix trick."""
    if not isinstance(prep, Prepared):
        from deblurgs_tpu.ops import pallas_blend_mixed as mixed

        return mixed.backward_mixed(cfg, prep, num_gaussians, bg,
                                    final_T_t, dL_dpix_t, dL_dpixd_t,
                                    C_t, D_t)
    nt, px_n = cfg.num_tiles, cfg.tile_px
    window = cfg.window
    nt_pad = prep.tile_start.shape[0]
    dl = jnp.concatenate(
        [jnp.moveaxis(dL_dpix_t, 2, 1), dL_dpixd_t[:, None, :]], axis=1
    )                                                     # [T, 4, PX]
    sigma_dot = jnp.sum(C_t * dL_dpix_t, axis=-1) + D_t * dL_dpixd_t  # [T, PX]
    bg_dot = (dL_dpix_t @ bg) + cfg.z_far * dL_dpixd_t                # [T, PX]
    bgdot_full = sigma_dot + final_T_t * bg_dot                       # [T, PX]
    if nt_pad != nt:
        dl = jnp.pad(dl, ((0, nt_pad - nt), (0, 0), (0, 0)))
        bgdot_full = jnp.pad(bgdot_full, ((0, nt_pad - nt), (0, 0)))

    max_pairs = prep.fields.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(_grid_size(prep),),
        in_specs=[
            pl.BlockSpec((NFIELD, CHUNK),
                         (lambda c, sw, sc, ss, cf, b, e, q=q: (0, sc[q, c])),
                         memory_space=pltpu.VMEM)          # fields (per q)
            for q in range(window)
        ] + [
            pl.BlockSpec((window, 4, px_n),
                         lambda c, sw, sc, ss, cf, b, e: (sw[c], 0, 0),
                         memory_space=pltpu.VMEM),         # dl
            pl.BlockSpec((window, px_n, 1),
                         lambda c, sw, sc, ss, cf, b, e: (sw[c], 0, 0),
                         memory_space=pltpu.VMEM),         # bgdot' (column)
        ],
        out_specs=[
            pl.BlockSpec((NFIELD, CHUNK),
                         (lambda c, sw, sc, ss, cf, b, e, q=q: (0, sc[q, c])),
                         memory_space=pltpu.VMEM)
            for q in range(window)
        ],
        scratch_shapes=[
            pltpu.VMEM((window, px_n, 1), jnp.float32),
            pltpu.VMEM((window, px_n, 1), jnp.float32),
        ],
    )
    grads_list = pl.pallas_call(
        functools.partial(_backward_kernel, cfg, window),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((NFIELD, max_pairs), jnp.float32)
                   for _ in range(window)],
        interpret=cfg.interpret,
    )(prep.step_tile, prep.step_chunk, prep.step_start, prep.chunk_first,
      prep.tile_start, prep.tile_stop, *([prep.fields] * window), dl,
      bgdot_full[:, :, None])

    if window == 1:
        pair_grads = grads_list[0]
    else:
        # a slot's true grad lives in its OWNING sub-tile's operand; the
        # other operands hold zeros (straddle visits) or garbage (blocks
        # their stream never mapped) — select by owner, don't sum blindly
        # where (not multiply): unmapped blocks can hold NaN garbage and
        # NaN·0 = NaN
        owner = prep.owner[None, :]                       # [1, max_pairs]
        pair_grads = jnp.where(owner == 0, grads_list[0], 0.0)
        for q in range(1, window):
            pair_grads = pair_grads + jnp.where(owner == q,
                                                grads_list[q], 0.0)

    # chunks past the last tile's stop are never visited (garbage) and all
    # carry the sentinel id P — dropped inside reduce_pair_grads
    sums = reduce_pair_grads(prep, pair_grads, num_gaussians,
                             interpret=cfg.interpret)
    dm = sums[:, 0:2]
    dc = sums[:, 2:5]
    do = sums[:, 5]
    dcol = sums[:, 6:9]
    dd = sums[:, 9]
    dbg = jnp.einsum("tp,tpc->c", final_T_t, dL_dpix_t)
    return dm, dc, do, dcol, dd, dbg

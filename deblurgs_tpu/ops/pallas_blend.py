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
    re-runs the field gather or the step maps)."""

    fields: jax.Array      # [16, max_pairs] f32 pair field rows
    pair_gauss: jax.Array  # [max_pairs] int32 owning Gaussian (P = invalid)
    tile_start: jax.Array  # [num_tiles] int32 into the sorted pair array
    tile_stop: jax.Array   # [num_tiles] int32 one-past-end
    step_tile: jax.Array   # [NS] int32 tile per grid step
    step_chunk: jax.Array  # [NS] int32 source chunk per grid step
    step_start: jax.Array  # [num_tiles] int32 first grid step per tile
    chunk_first: jax.Array  # [NS] int32 1 = first step writing this chunk


def _num_steps_static(max_pairs: int, num_tiles: int) -> int:
    """Upper bound on (tile, overlapped-chunk) grid steps: each tile covers
    ≤ cnt/CHUNK + 1 chunks (⇒ Σ ≤ max_pairs/CHUNK + T) and empty tiles
    claim one mask-empty step each (already inside the +T)."""
    return max_pairs // CHUNK + num_tiles


def prepare(cfg, pair_gauss, pair_tile, tile_start, tile_stop,
            means2d, conic, opacity, color, depth) -> Prepared:
    """Field gather + step maps shared by forward and backward.

    One row gather from a packed [P, 16] table (TPU gathers cost per row —
    never per-field element gathers), one bandwidth-bound transpose to the
    DMA-friendly [16, max_pairs] layout, and three tiny unique-index
    scatter/cummax passes for the step maps.
    """
    num_tiles = cfg.num_tiles
    max_pairs = pair_gauss.shape[0]
    assert max_pairs % CHUNK == 0, "max_pairs must be CHUNK-aligned"
    ns = _num_steps_static(max_pairs, num_tiles)

    tile_start = tile_start.astype(jnp.int32)
    tile_stop = tile_stop.astype(jnp.int32)
    cnt = tile_stop - tile_start
    first_chunk = tile_start // CHUNK
    # empty tiles take 1 step (their output must still be initialized)
    nsteps = jnp.where(cnt > 0,
                       (tile_stop - 1) // CHUNK - first_chunk + 1, 1)
    step_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(nsteps)[:-1].astype(jnp.int32)])

    # step → tile: unique scatter of tile ids at each tile's first step,
    # then running max (tail steps inherit the last tile)
    marks = jnp.full((ns,), -1, jnp.int32).at[step_start].set(
        jnp.arange(num_tiles, dtype=jnp.int32), mode="drop",
        unique_indices=True)
    step_tile = jnp.clip(jax.lax.cummax(marks), 0, num_tiles - 1)
    steps = jnp.arange(ns, dtype=jnp.int32)
    step_chunk = jnp.clip(
        first_chunk[step_tile] + (steps - step_start[step_tile]),
        0, max_pairs // CHUNK - 1)
    chunk_first = jnp.concatenate(
        [jnp.ones(1, jnp.int32),
         (step_chunk[1:] != step_chunk[:-1]).astype(jnp.int32)])

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
                    step_start=step_start, chunk_first=chunk_first)


def _utri():
    """Upper-triangular ones (inclusive) [CHUNK, CHUNK]: ``x @ utri`` is the
    inclusive prefix sum along the lane (pair) axis. Built with iota
    (kernels cannot capture host constants)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (ri <= ci).astype(jnp.float32)


def _eye(n):
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (ri == ci).astype(jnp.float32)


def _col_to_row(col):
    """[N, 1] -> [1, N] via an MXU contraction (avoids a sublane↔lane
    relayout transpose)."""
    n = col.shape[0]
    return jax.lax.dot_general(
        col, _eye(n), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _row_to_col(row):
    """[1, N] -> [N, 1] via an MXU contraction."""
    n = row.shape[1]
    return jax.lax.dot_general(
        _eye(n), row, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


_PREFIX_IMPL = _os.environ.get("DEBLURGS_PREFIX_IMPL", "bf16x2")


def _prefix_lane(x):
    """Inclusive prefix sum along the lane (last) axis via a [CHUNK, CHUNK]
    upper-triangular ones-matmul on the MXU.

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
        return jnp.dot(x, _utri(), preferred_element_type=jnp.float32)
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    ut = _utri().astype(jnp.bfloat16)
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
    G = jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(0.99, opac * G)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    pos = base + col
    within = (pos >= start) & (pos < stop)        # [1, CHUNK]
    elig = within & (power <= 0.0) & (alpha >= _ALPHA_MIN)
    alpha_eff = jnp.where(elig, alpha, 0.0)
    mult = 1.0 - alpha_eff
    logm = jnp.log(mult)
    csum = _prefix_lane(logm)                     # inclusive prefix
    P_run = U * jnp.exp(csum)                     # [PX, CHUNK]
    P_prev = P_run / mult
    live = P_run >= _T_EPS
    w = jnp.where(live, alpha_eff * P_prev, 0.0)
    comp = live & elig
    return dict(G=G, mult=mult, P_run=P_run, P_prev=P_prev, w=w, comp=comp,
                xl=xl, yl=yl, ca=ca, cb=cb, cc=cc, opac=opac, col=col,
                within=within)


def _forward_kernel(cfg, ct_ref, sc_ref, ss_ref, cf_ref, start_ref, stop_ref,
                    fields_ref, cd_out, t_out, ncon_out, u_scr):
    c = pl.program_id(0)
    t = ct_ref[c]
    start = start_ref[t]
    stop = stop_ref[t]
    base = sc_ref[c] * CHUNK
    px_n = cfg.tile_px

    @pl.when(c == ss_ref[t])
    def _():
        # first step of this tile: reset accumulators (the out blocks were
        # just switched to this tile by the pipeline)
        u_scr[...] = jnp.ones((px_n, 1), jnp.float32)
        cd_out[0] = jnp.zeros((4, px_n), jnp.float32)
        t_out[0] = jnp.ones((1, px_n), jnp.float32)
        ncon_out[0] = jnp.zeros((1, px_n), jnp.int32)

    U = u_scr[...]

    @pl.when((base < stop) & (jnp.max(U) >= _T_EPS))
    def _():
        pf = _pixel_features(cfg)
        tx0, ty0 = _tile_origin(cfg, t)
        data = fields_ref[...]                           # [16, CHUNK]
        cc = _chunk_core(data, tx0, ty0, pf, U, base, start, stop)
        P_run, w, comp = cc["P_run"], cc["w"], cc["comp"]

        # color+depth accumulation: [4, CHUNK] ⨯ [PX, CHUNK] → [4, PX] (MXU)
        cd_out[0] += jax.lax.dot_general(
            data[6:10, :], w, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if cfg.need_n_contrib:
            # n_contrib counts the composited index within the tile's list
            idx1 = (base + cc["col"] - start + 1).astype(jnp.float32)
            ncon_f = jnp.max(jnp.where(comp, idx1, 0.0), axis=1,
                             keepdims=True)
            ncon_out[0] = jnp.maximum(ncon_out[0],
                                      _col_to_row(ncon_f).astype(jnp.int32))
        # frozen output T = last composited P; unfrozen U keeps multiplying
        t_new = jnp.min(jnp.where(comp, P_run, 2.0), axis=1, keepdims=True)
        t_out[0] = jnp.minimum(t_out[0], _col_to_row(t_new))
        u_scr[...] = P_run[:, CHUNK - 1:]


def _backward_kernel(cfg, ct_ref, sc_ref, ss_ref, cf_ref, start_ref, stop_ref,
                     fields_ref, dl_ref, bgdot_ref, grads_out,
                     u_scr, w_scr):
    c = pl.program_id(0)
    t = ct_ref[c]
    start = start_ref[t]
    stop = stop_ref[t]
    base = sc_ref[c] * CHUNK
    px_n = cfg.tile_px

    @pl.when(c == ss_ref[t])
    def _():
        u_scr[...] = jnp.ones((px_n, 1), jnp.float32)
        w_scr[...] = jnp.zeros((px_n, 1), jnp.float32)

    U = u_scr[...]
    compute = (base < stop) & (jnp.max(U) >= _T_EPS)
    # a chunk straddling a tile boundary is visited by consecutive steps;
    # only the first writer may clear the whole block
    prev = jnp.where(cf_ref[c] == 1,
                     jnp.zeros((NFIELD, CHUNK), jnp.float32),
                     grads_out[...])

    @pl.when(compute)
    def _():
        pf = _pixel_features(cfg)
        tx0, ty0 = _tile_origin(cfg, t)
        data = fields_ref[...]
        cc = _chunk_core(data, tx0, ty0, pf, U, base, start, stop)
        G, mult, P_prev, w, comp = (cc["G"], cc["mult"], cc["P_prev"],
                                    cc["w"], cc["comp"])
        dl = dl_ref[0]                        # [4, PX]: color 0-2, depth 3
        bgdot = _row_to_col(bgdot_ref[0])     # [PX, 1]

        # per-pair dl·c: [4, PX] ⨯ [4, CHUNK] → [PX, CHUNK] (MXU)
        dl_dot_c = jax.lax.dot_general(
            dl, data[6:10, :], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # suffix via "total − prefix": host passes
        # bgdot_in = dl·Σtotal + T_fin·(bg·dL_color + zfar·dL_depth), so
        # S_j = Σ_{k>j} w_k (dl·c_k) + T_fin·bg_dot = bgdot_in − dlW_j
        wc = w * dl_dot_c                                  # [PX, CHUNK]
        dlW = w_scr[...] + _prefix_lane(wc)                # inclusive
        S = bgdot - dlW
        dL_dalpha = jnp.where(comp, dl_dot_c * P_prev - S / mult, 0.0)

        # moment matmul: all pixel reductions at once.
        # N = G·dL_dalpha; M = opac·N; with local pixel features (p, q):
        #   T0..T5 = Σ_px N·[1, p, q, p², q², pq]  →  one MXU contraction
        N = G * dL_dalpha                                  # [PX, CHUNK]
        mom = jax.lax.dot_general(
            pf, N, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [8, CHUNK]
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
        dcold = jnp.dot(dl, w, preferred_element_type=jnp.float32)
        gout = jnp.concatenate(
            [dmx, dmy, dca, dcb, dcc, dop, dcold,
             jnp.zeros((NFIELD - 10, CHUNK), jnp.float32)],
            axis=0,
        )                                                  # [16, CHUNK]
        grads_out[...] = jnp.where(cc["within"], gout, prev)

        u_scr[...] = cc["P_run"][:, CHUNK - 1:]
        w_scr[...] = dlW[:, CHUNK - 1:]

    @pl.when(jnp.logical_not(compute))
    def _():
        # skipped steps (early-exit / empty tiles / capacity tail): this
        # tile's columns contribute exactly zero — but keep other writers'
        col = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        pos = base + col
        within = (pos >= start) & (pos < stop)
        grads_out[...] = jnp.where(within,
                                   jnp.zeros((NFIELD, CHUNK), jnp.float32),
                                   prev)


def forward(cfg, prep: Prepared):
    """Pallas forward. Returns tiled (C [T,PX,3], D [T,PX], T, n_con)."""
    nt, px_n = cfg.num_tiles, cfg.tile_px
    ns = prep.step_tile.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((NFIELD, CHUNK),
                         lambda c, ct, sc, ss, cf, b, e: (0, sc[c]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 4, px_n),
                         lambda c, ct, sc, ss, cf, b, e: (ct[c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, px_n),
                         lambda c, ct, sc, ss, cf, b, e: (ct[c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, px_n),
                         lambda c, ct, sc, ss, cf, b, e: (ct[c], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((px_n, 1), jnp.float32),
        ],
    )
    cd, t_fin, ncon = pl.pallas_call(
        functools.partial(_forward_kernel, cfg),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nt, 4, px_n), jnp.float32),
            jax.ShapeDtypeStruct((nt, 1, px_n), jnp.float32),
            jax.ShapeDtypeStruct((nt, 1, px_n), jnp.int32),
        ],
        interpret=cfg.interpret,
    )(prep.step_tile, prep.step_chunk, prep.step_start, prep.chunk_first,
      prep.tile_start, prep.tile_stop, prep.fields)
    C = jnp.moveaxis(cd[:, :3, :], 1, 2)        # [T, PX, 3]
    D = cd[:, 3, :]
    return C, D, t_fin[:, 0, :], ncon[:, 0, :]


def backward(cfg, prep: Prepared, num_gaussians, bg,
             final_T_t, dL_dpix_t, dL_dpixd_t, C_t, D_t):
    """Pallas backward from the shared ``Prepared`` residuals.

    ``C_t``/``D_t``: the forward's pre-background color/depth sums — used
    for the total−prefix suffix trick."""
    nt, px_n = cfg.num_tiles, cfg.tile_px
    ns = prep.step_tile.shape[0]
    dl = jnp.concatenate(
        [jnp.moveaxis(dL_dpix_t, 2, 1), dL_dpixd_t[:, None, :]], axis=1
    )                                                     # [T, 4, PX]
    sigma_dot = jnp.sum(C_t * dL_dpix_t, axis=-1) + D_t * dL_dpixd_t  # [T, PX]
    bg_dot = (dL_dpix_t @ bg) + cfg.z_far * dL_dpixd_t                # [T, PX]
    bgdot_full = sigma_dot + final_T_t * bg_dot                       # [T, PX]

    max_pairs = prep.fields.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((NFIELD, CHUNK),
                         lambda c, ct, sc, ss, cf, b, e: (0, sc[c]),
                         memory_space=pltpu.VMEM),         # fields
            pl.BlockSpec((1, 4, px_n),
                         lambda c, ct, sc, ss, cf, b, e: (ct[c], 0, 0),
                         memory_space=pltpu.VMEM),         # dl
            pl.BlockSpec((1, 1, px_n),
                         lambda c, ct, sc, ss, cf, b, e: (ct[c], 0, 0),
                         memory_space=pltpu.VMEM),         # bgdot'
        ],
        out_specs=[
            pl.BlockSpec((NFIELD, CHUNK),
                         lambda c, ct, sc, ss, cf, b, e: (0, sc[c]),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((px_n, 1), jnp.float32),
            pltpu.VMEM((px_n, 1), jnp.float32),
        ],
    )
    pair_grads = pl.pallas_call(
        functools.partial(_backward_kernel, cfg),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((NFIELD, max_pairs), jnp.float32)],
        interpret=cfg.interpret,
    )(prep.step_tile, prep.step_chunk, prep.step_start, prep.chunk_first,
      prep.tile_start, prep.tile_stop, prep.fields, dl,
      bgdot_full[:, None, :])[0]

    # segment-sum pair grads by Gaussian id (deterministic, atomics-free).
    # Chunks past the last tile's stop are never visited (garbage) and all
    # carry the sentinel id P — dropped by the slice.
    P = num_gaussians
    seg = jnp.minimum(prep.pair_gauss, P)
    sums = jax.ops.segment_sum(pair_grads.T, seg, num_segments=P + 1)[:P]
    dm = sums[:, 0:2]
    dc = sums[:, 2:5]
    do = sums[:, 5]
    dcol = sums[:, 6:9]
    dd = sums[:, 9]
    dbg = jnp.einsum("tp,tpc->c", final_T_t, dL_dpix_t)
    return dm, dc, do, dcol, dd, dbg

"""Single-pass mixed-tile chunk kernels (the ``layout="mixed"`` blend path).

The lockstep kernels in :mod:`pallas_blend` enumerate (tile × chunk) steps:
a 128-pair chunk straddling a tile boundary is visited once per tile, and a
window's sub-tiles advance in lockstep — so fine (16×16) tiles, whose pair
lists are shorter than a chunk, pay a boundary revisit for almost every
chunk plus lockstep-imbalance waste. This module removes both: the grid is
over **chunks**, each visited once (plus rare window-advance revisits), and
a chunk's pairs may belong to several tiles:

- **Segmented prefix products.** The per-tile transmittance recurrence
  becomes ``exp`` of a *segmented* prefix sum of ``log(1-alpha)``: one MXU
  matmul against a data-dependent mask ``M2[k,j] = (seg_k == seg_j)·(k<j)``
  built from the sorted tile-id row (segments are lane-contiguous). The
  running product of the tile straddling a chunk boundary is carried in
  VMEM scratch and applied to the chunk's *first* segment only.
- **One-hot MXU output routing.** Each step binds two output blocks of
  ``W = cfg.window`` tiles each (parity-interleaved buffers: even blocks
  live in one buffer, odd in the other, so any 2W-tile window of the sorted
  tile axis is addressable with aligned BlockSpecs). Per-tile color/depth
  sums and final-T candidates route through one-hot [W, CHUNK] masks as
  small MXU contractions — pair-pixel volume never multiplies by W.
- **Frozen-T extraction without per-tile passes.** ``final_T`` (the last
  composited product, reference ``forward.cu:373``) = the running product
  at each pixel's *last live* lane of the segment; a lane-shift + select
  marks that lane, and a one-hot matmul routes it; cross-chunk candidates
  min-accumulate (products are non-increasing, so the minimum positive
  candidate is the frozen value).

Reference semantics preserved exactly (same eligibility gates, 0.99 alpha
clamp, T<1e-4 freeze; ``forward.cu:273-392``, ``backward.cu:463-640``).
Staging (expansion → segmented broadcast → through-sort fields) is shared
with the lockstep path (``pallas_blend._sort_stage``); the sorted tile id
and tile origin ride the fields rows 10-12 so the kernel reads per-column
tile identity without gathers.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deblurgs_tpu.ops import pallas_blend as base

CHUNK = base.CHUNK
NFIELD = base.NFIELD
_ALPHA_MIN = base._ALPHA_MIN
_T_EPS = base._T_EPS

# smap rows (per grid step). The four binary flags share one bitfield row:
# the prefetched SMEM operand is padded to 8 sublanes, so 9 rows would pad
# to 16 and blow the 1 MB SMEM budget at ~2M pairs (6 rows pad to 8,
# capping max_pairs near ~4M instead).
_CHUNK_R = 0      # source chunk index
_SE_R = 1         # even-buffer block row
_SO_R = 2         # odd-buffer block row
_BSTART_R = 3     # first covered W-block (window base = b_start * W)
_FLAGS_R = 4      # bit0 = first step binding the even block (FVE)
                  # bit1 = first step binding the odd block (FVO)
                  # bit2 = first visit of this chunk (CF)
                  # bit3 = real step (ALIVE; static-grid tail gating)
                  # bit4 = single-segment continuation (SS): every lane of
                  #        the chunk belongs to the carry tile — the only
                  #        shape where the early-exit skip is sound
_CT_R = 5         # carry tile: tile id of the previous chunk's last slot
_FVE_BIT, _FVO_BIT, _CF_BIT, _ALIVE_BIT, _SS_BIT = 1, 2, 4, 8, 16


def _flag(sm_ref, c, bit):
    """Scalar flag read from the packed bitfield row (div/mod keeps the
    lowering on plain scalar arithmetic)."""
    return (sm_ref[_FLAGS_R, c] // bit) % 2 == 1


class PreparedMixed(NamedTuple):
    """Mixed-layout staging (shared fwd/bwd VJP residuals)."""

    fields: jax.Array      # [16, max_pairs] rows 10-12 = tile, tx0, ty0
    pair_gauss: jax.Array  # [max_pairs] compact ranks (fused path)
    smap: jax.Array        # [6, NS] int32 per-step maps (see _*_R above)
    start_pad: jax.Array   # [2*nbuf*W] int32 tile_start padded (n_contrib)
    tile_start: jax.Array  # [num_tiles]
    tile_stop: jax.Array   # [num_tiles]
    num_steps: jax.Array   # [] int32 real step count (dynamic grid)
    ids: jax.Array | None = None
    n_emit: jax.Array | None = None


def _nbuf(cfg) -> int:
    nblk = -(-cfg.total_tiles // cfg.window)
    return nblk // 2 + 1


def _ck(cfg) -> int:
    """Effective pairs-per-step for the mixed grid (cfg.chunk override)."""
    return getattr(cfg, "chunk", 0) or CHUNK


def _ns_static(cfg, max_pairs: int) -> int:
    """Step bound: one visit per chunk + window advances. Each extra visit
    moves the covered-block pointer by 2 and block pointers only move
    forward, so extra visits ≤ nblk/2 overall."""
    nblk = -(-cfg.total_tiles // cfg.window)
    return max_pairs // _ck(cfg) + nblk // 2 + 2


def prepare_mixed(cfg, fields, s_tile, s_gc, ids, n_emit,
                  tile_start, tile_stop, total, max_pairs: int):
    """Step maps for the mixed-chunk grid from the sorted tile ids."""
    W = cfg.window
    nt = cfg.total_tiles
    CK = _ck(cfg)
    nc = max_pairs // CK
    nbuf = _nbuf(cfg)
    ns = _ns_static(cfg, max_pairs)

    slots = jnp.arange(nc, dtype=jnp.int32) * CK
    # a chunk earns visits only if it holds any real-tile pair (tile-culled
    # pairs sort to the sentinel tail alongside capacity padding)
    has = (slots < total) & (s_tile[slots] < nt)
    t_lo = jnp.minimum(s_tile[slots], nt - 1)
    last = jnp.clip(slots + CK - 1, 0, jnp.maximum(total - 1, 0))
    t_hi = jnp.minimum(s_tile[last], nt - 1)
    b_lo = t_lo // W
    b_hi = jnp.maximum(t_hi // W, b_lo)
    # visits per chunk: ceil(covered blocks / 2) — each visit binds two
    # consecutive W-blocks (one even, one odd)
    visits = jnp.where(has, (b_hi - b_lo) // 2 + 1, 0)
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(visits)[:-1].astype(jnp.int32)])
    num_steps = (starts[-1] + visits[-1]).astype(jnp.int32)

    marks = jnp.full((ns,), -1, jnp.int32).at[
        jnp.where(visits > 0, starts, ns)].set(
        jnp.arange(nc, dtype=jnp.int32), mode="drop", unique_indices=True)
    step_chunk = jnp.clip(jax.lax.cummax(marks), 0, nc - 1)
    steps = jnp.arange(ns, dtype=jnp.int32)
    alive = (steps < num_steps).astype(jnp.int32)
    v = steps - starts[step_chunk]
    b_start = jnp.clip(b_lo[step_chunk] + 2 * v, 0, 2 * nbuf - 2)
    even_lower = (b_start % 2) == 0
    b_even = jnp.where(even_lower, b_start, b_start + 1)
    b_odd = jnp.where(even_lower, b_start + 1, b_start)
    se = b_even >> 1
    so = b_odd >> 1
    fv_e = jnp.concatenate(
        [jnp.ones(1, jnp.int32), (se[1:] != se[:-1]).astype(jnp.int32)])
    fv_o = jnp.concatenate(
        [jnp.ones(1, jnp.int32), (so[1:] != so[:-1]).astype(jnp.int32)])
    chunk_first = jnp.concatenate(
        [jnp.ones(1, jnp.int32),
         (step_chunk[1:] != step_chunk[:-1]).astype(jnp.int32)])
    ct = jnp.concatenate(
        [jnp.full(1, -1, jnp.int32), s_tile[slots[1:] - 1]])
    sct = ct[step_chunk]
    # SS: the whole chunk continues the carry tile's segment (first AND
    # last lane equal the carry tile — a chunk ending at the sorted-total
    # boundary has sentinel tail lanes and fails the last-lane test, which
    # is the conservative/correct outcome). SS chunks span one tile, so
    # they always get exactly one visit (b_lo == b_hi).
    last_raw = jnp.minimum(slots + CK - 1, max_pairs - 1)
    ss = (has & (s_tile[slots] == ct)
          & (s_tile[last_raw] == ct)).astype(jnp.int32)
    sss = ss[step_chunk]
    flags = (fv_e * _FVE_BIT + fv_o * _FVO_BIT
             + chunk_first * _CF_BIT + alive * _ALIVE_BIT + sss * _SS_BIT)
    smap = jnp.stack([step_chunk, se, so, b_start, flags, sct])  # [6, NS]

    start_pad = jnp.pad(tile_start.astype(jnp.int32),
                        (0, 2 * nbuf * W - nt), constant_values=0)
    return PreparedMixed(
        fields=fields, pair_gauss=s_gc, smap=smap, start_pad=start_pad,
        tile_start=tile_start, tile_stop=tile_stop, num_steps=num_steps,
        ids=ids, n_emit=n_emit)


def _grid_size(prep: PreparedMixed):
    # static bound only — the dynamic-grid variant measured a no-op on
    # device (see base._grid_size)
    return prep.smap.shape[1]


def _shift_left(x):
    """x[:, j] <- x[:, j+1] (0-fill at the last lane).

    Lane rotate + iota mask: Mosaic rejects the concatenate-of-slices
    formulation ("result/input offset mismatch on non-concat dimension")."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane == x.shape[1] - 1, jnp.zeros((), x.dtype),
                     pltpu.roll(x, x.shape[1] - 1, 1))


def _shift_right(x, fill):
    """x[:, j] <- x[:, j-1] (fill at lane 0)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane == 0, jnp.asarray(fill, x.dtype),
                     pltpu.roll(x, 1, 1))


def _eye(n, dtype=jnp.float32):
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (ri == ci).astype(dtype)


def _row_prefix_incl(x):
    """Inclusive lane-prefix sum of a [1, CHUNK] row via log2(CHUNK)
    shift-adds. Tiny VPU ops replacing a [1, CHUNK]@[CHUNK, CHUNK] MXU
    contraction — at one call per grid step the matmul's fill latency was
    pure per-step overhead (the kernel is step-overhead bound, r5 A/B).
    Exact for small-int-valued f32 rows."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < x.shape[1]:
        x = x + jnp.where(lane >= s, pltpu.roll(x, s, 1),
                          jnp.zeros((), x.dtype))
        s *= 2
    return x


def _seg_structure(trow):
    """Per-chunk segment structure from the sorted tile-id row [1, CHUNK].

    Returns (segrow [1, CHUNK] small-int f32 segment ids, seg_end [1, CHUNK]
    bool, M2ex / M2in [CHUNK, CHUNK] f32 segmented strict/inclusive
    lower-prefix masks). Segment ids are ≤ CHUNK, exactly representable in
    f32; the transpose matmul runs with f32 operands because Mosaic rejects
    its bf16-in/f32-out lowering (vector.broadcast), and it is tiny next to
    the [PX, CHUNK] passes. The data-path prefix products in
    :func:`_prefix_masked` keep the double-bfloat16 MXU split."""
    ck = trow.shape[1]
    boundary = (trow != _shift_right(trow, -1.0)).astype(jnp.float32)
    # inclusive row prefix of boundary -> segment index (1..ck)
    segrow = _row_prefix_incl(boundary)                   # [1, ck]
    seg_end = segrow != _shift_left(segrow)
    # segment ids as a column. f32 operands: Mosaic's verifier rejects the
    # bf16-in/f32-out lowering of this [ck,ck]@[1,ck] contraction
    # (vector.broadcast bf16->f32), and the matmul is tiny anyway.
    segcol = jax.lax.dot_general(
        _eye(ck, jnp.float32), segrow,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # [ck, 1]
    same = segcol == segrow                               # [ck, ck]
    ri = jax.lax.broadcasted_iota(jnp.int32, (ck, ck), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (ck, ck), 1)
    m2ex = (same & (ri < ci)).astype(jnp.float32)
    m2in = (same & (ri <= ci)).astype(jnp.float32)
    return segrow, seg_end, m2ex, m2in


import os

_MASKED_PREFIX_IMPL = os.environ.get("DEBLURGS_MASKED_PREFIX", "f32")


def _prefix_masked(x, m2):
    """Segmented lane-prefix sum: x @ m2.

    Default f32 operands: round 3's Mosaic rejected the bf16-in/f32-out
    lowering of this contraction against the *computed* segment mask
    ("Bad lhs type", any PX — runs/r3_m32_bf16.log). The
    ``DEBLURGS_MASKED_PREFIX=dbf16`` switch retries the double-bfloat16
    hi/lo split (two full-rate bf16 matmuls ≈ half the 1/4-rate f32 one,
    input rounding ≤ |x|·2^-17) for A/B on newer compilers."""
    if _MASKED_PREFIX_IMPL == "dbf16":
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        m = m2.astype(jnp.bfloat16)
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dot(hi, m) + dot(lo, m)
    return jnp.dot(x, m2, preferred_element_type=jnp.float32)


def _onehot(trow, b_start, W):
    """One-hot routing masks for the two bound W-blocks.

    Returns (oh_lo, oh_hi) each [W, CHUNK]: oh_lo[w, j] = 1 iff column j's
    tile is b_start*W + w; oh_hi covers the following block."""
    rel = trow - jnp.float32(b_start * W)                  # [1, ck]
    ri = jax.lax.broadcasted_iota(
        jnp.int32, (W, trow.shape[1]), 0).astype(jnp.float32)
    oh_lo = (rel == ri).astype(jnp.float32)
    oh_hi = (rel == ri + W).astype(jnp.float32)
    return oh_lo, oh_hi


def _mixed_core(cfg, data, carry_f, U, need_G=False, need_comp=True):
    """Shared per-chunk math: eligibility, segmented products, weights.

    ``data``: [16, CHUNK] fields block; ``carry_f``: f32 scalar tile id of
    the straddling segment; ``U``: [PX, 1] carried running product.
    ``need_comp`` skips the composited mask (only n_contrib and the
    backward consume it — one [PX, CHUNK] VPU pass saved in the shipping
    forward)."""
    pf = base._pixel_features(cfg)
    trow = data[10:11, :]
    xl = data[0:1, :] - data[11:12, :]
    yl = data[1:2, :] - data[12:13, :]
    ca = data[2:3, :]
    cb = data[3:4, :]
    cc = data[4:5, :]
    opac = data[5:6, :]
    # log(opac) folds into the bilinear form's constant row: one exp yields
    # raw alpha directly (the separate opac·G multiply was a full
    # [PX, CHUNK] pass); the power ≤ 0 gate becomes a row-broadcast compare
    logop = jnp.log(jnp.maximum(opac, 1e-38))             # [1, CHUNK]
    b0 = -0.5 * (ca * xl * xl + cc * yl * yl) - cb * xl * yl + logop
    b1 = ca * xl + cb * yl
    b2 = cc * yl + cb * xl
    zero = jnp.zeros_like(b0)
    b8 = jnp.concatenate(
        [b0, b1, b2, -0.5 * ca, -0.5 * cc, -cb, zero, zero], 0)
    powero = jax.lax.dot_general(
        pf, b8, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)       # [PX, CHUNK] power+log(o)
    # min(powero, 0) clamp: eligible lanes satisfy powero ≤ log(opac) ≤ 0
    # (activated opacity ≤ 1), so the clamp is exact wherever alpha or G is
    # consumed. Ineligible lanes MUST be clamped: the bilinear form's f32
    # cancellation error scales with its term magnitudes, so computed
    # powero can exceed +88 for degenerate/hyper-anisotropic splats and
    # exp overflows to inf — the backward's G·dL_dalpha then yields
    # inf·0 = NaN and the moment matmul poisons the pair's mean2d/conic/
    # opacity grads (root cause of the round-3 meso-joint curve NaN).
    araw = jnp.exp(jnp.minimum(powero, 0.0))      # = opac · exp(power)
    alpha = jnp.minimum(0.99, araw)
    elig = (powero <= logop) & (araw >= _ALPHA_MIN)
    alpha_eff = jnp.where(elig, alpha, 0.0)
    mult = 1.0 - alpha_eff
    logm = jnp.log(mult)
    segrow, seg_end, m2ex, m2in = _seg_structure(trow)
    csum_ex = _prefix_masked(logm, m2ex)
    fs = trow == carry_f                                   # first segment
    U_eff = jnp.where(fs, U, 1.0)                          # [PX, CHUNK]
    P_prev = U_eff * jnp.exp(csum_ex)
    P_run = P_prev * mult
    out = dict(trow=trow, xl=xl, yl=yl, ca=ca, cb=cb, cc=cc, opac=opac,
               mult=mult, P_prev=P_prev, P_run=P_run,
               fs=fs, seg_end=seg_end, m2in=m2in, pf=pf)
    if cfg.fast:
        # fast mode: the per-lane T<1e-4 freeze gates are dropped. Every
        # gated quantity differs by ≤ _T_EPS-order terms (the same order as
        # the CUDA early-exit's own truncation, forward.cu:339-341), which
        # buys back the live/last-live [PX, CHUNK] pass volume per chunk.
        out["live"] = None
        out["w"] = alpha_eff * P_prev
        if need_comp or need_G:
            out["comp"] = elig
    else:
        live = P_run >= _T_EPS
        out["live"] = live
        out["w"] = jnp.where(live, alpha_eff, 0.0) * P_prev
        if need_comp or need_G:
            out["comp"] = live & elig
    if need_G:
        # raw alpha = opac·G: the backward folds the per-pair opac scaling
        # out of the [PX, CHUNK] volume — moments contracted against
        # araw·dL_dalpha come out pre-scaled by opac, and only the opacity
        # grad needs the (row-cheap) division back (see
        # _backward_chunk_body)
        out["araw"] = araw
    return out


def _c_exp(data, oh2, nblk):
    """One-hot-masked per-channel rows for the routing contraction:
    [4·nblk, CHUNK], rows (block, channel)-major."""
    return jnp.concatenate(
        [oh2[b:b + 1, :] * data[6 + ch:7 + ch, :]
         for b in range(nblk) for ch in range(4)], axis=0)


def _nc_cand(cfg, nc_b, oh, blk, pos1, compf, st_ref):
    """n_contrib candidates for one W-block (diagnostic path only)."""
    W = cfg.window
    cand = []
    for w in range(W):
        idx1 = pos1 - jnp.float32(st_ref[blk * W + w])
        m = compf * oh[w:w + 1, :]
        cand.append(jnp.max(jnp.where(m > 0, idx1, 0.0), axis=1,
                            keepdims=True))                # [PX, 1]
    nc_b[0] = jnp.maximum(nc_b[0], jnp.concatenate(cand, axis=1))


def _forward_kernel(cfg, sm_ref, st_ref, f_ref, *refs):
    W = cfg.window
    px_n = cfg.tile_px
    if cfg.need_n_contrib:
        cd_e, t_e, nc_e, cd_o, t_o, nc_o, u_ent, u_pend, dead_s = refs
    else:
        cd_e, t_e, cd_o, t_o, u_ent, u_pend, dead_s = refs
        nc_e = nc_o = None
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        u_pend[...] = jnp.ones((px_n, 1), jnp.float32)
        dead_s[0] = jnp.int32(0)

    for cd_b, t_b, nc_b, fv_bit in (
            (cd_e, t_e, nc_e, _FVE_BIT), (cd_o, t_o, nc_o, _FVO_BIT)):

        @pl.when(_flag(sm_ref, c, fv_bit))
        def _(cd_b=cd_b, t_b=t_b, nc_b=nc_b):
            cd_b[...] = jnp.zeros((1, 4 * W, px_n), jnp.float32)
            t_b[...] = jnp.ones((1, px_n, W), jnp.float32)
            if nc_b is not None:
                nc_b[...] = jnp.zeros((1, px_n, W), jnp.float32)

    @pl.when(_flag(sm_ref, c, _ALIVE_BIT))
    def _():
        @pl.when(_flag(sm_ref, c, _CF_BIT))
        def _():
            u_ent[...] = u_pend[...]

        # chunk-level early exit (the CUDA per-pixel T<1e-4 termination
        # analog, forward.cu:339-341/373): a single-segment-continuation
        # chunk whose carried transmittance is saturated at EVERY pixel is
        # EXACTLY inert — eligibility gates every contribution on
        # P_run >= _T_EPS and products only shrink within a segment, so
        # weights, frozen-T candidates and n_contrib are all unreachable,
        # and carrying u_ent forward keeps every later lane of the segment
        # dead. Skipping saves the whole per-chunk VPU/MXU volume; in a
        # saturated scene most of each heavy tile's sorted tail is dead.
        # The deadness scalar lives in SMEM, written by the body together
        # with the pending carry (one fused [PX,1] reduce when the body
        # runs) — the per-step decision is two scalar reads, so non-SS
        # steps pay nothing (the first, vector-max formulation cost ~7%
        # fwd at bench scale on unsaturated scenes).
        skip = jnp.logical_and(_flag(sm_ref, c, _SS_BIT), dead_s[0] == 1)

        @pl.when(jnp.logical_not(skip))
        def _():
            _forward_chunk_body(cfg, sm_ref, st_ref, f_ref, cd_e, t_e, nc_e,
                                cd_o, t_o, nc_o, u_ent, u_pend, dead_s, c)


def _forward_chunk_body(cfg, sm_ref, st_ref, f_ref, cd_e, t_e, nc_e,
                        cd_o, t_o, nc_o, u_ent, u_pend, dead_s, c):
    W = cfg.window
    CK = _ck(cfg)
    data = f_ref[...]
    carry_f = jnp.float32(sm_ref[_CT_R, c])
    cr = _mixed_core(cfg, data, carry_f, u_ent[...],
                     need_comp=cfg.need_n_contrib)
    pend = cr["P_run"][:, CK - 1:]
    u_pend[...] = pend
    # deadness of the pending carry: a skipped successor chunk leaves both
    # u_pend and this flag untouched, so the flag always describes u_pend
    dead_s[0] = (jnp.max(pend) < _T_EPS).astype(jnp.int32)

    if cfg.fast:
        # fast mode: final-T candidate = the end-of-segment running product
        # (no freeze). For unsaturated pixels this IS the frozen value; for
        # saturated ones both lie below _T_EPS and the image differs by
        # ≤ bg·_T_EPS (depth by ≤ z_far·_T_EPS).
        PL = jnp.where(cr["seg_end"], cr["P_run"], 0.0)
    else:
        # frozen-T candidates: running product at each pixel's last live
        # lane of its segment (monotone products -> min across chunks)
        livef = cr["live"].astype(jnp.float32)
        live_next = _shift_left(livef)
        lastlive = livef * jnp.maximum(
            1.0 - live_next, cr["seg_end"].astype(jnp.float32))
        PL = cr["P_run"] * lastlive                    # [PX, CHUNK]

    b_start = sm_ref[_BSTART_R, c]
    oh_lo, oh_hi = _onehot(cr["trow"], b_start, W)
    even_lower = (b_start % 2) == 0
    # route both bound blocks in ONE contraction each: the one-hot masks
    # reorder to (even-buffer, odd-buffer) so the big operands need no
    # select and the outputs write unconditionally — at ~2 chunks/step the
    # kernel is per-step-overhead bound (r5 A/B: dropping 5 of ~20 VPU
    # passes moved it ~1%), so halving the small-matmul count per step is
    # the lever, not shrinking pass volume
    oh_ev = jnp.where(even_lower, oh_lo, oh_hi)            # [W, CHUNK]
    oh_od = jnp.where(even_lower, oh_hi, oh_lo)
    oh2 = jnp.concatenate([oh_ev, oh_od], axis=0)          # [2W, CHUNK]
    cd2 = jax.lax.dot_general(
        _c_exp(data, oh2, 2 * W), cr["w"],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # [8W, PX]
    cd_e[0] += cd2[:4 * W]
    cd_o[0] += cd2[4 * W:]
    tc2 = jax.lax.dot_general(
        PL, oh2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # [PX, 2W]
    t_e[0] = jnp.minimum(t_e[0], jnp.where(tc2[:, :W] > 0.0,
                                           tc2[:, :W], 2.0))
    t_o[0] = jnp.minimum(t_o[0], jnp.where(tc2[:, W:] > 0.0,
                                           tc2[:, W:], 2.0))
    if cfg.need_n_contrib:
        pos1 = (jnp.float32(sm_ref[_CHUNK_R, c] * CK) + 1.0
                + jax.lax.broadcasted_iota(
                    jnp.int32, (1, CK), 1).astype(jnp.float32))
        compf = cr["comp"].astype(jnp.float32)
        b_even = jnp.where(even_lower, b_start, b_start + 1)
        b_odd = jnp.where(even_lower, b_start + 1, b_start)
        _nc_cand(cfg, nc_e, oh_ev, b_even, pos1, compf, st_ref)
        _nc_cand(cfg, nc_o, oh_od, b_odd, pos1, compf, st_ref)


def forward_mixed(cfg, prep: PreparedMixed):
    """Mixed-layout Pallas forward: (C [T,PX,3], D, T, n_con) tiled."""
    nt, px_n, W = cfg.total_tiles, cfg.tile_px, cfg.window
    nbuf = _nbuf(cfg)
    blk_cd = pl.BlockSpec((1, 4 * W, px_n),
                          lambda c, sm, st: (sm[_SE_R, c], 0, 0),
                          memory_space=pltpu.VMEM)
    blk_cd_o = pl.BlockSpec((1, 4 * W, px_n),
                            lambda c, sm, st: (sm[_SO_R, c], 0, 0),
                            memory_space=pltpu.VMEM)
    blk_t = pl.BlockSpec((1, px_n, W),
                         lambda c, sm, st: (sm[_SE_R, c], 0, 0),
                         memory_space=pltpu.VMEM)
    blk_t_o = pl.BlockSpec((1, px_n, W),
                           lambda c, sm, st: (sm[_SO_R, c], 0, 0),
                           memory_space=pltpu.VMEM)
    out_specs = [blk_cd, blk_t]
    out_shape = [
        jax.ShapeDtypeStruct((nbuf, 4 * W, px_n), jnp.float32),
        jax.ShapeDtypeStruct((nbuf, px_n, W), jnp.float32),
    ]
    if cfg.need_n_contrib:
        out_specs.append(blk_t)
        out_shape.append(jax.ShapeDtypeStruct((nbuf, px_n, W), jnp.float32))
    out_specs += [blk_cd_o, blk_t_o]
    out_shape += [
        jax.ShapeDtypeStruct((nbuf, 4 * W, px_n), jnp.float32),
        jax.ShapeDtypeStruct((nbuf, px_n, W), jnp.float32),
    ]
    if cfg.need_n_contrib:
        out_specs.append(blk_t_o)
        out_shape.append(jax.ShapeDtypeStruct((nbuf, px_n, W), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(_grid_size(prep),),
        in_specs=[
            pl.BlockSpec((NFIELD, _ck(cfg)),
                         lambda c, sm, st: (0, sm[_CHUNK_R, c]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((px_n, 1), jnp.float32),
            pltpu.VMEM((px_n, 1), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_forward_kernel, cfg),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=cfg.interpret,
    )(prep.smap, prep.start_pad, prep.fields)

    if cfg.need_n_contrib:
        cd_e, t_e, nc_e, cd_o, t_o, nc_o = outs
    else:
        cd_e, t_e, cd_o, t_o = outs
        nc_e = nc_o = None

    def interleave(a, b):
        return jnp.stack([a, b], axis=1).reshape((2 * nbuf,) + a.shape[1:])

    cd = interleave(cd_e, cd_o).reshape(2 * nbuf, W, 4, px_n)
    cd = cd.reshape(2 * nbuf * W, 4, px_n)[:nt]            # [nt, 4, PX]
    t_fin = jnp.swapaxes(interleave(t_e, t_o), 1, 2).reshape(
        2 * nbuf * W, px_n)[:nt]
    cnt = (prep.tile_stop - prep.tile_start) > 0           # [nt]
    cd = jnp.where(cnt[:, None, None], cd, 0.0)
    t_fin = jnp.where(cnt[:, None], t_fin, 1.0)
    C = jnp.moveaxis(cd[:, :3, :], 1, 2)
    D = cd[:, 3, :]
    if nc_e is not None:
        ncon = jnp.swapaxes(interleave(nc_e, nc_o), 1, 2).reshape(
            2 * nbuf * W, px_n)[:nt]
        ncon = jnp.where(cnt[:, None], ncon, 0.0).astype(jnp.int32)
    else:
        ncon = jnp.zeros((nt, px_n), jnp.int32)
    return C, D, t_fin, ncon


def _backward_kernel(cfg, sm_ref, st_ref, f_ref, dl_e, dl_o, bgd_e, bgd_o,
                     grads_out, u_ent, u_pend, w_ent, w_pend, dead_s):
    W = cfg.window
    px_n = cfg.tile_px
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        u_pend[...] = jnp.ones((px_n, 1), jnp.float32)
        w_pend[...] = jnp.zeros((px_n, 1), jnp.float32)
        dead_s[0] = jnp.int32(0)

    chunk_first = _flag(sm_ref, c, _CF_BIT)
    prev = jnp.where(chunk_first,
                     jnp.zeros((NFIELD, _ck(cfg)), jnp.float32),
                     grads_out[...])

    @pl.when(_flag(sm_ref, c, _ALIVE_BIT))
    def _():
        @pl.when(chunk_first)
        def _():
            u_ent[...] = u_pend[...]
            w_ent[...] = w_pend[...]

        # chunk-level early exit mirroring the forward (see
        # _forward_kernel): a dead single-segment-continuation chunk has
        # comp ≡ false, so every pair grad is exactly zero, dlW reduces to
        # the broadcast w_ent carry (fs is all-true under SS), and both
        # scratch carries pass through unchanged — only the zero grads
        # block needs writing (its out-block is fresh per chunk).
        skip = jnp.logical_and(_flag(sm_ref, c, _SS_BIT), dead_s[0] == 1)

        @pl.when(skip)
        def _():
            grads_out[...] = prev

        @pl.when(jnp.logical_not(skip))
        def _():
            _backward_chunk_body(cfg, sm_ref, st_ref, f_ref, dl_e, dl_o,
                                 bgd_e, bgd_o, grads_out, u_ent, u_pend,
                                 w_ent, w_pend, dead_s, c, prev)

    @pl.when(jnp.logical_and(jnp.logical_not(_flag(sm_ref, c, _ALIVE_BIT)),
                             chunk_first))
    def _():
        # a dead step can never be a chunk's first visit in the live
        # region; this only fires for the clamped tail, where writing the
        # zeroed prev keeps the block deterministic
        grads_out[...] = prev


def _backward_chunk_body(cfg, sm_ref, st_ref, f_ref, dl_e, dl_o, bgd_e,
                         bgd_o, grads_out, u_ent, u_pend, w_ent, w_pend,
                         dead_s, c, prev):
    W = cfg.window
    CK = _ck(cfg)
    data = f_ref[...]
    carry_f = jnp.float32(sm_ref[_CT_R, c])
    cr = _mixed_core(cfg, data, carry_f, u_ent[...], need_G=True)
    pend = cr["P_run"][:, CK - 1:]
    u_pend[...] = pend
    dead_s[0] = (jnp.max(pend) < _T_EPS).astype(jnp.int32)

    b_start = sm_ref[_BSTART_R, c]
    oh_lo, oh_hi = _onehot(cr["trow"], b_start, W)
    even_lower = (b_start % 2) == 0
    # reorder the one-hot masks to (even-buffer, odd-buffer) so the big
    # buffer operands concatenate without selects and each routed quantity
    # is ONE contraction (the kernel is per-step-overhead bound — see the
    # forward body)
    oh_ev = jnp.where(even_lower, oh_lo, oh_hi)            # [W, CHUNK]
    oh_od = jnp.where(even_lower, oh_hi, oh_lo)
    oh2 = jnp.concatenate([oh_ev, oh_od], axis=0)          # [2W, CHUNK]
    dl2 = jnp.concatenate([dl_e[0], dl_o[0]], axis=0)      # [8W, PX]
    bgd2 = jnp.concatenate([bgd_e[0], bgd_o[0]], axis=1)   # [PX, 2W]

    ce2 = _c_exp(data, oh2, 2 * W)                         # [8W, CHUNK]
    dl_dot_c = jax.lax.dot_general(
        dl2, ce2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [PX, CHUNK]
    bg_cols = jax.lax.dot_general(
        bgd2, oh2, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [PX, CHUNK]

    wgt = cr["w"]
    wc = wgt * dl_dot_c
    dlW = _prefix_masked(wc, cr["m2in"]) + jnp.where(
        cr["fs"], w_ent[...], 0.0)
    w_pend[...] = dlW[:, CK - 1:]
    S = bg_cols - dlW
    dL_dalpha = jnp.where(
        cr["comp"], dl_dot_c * cr["P_prev"] - S / cr["mult"], 0.0)

    # moments against araw·dL_dalpha = opac·G·dL_dalpha: opac is constant
    # per column, so the PX-contraction commutes with the scaling — the
    # moment rows come out pre-multiplied by opac (saving the G = araw/opac
    # [PX, CHUNK] pass) and only dop divides it back, on a [1, CHUNK] row
    N = cr["araw"] * dL_dalpha
    mom = jax.lax.dot_general(
        cr["pf"], N, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [8, CHUNK] (·opac)
    xl, yl = cr["xl"], cr["yl"]
    ca, cb, ccc, opac = cr["ca"], cr["cb"], cr["cc"], cr["opac"]
    M0 = mom[0:1, :]
    M1 = mom[1:2, :]
    M2_ = mom[2:3, :]
    M3 = mom[3:4, :]
    M4 = mom[4:5, :]
    M5 = mom[5:6, :]
    Sx = xl * M0 - M1
    Sy = yl * M0 - M2_
    dmx = -ca * Sx - cb * Sy
    dmy = -ccc * Sy - cb * Sx
    dca = -0.5 * (xl * xl * M0 - 2.0 * xl * M1 + M3)
    dcb = -(xl * yl * M0 - xl * M2_ - yl * M1 + M5)
    dcc = -0.5 * (yl * yl * M0 - 2.0 * yl * M2_ + M4)
    dop = M0 / jnp.maximum(opac, 1e-38)

    # per-pair color/depth grads: route dl to columns per channel (one
    # contraction for both bound blocks; rows pair with oh2 blocks)
    mm2 = jax.lax.dot_general(
        dl2, wgt, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [8W, CK]
    dcold = jnp.zeros((4, CK), jnp.float32)
    for b in range(2 * W):
        dcold = dcold + oh2[b:b + 1, :] * mm2[4 * b:4 * b + 4, :]

    gout = jnp.concatenate(
        [dmx, dmy, dca, dcb, dcc, dop, dcold,
         jnp.zeros((NFIELD - 10, CK), jnp.float32)], axis=0)
    base_t = jnp.float32(b_start * W)
    in_win = (cr["trow"] >= base_t) & (cr["trow"] < base_t + 2 * W)
    grads_out[...] = jnp.where(in_win, gout, prev)



def backward_mixed(cfg, prep: PreparedMixed, num_gaussians, bg,
                   final_T_t, dL_dpix_t, dL_dpixd_t, C_t, D_t):
    """Mixed-layout Pallas backward (same cotangent surface as
    ``pallas_blend.backward``)."""
    nt, px_n, W = cfg.total_tiles, cfg.tile_px, cfg.window
    nbuf = _nbuf(cfg)
    dl = jnp.concatenate(
        [jnp.moveaxis(dL_dpix_t, 2, 1), dL_dpixd_t[:, None, :]], axis=1
    )                                                      # [T, 4, PX]
    sigma_dot = jnp.sum(C_t * dL_dpix_t, axis=-1) + D_t * dL_dpixd_t
    bg_dot = (dL_dpix_t @ bg) + cfg.z_far * dL_dpixd_t
    bgdot_full = sigma_dot + final_T_t * bg_dot            # [T, PX]
    ntp = 2 * nbuf * W
    dl = jnp.pad(dl, ((0, ntp - nt), (0, 0), (0, 0)))
    bgdot_full = jnp.pad(bgdot_full, ((0, ntp - nt), (0, 0)))
    # [nblk, W, 4, PX] -> [nblk, 4W, PX] -> parity-strided buffers
    dl_blk = dl.reshape(2 * nbuf, W * 4, px_n)
    dl_e, dl_o = dl_blk[0::2], dl_blk[1::2]                # [nbuf, 4W, PX]
    bgd_blk = jnp.swapaxes(
        bgdot_full.reshape(2 * nbuf, W, px_n), 1, 2)       # [nblk, PX, W]
    bgd_e, bgd_o = bgd_blk[0::2], bgd_blk[1::2]

    max_pairs = prep.fields.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(_grid_size(prep),),
        in_specs=[
            pl.BlockSpec((NFIELD, _ck(cfg)),
                         lambda c, sm, st: (0, sm[_CHUNK_R, c]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * W, px_n),
                         lambda c, sm, st: (sm[_SE_R, c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * W, px_n),
                         lambda c, sm, st: (sm[_SO_R, c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, px_n, W),
                         lambda c, sm, st: (sm[_SE_R, c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, px_n, W),
                         lambda c, sm, st: (sm[_SO_R, c], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((NFIELD, _ck(cfg)),
                         lambda c, sm, st: (0, sm[_CHUNK_R, c]),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((px_n, 1), jnp.float32),
            pltpu.VMEM((px_n, 1), jnp.float32),
            pltpu.VMEM((px_n, 1), jnp.float32),
            pltpu.VMEM((px_n, 1), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    (pair_grads,) = pl.pallas_call(
        functools.partial(_backward_kernel, cfg),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((NFIELD, max_pairs), jnp.float32)],
        interpret=cfg.interpret,
    )(prep.smap, prep.start_pad, prep.fields, dl_e, dl_o, bgd_e, bgd_o)

    sums = base.reduce_pair_grads(prep, pair_grads, num_gaussians,
                             interpret=cfg.interpret)
    dm = sums[:, 0:2]
    dc = sums[:, 2:5]
    do = sums[:, 5]
    dcol = sums[:, 6:9]
    dd = sums[:, 9]
    dbg = jnp.einsum("tp,tpc->c", final_T_t, dL_dpix_t)
    return dm, dc, do, dcol, dd, dbg

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
product — computed on the **MXU** as ``exp(log(mult) @ utri)`` (``mult ≥
0.01`` thanks to the 0.99 alpha clamp, so the log is safe).

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
no ``n_contrib`` bookkeeping, no atomics: per-pair gradients are written to
the pair's own slot (double-buffered DMA) and segment-summed by Gaussian id
outside the kernel. The per-pair reductions over pixels are *moment
matmuls*: with ``N = G·dL_dalpha`` all six gradients (mean2d, conic,
opacity) are linear combinations of ``[1,p,q,p²,q²,pq]ᵀ @ N`` — one MXU
contraction instead of six elementwise reduction passes.

**Layout.** In-kernel arrays are [tile_px, CHUNK]: pixels ride the sublane
axis, pairs the lane axis. Pair fields live in HBM as [16, MPP] so every
DMA block [16, CHUNK] slices the (128-aligned) lane axis — Mosaic rejects
minor-dim slices narrower than the 128 tiling, so the natural [MPP, 16]
gather layout is transposed once at prepare time (bandwidth-bound, shared
by fwd+bwd via the VJP residuals). The pair→aligned-slot relayout is
gather-only (scatters with duplicate indices serialize on TPU).
"""

from __future__ import annotations

import functools
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
    re-runs the relayout/gather)."""

    fields: jax.Array     # [16, MPP] f32 pair field rows (padding cols = 0)
    pgp: jax.Array        # [MPP] int32 owning Gaussian id (-1 = padding)
    pad_start: jax.Array  # [num_tiles] int32 aligned segment starts
    count: jax.Array      # [num_tiles] int32 real pairs per tile


def _align_layout(cfg, pair_gauss, pair_tile, tile_start, tile_stop):
    """Re-lay sorted pairs so each tile's segment is CHUNK-aligned.

    ``pair_tile`` (the sorted tile id per pair, sentinel = num_tiles) gives
    each pair's owner directly — no per-pair search. One small row gather +
    one scatter of ids. Returns (pair_gauss_padded [MPP], pad_start [T],
    count [T], MPP).
    """
    num_tiles = cfg.num_tiles
    count = (tile_stop - tile_start).astype(jnp.int32)
    aligned = ((count + CHUNK - 1) // CHUNK) * CHUNK
    pad_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(aligned)[:-1].astype(jnp.int32)]
    ).astype(jnp.int32)
    max_pairs = pair_gauss.shape[0]
    mpp = max_pairs + num_tiles * (CHUNK - 1)
    mpp = ((mpp + CHUNK - 1) // CHUNK) * CHUNK

    pos = jnp.arange(max_pairs, dtype=jnp.int32)
    valid = pair_tile < num_tiles
    t_safe = jnp.clip(pair_tile, 0, num_tiles - 1)
    ttable = jnp.stack([pad_start, tile_start.astype(jnp.int32)], axis=-1)
    trows = ttable[t_safe]                               # [max_pairs, 2]
    new_pos = jnp.where(valid, trows[:, 0] + (pos - trows[:, 1]), mpp)
    pg_padded = jnp.full((mpp,), -1, jnp.int32).at[new_pos].set(
        pair_gauss, mode="drop"
    )
    return pg_padded, pad_start, count, mpp


def prepare(cfg, pair_gauss, pair_tile, tile_start, tile_stop,
            means2d, conic, opacity, color, depth) -> Prepared:
    """Relayout + field gather shared by forward and backward.

    One row gather from a packed [P, 16] table (the fast TPU gather path) —
    never per-field element gathers — then one bandwidth-bound transpose to
    the DMA-friendly [16, MPP] layout.
    """
    pgp, pad_start, count, _ = _align_layout(
        cfg, pair_gauss, pair_tile, tile_start, tile_stop)

    P = means2d.shape[0]
    pgp = jnp.where(pgp < P, pgp, -1)
    g = jnp.clip(pgp, 0, P - 1)
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
    fields = jnp.where((pgp >= 0)[:, None], table[g], 0.0)  # [MPP, 16]
    return Prepared(fields=fields.T, pgp=pgp, pad_start=pad_start,
                    count=count)


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


def _chunk_core(data, tx0, ty0, pf, utri, U, base, cnt):
    """Shared per-chunk math. ``data``: [16, CHUNK] VMEM block.

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
    within = (base + col) < cnt                   # [1, CHUNK]
    elig = within & (power <= 0.0) & (alpha >= _ALPHA_MIN)
    alpha_eff = jnp.where(elig, alpha, 0.0)
    mult = 1.0 - alpha_eff
    logm = jnp.log(mult)
    csum = jnp.dot(logm, utri, preferred_element_type=jnp.float32)
    P_run = U * jnp.exp(csum)                     # inclusive, [PX, CHUNK]
    P_prev = P_run / mult
    live = P_run >= _T_EPS
    w = jnp.where(live, alpha_eff * P_prev, 0.0)
    comp = live & elig
    return dict(G=G, mult=mult, P_run=P_run, P_prev=P_prev, w=w, comp=comp,
                xl=xl, yl=yl, ca=ca, cb=cb, cc=cc, opac=opac, col=col)


def _forward_kernel(cfg, pad_start_ref, count_ref, fields_hbm,
                    cd_out, t_out, ncon_out, buf, sems):
    t = pl.program_id(0)
    start = pad_start_ref[t]
    cnt = count_ref[t]
    nchunks = pl.cdiv(cnt, CHUNK)
    pf = _pixel_features(cfg)
    tx0, ty0 = _tile_origin(cfg, t)
    utri = _utri()
    px_n = cfg.tile_px

    def dma(slot, q):
        off = pl.multiple_of(start + q * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            fields_hbm.at[:, pl.ds(off, CHUNK)],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()

    def cond(state):
        q, U, T_out, CD, ncon = state
        # U is the *unfrozen* running product; once it crosses the
        # threshold nothing later can composite (P is non-increasing)
        return (q < nchunks) & (jnp.max(U) >= _T_EPS)

    def body(state):
        q, U, T_out, CD, ncon = state
        slot = jax.lax.rem(q, 2)

        @pl.when(q + 1 < nchunks)
        def _():
            dma(1 - slot, q + 1).start()

        dma(slot, q).wait()
        data = buf[slot]                                 # [16, CHUNK]
        c = _chunk_core(data, tx0, ty0, pf, utri, U, q * CHUNK, cnt)
        P_run, w, comp = c["P_run"], c["w"], c["comp"]

        # color+depth accumulation: [4, CHUNK] ⨯ [PX, CHUNK] → [4, PX] (MXU)
        CD = CD + jax.lax.dot_general(
            data[6:10, :], w, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        if cfg.need_n_contrib:
            idx1 = (q * CHUNK + c["col"] + 1).astype(jnp.float32)
            ncon = jnp.maximum(
                ncon,
                jnp.max(jnp.where(comp, idx1, 0.0), axis=1, keepdims=True),
            )
        # frozen output T = last composited P; unfrozen U keeps multiplying
        T_out = jnp.minimum(
            T_out, jnp.min(jnp.where(comp, P_run, 2.0), axis=1, keepdims=True)
        )
        U_next = P_run[:, CHUNK - 1:]
        return q + 1, U_next, T_out, CD, ncon

    init = (
        jnp.int32(0),
        jnp.ones((px_n, 1), jnp.float32),
        jnp.ones((px_n, 1), jnp.float32),
        jnp.zeros((4, px_n), jnp.float32),
        jnp.zeros((px_n, 1), jnp.float32),
    )
    _, _, T_fin, CD, ncon = jax.lax.while_loop(cond, body, init)
    cd_out[0] = CD
    t_out[0] = _col_to_row(T_fin)
    ncon_out[0] = _col_to_row(ncon).astype(jnp.int32)


def _backward_kernel(cfg, pad_start_ref, count_ref, fields_hbm, dl_in,
                     bgdot_in, grads_in_alias, grads_out,
                     buf, gbuf, sems, gsems):
    t = pl.program_id(0)
    start = pad_start_ref[t]
    cnt = count_ref[t]
    nchunks = pl.cdiv(cnt, CHUNK)
    pf = _pixel_features(cfg)
    tx0, ty0 = _tile_origin(cfg, t)
    utri = _utri()
    px_n = cfg.tile_px

    dl = dl_in[0]                         # [4, PX]: color rows 0-2, depth 3
    bgdot = _row_to_col(bgdot_in[0])      # [PX, 1]

    def dma_in(slot, q):
        off = pl.multiple_of(start + q * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            fields_hbm.at[:, pl.ds(off, CHUNK)],
            buf.at[slot],
            sems.at[slot],
        )

    def copy_out(slot, q):
        off = pl.multiple_of(start + q * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            gbuf.at[slot], grads_out.at[:, pl.ds(off, CHUNK)], gsems.at[slot]
        )

    @pl.when(nchunks > 0)
    def _():
        dma_in(0, 0).start()

    def cond(state):
        q, U, W_run = state
        return (q < nchunks) & (jnp.max(U) >= _T_EPS)

    def body(state):
        q, U, W_run = state
        slot = jax.lax.rem(q, 2)

        @pl.when(q + 1 < nchunks)
        def _():
            dma_in(1 - slot, q + 1).start()

        dma_in(slot, q).wait()
        data = buf[slot]
        c = _chunk_core(data, tx0, ty0, pf, utri, U, q * CHUNK, cnt)
        G, mult, P_prev, w, comp = (c["G"], c["mult"], c["P_prev"], c["w"],
                                    c["comp"])

        # per-pair dl·c: [4, PX] ⨯ [4, CHUNK] → [PX, CHUNK] (MXU)
        dl_dot_c = jax.lax.dot_general(
            dl, data[6:10, :], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # suffix via "total − prefix": host passes
        # bgdot_in = dl·Σtotal + T_fin·(bg·dL_color + zfar·dL_depth), so
        # S_j = Σ_{k>j} w_k (dl·c_k) + T_fin·bg_dot = bgdot_in − dlW_j
        wc = w * dl_dot_c                                  # [PX, CHUNK]
        prefix_wc = jnp.dot(wc, utri, preferred_element_type=jnp.float32)
        dlW = W_run + prefix_wc                            # inclusive
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
        xl, yl = c["xl"], c["yl"]
        ca, cb, cc, opac = c["ca"], c["cb"], c["cc"], c["opac"]
        M0 = opac * mom[0:1, :]
        M1 = opac * mom[1:2, :]
        M2 = opac * mom[2:3, :]
        M3 = opac * mom[3:4, :]
        M4 = opac * mom[4:5, :]
        M5 = opac * mom[5:6, :]
        Sx = xl * M0 - M1                # Σ M·dx   (dx = xl − p)
        Sy = yl * M0 - M2                # Σ M·dy
        dmx = -ca * Sx - cb * Sy
        dmy = -cc * Sy - cb * Sx
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

        # double-buffered write-back: wait only for the copy issued two
        # iterations ago before reusing its slot
        @pl.when(q >= 2)
        def _():
            copy_out(slot, q - 2).wait()

        gbuf[slot] = gout
        copy_out(slot, q).start()

        U_next = c["P_run"][:, CHUNK - 1:]
        W_next = dlW[:, CHUNK - 1:]
        return q + 1, U_next, W_next

    init = (
        jnp.int32(0),
        jnp.ones((px_n, 1), jnp.float32),
        jnp.zeros((px_n, 1), jnp.float32),
    )
    q_fin, _, _ = jax.lax.while_loop(cond, body, init)

    # drain the (up to two) outstanding write-backs
    @pl.when(q_fin >= 1)
    def _():
        copy_out(jax.lax.rem(q_fin - 1, 2), q_fin - 1).wait()

    @pl.when(q_fin >= 2)
    def _():
        copy_out(jax.lax.rem(q_fin, 2), q_fin - 2).wait()


def forward(cfg, prep: Prepared):
    """Pallas forward. Returns tiled (C [T,PX,3], D [T,PX], T, n_con)."""
    nt, px_n = cfg.num_tiles, cfg.tile_px
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec((1, 4, px_n), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, px_n), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, px_n), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NFIELD, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
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
    )(prep.pad_start, prep.count, prep.fields)
    C = jnp.moveaxis(cd[:, :3, :], 1, 2)        # [T, PX, 3]
    D = cd[:, 3, :]
    return C, D, t_fin[:, 0, :], ncon[:, 0, :]


def backward(cfg, prep: Prepared, num_gaussians, bg,
             final_T_t, dL_dpix_t, dL_dpixd_t, C_t, D_t):
    """Pallas backward from the shared ``Prepared`` residuals.

    ``C_t``/``D_t``: the forward's pre-background color/depth sums — used
    for the total−prefix suffix trick."""
    nt, px_n = cfg.num_tiles, cfg.tile_px
    dl = jnp.concatenate(
        [jnp.moveaxis(dL_dpix_t, 2, 1), dL_dpixd_t[:, None, :]], axis=1
    )                                                     # [T, 4, PX]
    sigma_dot = jnp.sum(C_t * dL_dpix_t, axis=-1) + D_t * dL_dpixd_t  # [T, PX]
    bg_dot = (dL_dpix_t @ bg) + cfg.z_far * dL_dpixd_t                # [T, PX]
    bgdot_full = sigma_dot + final_T_t * bg_dot                       # [T, PX]

    mpp = prep.fields.shape[1]
    grads_zero = jnp.zeros((NFIELD, mpp), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),                   # fields
            pl.BlockSpec((1, 4, px_n), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),                  # dl
            pl.BlockSpec((1, 1, px_n), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),                  # bgdot'
            pl.BlockSpec(memory_space=pltpu.HBM),                   # grads in
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        scratch_shapes=[
            pltpu.VMEM((2, NFIELD, CHUNK), jnp.float32),
            pltpu.VMEM((2, NFIELD, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    pair_grads = pl.pallas_call(
        functools.partial(_backward_kernel, cfg),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((NFIELD, mpp), jnp.float32)],
        input_output_aliases={5: 0},
        interpret=cfg.interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(prep.pad_start, prep.count, prep.fields, dl,
      bgdot_full[:, None, :], grads_zero)[0]

    # segment-sum pair grads by Gaussian id (deterministic, atomics-free)
    P = num_gaussians
    ok = prep.pgp >= 0
    seg = jnp.where(ok, prep.pgp, P)
    sums = jax.ops.segment_sum(pair_grads.T, seg, num_segments=P + 1)[:P]
    dm = sums[:, 0:2]
    dc = sums[:, 2:5]
    do = sums[:, 5]
    dcol = sums[:, 6:9]
    dd = sums[:, 9]
    dbg = jnp.einsum("tp,tpc->c", final_T_t, dL_dpix_t)
    return dm, dc, do, dcol, dd, dbg

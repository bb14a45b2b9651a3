"""Tile-binned alpha compositing with a hand-written VJP (the hot op).

TPU-native replacement for ``renderCUDA`` forward/backward (reference
``forward.cu:273-392``, ``backward.cu:463-640``):

- **Forward**: for every tile, walk its contiguous slice of the depth-sorted
  pair list front-to-back, compositing color/depth with transmittance ``T``
  and early termination at ``T < 1e-4``; emit per-pixel ``final_T`` and
  ``n_contrib`` as backward residuals (no per-step activations are stored —
  the memory behavior of the CUDA design is preserved).
- **Backward**: walk the same slice *back-to-front*, reconstructing suffix
  color/depth accumulators (``accum_rec``) and recovering ``T`` by dividing
  out ``(1 - alpha)`` — the suffix-reconstruction trick of ``backward.cu``.
  Per-Gaussian gradients reduce over pixels then scatter-add by Gaussian id
  (replacing CUDA ``atomicAdd`` with deterministic adds).

Two backends with identical semantics:
- ``xla``:    a ``lax.scan`` over pair slots, all tiles in lockstep
              ([num_tiles, tile_px] vector ops). Runs anywhere.
- ``pallas``: Mosaic TPU kernels (see ``pallas_blend.py``) with per-tile
              dynamic trip counts and VMEM-staged pair chunks.

Gradient conventions: cotangents are *true* gradients (pixel-space mean2d,
full conic) — the reference's half-b / ndc-scaled storage conventions cancel
against its preprocess backward, and here that chain is autodiff upstream.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from deblurgs_tpu.ops.binning import Binning

_ALPHA_MIN = 1.0 / 255.0
_T_EPS = 1e-4


@dataclasses.dataclass(frozen=True)
class BlendConfig:
    """Static blend parameters (hashable; nondiff custom_vjp argument)."""

    width: int
    height: int
    tile_w: int = 16
    tile_h: int = 16
    k_max: int = 1024          # max pairs composited per tile (cap)
    max_pairs: int = 1 << 18   # pair capacity (fused pallas path)
    z_far: float = 100.0
    backend: str = "xla"       # "xla" | "pallas"
    interpret: bool = False    # pallas interpret mode (CPU testing)
    need_n_contrib: bool = True  # n_contrib output (diagnostic only; the
                                 # pallas backward recomputes its gates)
    window: int = 1            # pallas: consecutive tiles sharing each grid
                               # step (fine tiles cut pair-pixel volume; the
                               # window amortizes the per-step overhead)
    layout: str = "lockstep"   # pallas grid layout: "lockstep" (tile ×
                               # chunk-overlap steps) | "mixed" (single-pass
                               # mixed-tile chunks, window = output-block
                               # tiles; see pallas_blend_mixed)
    tile_cull: bool = True     # pallas: retire rect pairs that can never
                               # pass the 1/255 alpha gate anywhere in
                               # their tile (exact; disabled automatically
                               # when need_n_contrib — the cull shifts the
                               # reference's within-rect-list diagnostic)
    fast: bool = False         # mixed layout only: drop the per-lane
                               # T<1e-4 freeze gates (live/last-live pass
                               # volume). Bounded error vs the exact path:
                               # the frozen T sits up to _T_EPS/(1-alpha)
                               # above the continued product (the CUDA
                               # freeze REJECTS the crossing update,
                               # forward.cu:339-341) — ~1e-3-order image/
                               # final_T worst case at alpha≈0.9, exact on
                               # unsaturated pixels up to sub-_T_EPS
                               # contributions. Incompatible with
                               # need_n_contrib (its freeze-gated count is
                               # the diagnostic fast mode drops).
    n_images: int = 1          # batched multi-view rendering (mixed layout
                               # only): image s occupies tiles
                               # [s·num_tiles, (s+1)·num_tiles) of one
                               # stacked tile axis — one sort + one kernel
                               # launch for all sub-frames
    chunk: int = 0             # mixed layout: pairs per grid step (0 =
                               # default 128). The kernel is per-STEP-
                               # overhead bound (r5 A/B: ~5.4 us/step fixed),
                               # so wider chunks amortize it; the segmented-
                               # prefix matmul grows O(chunk²) per step but
                               # its volume stays far from the MXU roof.
                               # Must be a multiple of 128 dividing max_pairs.

    def __post_init__(self):
        if self.fast and (self.layout != "mixed"
                          or self.backend != "pallas"
                          or self.need_n_contrib):
            raise ValueError(
                "fast blend requires backend='pallas', layout='mixed' and "
                "need_n_contrib=False (its T-freeze diagnostic is the one "
                "thing fast mode drops)")
        if self.chunk:
            if self.layout != "mixed":
                raise ValueError("chunk override requires layout='mixed'")
            if self.chunk % 128 or self.max_pairs % self.chunk:
                raise ValueError(
                    "chunk must be a multiple of 128 dividing max_pairs")

    @property
    def total_tiles(self) -> int:
        return self.num_tiles * self.n_images

    @property
    def tiles_x(self) -> int:
        return -(-self.width // self.tile_w)

    @property
    def tiles_y(self) -> int:
        return -(-self.height // self.tile_h)

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y

    @property
    def tile_px(self) -> int:
        return self.tile_w * self.tile_h


def _pixel_coords(cfg: BlendConfig):
    """Per-tile flattened pixel coordinates: two [num_tiles, tile_px] arrays."""
    t = np.arange(cfg.num_tiles)
    tx0 = (t % cfg.tiles_x) * cfg.tile_w
    ty0 = (t // cfg.tiles_x) * cfg.tile_h
    p = np.arange(cfg.tile_px)
    px = p % cfg.tile_w
    py = p // cfg.tile_w
    pix_x = tx0[:, None] + px[None, :]
    pix_y = ty0[:, None] + py[None, :]
    return (
        jnp.asarray(pix_x, jnp.float32),
        jnp.asarray(pix_y, jnp.float32),
    )


def tiles_to_image(cfg: BlendConfig, tiled: jax.Array) -> jax.Array:
    """[num_tiles, tile_px, ...] -> [H, W, ...] (crop padded borders)."""
    trailing = tiled.shape[2:]
    img = tiled.reshape(
        (cfg.tiles_y, cfg.tiles_x, cfg.tile_h, cfg.tile_w) + trailing
    )
    img = jnp.moveaxis(img, 2, 1).reshape(
        (cfg.tiles_y * cfg.tile_h, cfg.tiles_x * cfg.tile_w) + trailing
    )
    return img[: cfg.height, : cfg.width]


def image_to_tiles(cfg: BlendConfig, img: jax.Array) -> jax.Array:
    """[H, W, ...] -> [num_tiles, tile_px, ...] (zero-pad borders)."""
    trailing = img.shape[2:]
    pad_h = cfg.tiles_y * cfg.tile_h - cfg.height
    pad_w = cfg.tiles_x * cfg.tile_w - cfg.width
    img = jnp.pad(img, [(0, pad_h), (0, pad_w)] + [(0, 0)] * len(trailing))
    img = img.reshape(
        (cfg.tiles_y, cfg.tile_h, cfg.tiles_x, cfg.tile_w) + trailing
    )
    img = jnp.moveaxis(img, 1, 2)
    return img.reshape((cfg.num_tiles, cfg.tile_px) + trailing)


def _gather_pair(binning_arrays, g_safe):
    means2d, conic, opacity, color, depth = binning_arrays
    return (
        means2d[g_safe],
        conic[g_safe],
        opacity[g_safe],
        color[g_safe],
        depth[g_safe],
    )


# ---------------------------------------------------------------------------
# XLA backend: lockstep scan over pair slots
# ---------------------------------------------------------------------------


def _xla_forward(cfg, pair_gauss, tile_start, tile_stop,
                 means2d, conic, opacity, color, depth):
    P = means2d.shape[0]
    max_pairs = pair_gauss.shape[0]
    pix_x, pix_y = _pixel_coords(cfg)

    def body(carry, k):
        T, C, D, done, n_con = carry
        idx = tile_start + k
        pvalid = idx < tile_stop
        g = pair_gauss[jnp.clip(idx, 0, max_pairs - 1)]
        g_safe = jnp.clip(g, 0, P - 1)
        xy, con, opa, col, dep = _gather_pair(
            (means2d, conic, opacity, color, depth), g_safe
        )
        dx = xy[:, 0:1] - pix_x            # [T, px]
        dy = xy[:, 1:2] - pix_y
        power = (-0.5 * (con[:, 0:1] * dx * dx + con[:, 2:3] * dy * dy)
                 - con[:, 1:2] * dx * dy)
        alpha = jnp.minimum(0.99, opa[:, None] * jnp.exp(jnp.minimum(power, 0.0)))
        eligible = (pvalid[:, None] & ~done
                    & (power <= 0.0) & (alpha >= _ALPHA_MIN))
        test_T = T * (1.0 - alpha)
        stop = eligible & (test_T < _T_EPS)
        contribute = eligible & ~stop

        w = jnp.where(contribute, alpha * T, 0.0)
        C = C + w[..., None] * col[:, None, :]
        D = D + w * dep[:, None]
        T = jnp.where(contribute, test_T, T)
        done = done | stop
        n_con = jnp.where(contribute, k + 1, n_con)
        return (T, C, D, done, n_con), None

    nt, px = cfg.num_tiles, cfg.tile_px
    init = (
        jnp.ones((nt, px), jnp.float32),
        jnp.zeros((nt, px, 3), jnp.float32),
        jnp.zeros((nt, px), jnp.float32),
        jnp.zeros((nt, px), bool),
        jnp.zeros((nt, px), jnp.int32),
    )
    (T, C, D, _, n_con), _ = jax.lax.scan(
        body, init, jnp.arange(cfg.k_max, dtype=jnp.int32)
    )
    return C, D, T, n_con


def _xla_backward(cfg, pair_gauss, tile_start, tile_stop,
                  means2d, conic, opacity, color, depth, bg,
                  final_T_t, n_con_t, dL_dpix_t, dL_dpixd_t):
    """Back-to-front gradient pass (mirrors ``backward.cu:463-640``).

    All *_t arrays are tiled [num_tiles, tile_px(, c)] layouts.
    Returns per-Gaussian grads + dL/dbg.
    """
    P = means2d.shape[0]
    max_pairs = pair_gauss.shape[0]
    pix_x, pix_y = _pixel_coords(cfg)

    bg_dot = (dL_dpix_t @ bg) + cfg.z_far * dL_dpixd_t   # [T, px]

    d_means2d = jnp.zeros((P, 2), jnp.float32)
    d_conic = jnp.zeros((P, 3), jnp.float32)
    d_opacity = jnp.zeros((P,), jnp.float32)
    d_color = jnp.zeros((P, 3), jnp.float32)
    d_depth = jnp.zeros((P,), jnp.float32)

    def body(carry, k):
        (T, accum_rec, accum_d, last_alpha, last_color, last_depth,
         dm, dc, do, dcol, dd) = carry
        idx = tile_start + k
        pvalid = idx < tile_stop
        g = pair_gauss[jnp.clip(idx, 0, max_pairs - 1)]
        g_safe = jnp.clip(g, 0, P - 1)
        xy, con, opa, col, dep = _gather_pair(
            (means2d, conic, opacity, color, depth), g_safe
        )
        dx = xy[:, 0:1] - pix_x
        dy = xy[:, 1:2] - pix_y
        power = (-0.5 * (con[:, 0:1] * dx * dx + con[:, 2:3] * dy * dy)
                 - con[:, 1:2] * dx * dy)
        G = jnp.exp(jnp.minimum(power, 0.0))
        alpha = jnp.minimum(0.99, opa[:, None] * G)
        # contributed in forward: pair valid, before this pixel's stop point,
        # and passed the power/alpha gates
        process = (pvalid[:, None] & (k < n_con_t)
                   & (power <= 0.0) & (alpha >= _ALPHA_MIN))

        one_m_a = jnp.where(process, 1.0 - alpha, 1.0)
        T_new = T / one_m_a

        dcd = alpha * T_new                      # dchannel_dcolor [T, px]
        # suffix accumulators (updated with *previous* last_? values first)
        accum_rec_new = jnp.where(
            process[..., None],
            last_alpha[..., None] * last_color + (1 - last_alpha[..., None]) * accum_rec,
            accum_rec,
        )
        accum_d_new = jnp.where(
            process, last_alpha * last_depth + (1 - last_alpha) * accum_d, accum_d
        )
        dL_dalpha = jnp.sum((col[:, None, :] - accum_rec_new) * dL_dpix_t, -1)
        dL_dalpha = dL_dalpha + (dep[:, None] - accum_d_new) * dL_dpixd_t
        dL_dalpha = dL_dalpha * T_new
        dL_dalpha = dL_dalpha + (-final_T_t / one_m_a) * bg_dot
        dL_dalpha = jnp.where(process, dL_dalpha, 0.0)

        dL_dG = opa[:, None] * dL_dalpha
        gdx = G * dx
        gdy = G * dy
        # pixel-space mean2d grads (true gradient; ndc scaling is upstream)
        dG_ddelx = -gdx * con[:, 0:1] - gdy * con[:, 1:2]
        dG_ddely = -gdy * con[:, 2:3] - gdx * con[:, 1:2]

        pm = process
        dmean_x = jnp.sum(dL_dG * dG_ddelx, -1)
        dmean_y = jnp.sum(dL_dG * dG_ddely, -1)
        dcon_a = jnp.sum(-0.5 * gdx * dx * dL_dG, -1)
        dcon_b = jnp.sum(-(gdx * dy) * dL_dG, -1)      # true grad (CUDA stores half)
        dcon_c = jnp.sum(-0.5 * gdy * dy * dL_dG, -1)
        dopa = jnp.sum(G * dL_dalpha, -1)
        dcol_g = jnp.einsum("tp,tpc->tc", jnp.where(pm, dcd, 0.0), dL_dpix_t)
        ddep_g = jnp.sum(jnp.where(pm, dcd, 0.0) * dL_dpixd_t, -1)

        dm = dm.at[g_safe].add(jnp.stack([dmean_x, dmean_y], -1))
        dc = dc.at[g_safe].add(jnp.stack([dcon_a, dcon_b, dcon_c], -1))
        do = do.at[g_safe].add(dopa)
        dcol = dcol.at[g_safe].add(dcol_g)
        dd = dd.at[g_safe].add(ddep_g)

        T_out = jnp.where(process, T_new, T)
        last_alpha_out = jnp.where(process, alpha, last_alpha)
        last_color_out = jnp.where(process[..., None], col[:, None, :], last_color)
        last_depth_out = jnp.where(process, dep[:, None], last_depth)
        return (T_out, accum_rec_new, accum_d_new, last_alpha_out,
                last_color_out, last_depth_out, dm, dc, do, dcol, dd), None

    nt, px = cfg.num_tiles, cfg.tile_px
    init = (
        final_T_t,
        jnp.zeros((nt, px, 3), jnp.float32),
        jnp.zeros((nt, px), jnp.float32),
        jnp.zeros((nt, px), jnp.float32),
        jnp.zeros((nt, px, 3), jnp.float32),
        jnp.zeros((nt, px), jnp.float32),
        d_means2d, d_conic, d_opacity, d_color, d_depth,
    )
    ks = jnp.arange(cfg.k_max - 1, -1, -1, dtype=jnp.int32)
    carry, _ = jax.lax.scan(body, init, ks)
    (_, _, _, _, _, _, dm, dc, do, dcol, dd) = carry

    dL_dbg = jnp.einsum("tp,tpc->c", final_T_t, dL_dpix_t)
    return dm, dc, do, dcol, dd, dL_dbg


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def blend(cfg: BlendConfig, pair_gauss, pair_tile, tile_start, tile_stop,
          means2d, conic, opacity, color, depth, bg):
    """Composite sorted pairs into an image.

    Returns (image [H, W, 3], depth_img [H, W], final_T [H, W], n_contrib [H, W]).
    """
    out, _ = _blend_fwd(cfg, pair_gauss, pair_tile, tile_start, tile_stop,
                        means2d, conic, opacity, color, depth, bg)
    return out


def _blend_fwd(cfg, pair_gauss, pair_tile, tile_start, tile_stop,
               means2d, conic, opacity, color, depth, bg):
    prep = None
    if cfg.backend == "pallas":
        from deblurgs_tpu.ops import pallas_blend

        # the relayout + field gather is shared with the backward pass via
        # the VJP residuals (it is pure index plumbing — no gradients)
        prep = pallas_blend.prepare(
            cfg, pair_gauss, pair_tile, tile_start, tile_stop,
            means2d, conic, opacity, color, depth)
        C, D, T, n_con = pallas_blend.forward(cfg, prep)
    else:
        C, D, T, n_con = _xla_forward(
            cfg, pair_gauss, tile_start, tile_stop,
            means2d, conic, opacity, color, depth)
    image_t = C + T[..., None] * bg
    depth_t = D + T * cfg.z_far
    out = (
        tiles_to_image(cfg, image_t),
        tiles_to_image(cfg, depth_t),
        tiles_to_image(cfg, T),
        tiles_to_image(cfg, n_con),
    )
    res = (pair_gauss, pair_tile, tile_start, tile_stop,
           means2d, conic, opacity, color, depth, bg, T, n_con, C, D, prep)
    return out, res


def _blend_bwd(cfg, res, cot):
    (pair_gauss, pair_tile, tile_start, tile_stop,
     means2d, conic, opacity, color, depth, bg, final_T_t, n_con_t,
     C_t, D_t, prep) = res
    dL_dimage, dL_ddepth, _dT, _dn = cot
    dL_dpix_t = image_to_tiles(cfg, dL_dimage)
    dL_dpixd_t = image_to_tiles(cfg, dL_ddepth)

    if cfg.backend == "pallas":
        from deblurgs_tpu.ops import pallas_blend

        dm, dc, do, dcol, dd, dbg = pallas_blend.backward(
            cfg, prep, means2d.shape[0], bg,
            final_T_t, dL_dpix_t, dL_dpixd_t, C_t, D_t)
    else:
        dm, dc, do, dcol, dd, dbg = _xla_backward(
            cfg, pair_gauss, tile_start, tile_stop,
            means2d, conic, opacity, color, depth, bg,
            final_T_t, n_con_t, dL_dpix_t, dL_dpixd_t)

    int_zero = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return (int_zero(pair_gauss), int_zero(pair_tile),
            int_zero(tile_start), int_zero(tile_stop),
            dm, dc, do, dcol, dd, dbg)


blend.defvjp(_blend_fwd, _blend_bwd)


def blend_from_binning(cfg: BlendConfig, binning: Binning,
                       means2d, conic, opacity, color, depth, bg):
    """Convenience wrapper taking a :class:`Binning`."""
    return blend(cfg, binning.pair_gauss, binning.pair_tile,
                 binning.tile_start, binning.tile_stop,
                 means2d, conic, opacity, color, depth, bg)


# ---------------------------------------------------------------------------
# fused pallas path: binning + staging INSIDE the custom_vjp
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def blend_fused(cfg: BlendConfig, means2d, conic, opacity, color, depth,
                rect, area, bg):
    """Pallas-backend compositing with expansion/sort/staging fused into
    the VJP (``pallas_blend.prepare_fused``): ONE compact-table build, a
    segmented-broadcast kernel, and a field-carrying sort replace the
    per-row gathers of the :func:`blend` path. Returns
    (image, depth_img, final_T, n_contrib, num_pairs, max_per_tile).
    """
    out, _ = _blend_fused_fwd(cfg, means2d, conic, opacity, color, depth,
                              rect, area, bg)
    return out


def _tiles_to_images(cfg, tiled):
    """Per-image assembly of a stacked tile axis ([total_tiles, ...] ->
    [n_images, H, W, ...] or [H, W, ...] when unbatched)."""
    if cfg.n_images == 1:
        return tiles_to_image(cfg, tiled)
    per = tiled.reshape((cfg.n_images, cfg.num_tiles) + tiled.shape[1:])
    return jax.vmap(lambda t: tiles_to_image(cfg, t))(per)


def _images_to_tiles(cfg, img):
    if cfg.n_images == 1:
        return image_to_tiles(cfg, img)
    tiles = jax.vmap(lambda i: image_to_tiles(cfg, i))(img)
    return tiles.reshape((cfg.total_tiles,) + tiles.shape[2:])


def _blend_fused_fwd(cfg, means2d, conic, opacity, color, depth,
                     rect, area, bg):
    from deblurgs_tpu.ops import pallas_blend

    prep, num_pairs, max_per_tile = pallas_blend.prepare_fused(
        cfg, means2d, conic, opacity, color, depth, rect, area,
        cfg.max_pairs)
    C, D, T, n_con = pallas_blend.forward(cfg, prep)
    image_t = C + T[..., None] * bg
    depth_t = D + T * cfg.z_far
    out = (
        _tiles_to_images(cfg, image_t),
        _tiles_to_images(cfg, depth_t),
        _tiles_to_images(cfg, T),
        _tiles_to_images(cfg, n_con),
        num_pairs,
        max_per_tile,
    )
    res = (prep, bg, T, C, D, means2d.shape[0], rect, area)
    return out, res


def _blend_fused_bwd(cfg, res, cot):
    from deblurgs_tpu.ops import pallas_blend

    prep, bg, final_T_t, C_t, D_t, P, rect, area = res
    dL_dimage, dL_ddepth, _dT, _dn, _dnp, _dmpt = cot
    dL_dpix_t = _images_to_tiles(cfg, dL_dimage)
    dL_dpixd_t = _images_to_tiles(cfg, dL_ddepth)
    dm, dc, do, dcol, dd, dbg = pallas_blend.backward(
        cfg, prep, P, bg, final_T_t, dL_dpix_t, dL_dpixd_t, C_t, D_t)
    int_zero = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return dm, dc, do, dcol, dd, int_zero(rect), int_zero(area), dbg


blend_fused.defvjp(_blend_fused_fwd, _blend_fused_bwd)

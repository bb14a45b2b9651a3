"""Dense per-pixel oracle compositor — the correctness anchor (SURVEY.md §4.1).

An O(P · H · W) pure-jnp front-to-back compositor implementing *exactly* the
semantics of the CUDA blend kernel (reference ``forward.cu:273-392``):

- Gaussians composite in depth order, restricted per pixel to those whose
  tile-rect covers the pixel's tile (i.e. identical coverage to tile binning);
- ``alpha = min(0.99, opacity * exp(power))`` with a straight-through clamp
  (the CUDA backward does not gate on the 0.99 clamp, ``backward.cu:574-575,621``);
- skip if ``power > 0`` or ``alpha < 1/255``; terminate the pixel *before*
  compositing when ``T * (1 - alpha) < 1e-4``;
- ``out = C + T·bg``; ``out_depth = D + T·z_far`` (``forward.cu:389-390``).

Being ordinary JAX, ``jax.grad`` of this function is the ground-truth gradient
the hand-written ``tile_blend`` backward must reproduce.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deblurgs_tpu.ops.preprocess import PreprocessOut


def _straight_through_alpha(opacity, g):
    """min(0.99, o*g) forward, identity gradient through the clamp."""
    raw = opacity * g
    return raw + jax.lax.stop_gradient(jnp.minimum(raw, 0.99) - raw)


def oracle_render(
    pre: PreprocessOut,
    bg: jax.Array,
    *,
    width: int,
    height: int,
    tile_w: int = 16,
    tile_h: int = 16,
    z_far: float = 100.0,
):
    """Render [H, W, 3] image + [H, W] depth by dense per-pixel compositing.

    Returns (image, depth, final_T, n_contrib).
    """
    P = pre.means2d.shape[0]
    order = jnp.argsort(jnp.where(pre.visible, pre.depth, jnp.inf), stable=True)

    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    pix_y, pix_x = jnp.meshgrid(ys, xs, indexing="ij")      # [H, W]
    tile_ix = (pix_x / tile_w).astype(jnp.int32)
    tile_iy = (pix_y / tile_h).astype(jnp.int32)

    means2d = pre.means2d[order]
    conic = pre.conic[order]
    color = pre.color[order]
    depth = pre.depth[order]
    rect = pre.rect[order]
    visible = pre.visible[order]

    def body(carry, inp):
        T, C, D, done, n_contrib, contributor = carry
        xy, con, col, dep, rc, vis, opa = inp
        contributor = contributor + 1

        covered = (
            (tile_ix >= rc[0]) & (tile_ix < rc[2])
            & (tile_iy >= rc[1]) & (tile_iy < rc[3]) & vis
        )
        dx = xy[0] - pix_x
        dy = xy[1] - pix_y
        power = -0.5 * (con[0] * dx * dx + con[2] * dy * dy) - con[1] * dx * dy
        alpha = _straight_through_alpha(opa, jnp.exp(jnp.minimum(power, 0.0)))
        eligible = covered & ~done & (power <= 0.0) & (alpha >= 1.0 / 255.0)
        test_T = T * (1.0 - alpha)
        stop = eligible & (test_T < 1e-4)
        contribute = eligible & ~stop

        w = jnp.where(contribute, alpha * T, 0.0)
        C = C + w[..., None] * col
        D = D + w * dep
        T = jnp.where(contribute, test_T, T)
        done = done | stop
        n_contrib = jnp.where(contribute, contributor, n_contrib)
        return (T, C, D, done, n_contrib, contributor), None

    init = (
        jnp.ones((height, width), jnp.float32),
        jnp.zeros((height, width, 3), jnp.float32),
        jnp.zeros((height, width), jnp.float32),
        jnp.zeros((height, width), bool),
        jnp.zeros((height, width), jnp.int32),
        jnp.int32(0),
    )
    opac = pre.opacity[order]
    (T, C, D, _, n_contrib, _), _ = jax.lax.scan(
        body, init, (means2d, conic, color, depth, rect, visible, opac)
    )

    bg = jax.lax.stop_gradient(bg)
    image = C + T[..., None] * bg
    depth_img = D + T * z_far
    return image, depth_img, T, n_contrib

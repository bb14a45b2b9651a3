"""Per-Gaussian preprocessing: cull → project → 2D covariance → color → tiles.

Differentiable pure-jnp equivalent of ``preprocessCUDA`` (reference
``forward.cu:166-268``). Because everything here is ordinary traced JAX,
gradients w.r.t. Gaussian parameters *and* the camera view/full-projection
matrices come from autodiff — replacing the fork's hand-derived
``computeCov2DCUDA`` / ``preprocessCUDA`` backward kernels
(``backward.cu:145-460``) including their clamp gating (``x_grad_mul``):
the gating falls out of differentiating through ``jnp.clip``.

Static-capacity design: nothing here drops Gaussians; invisible ones get
``radius == 0`` / ``tiles_touched == 0`` masks exactly like the CUDA kernel.
Denominators for culled Gaussians are replaced by 1.0 under the mask so no
inf/NaN can leak into reverse-mode AD via 0×inf.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from deblurgs_tpu.core import sh as sh_lib
from deblurgs_tpu.core.camera import CameraArrays, CameraStatic


class PreprocessOut(NamedTuple):
    means2d: jax.Array        # [P, 2] pixel-space centers (differentiable)
    opacity: jax.Array        # [P] activated opacity (pass-through)
    conic: jax.Array          # [P, 3] inverse 2D covariance (a, b, c)
    depth: jax.Array          # [P] view-space z (differentiable)
    color: jax.Array          # [P, 3] per-Gaussian RGB
    radius: jax.Array         # [P] int32 screen radius (0 = culled)
    rect: jax.Array           # [P, 4] int32 tile rect (x0, y0, x1, y1)
    tiles_touched: jax.Array  # [P] int32 rect area
    visible: jax.Array        # [P] bool


def ndc2pix(v: jax.Array, size: int) -> jax.Array:
    """((v + 1) * S - 1) / 2 — reference ``auxiliary.h:41-44``."""
    return ((v + 1.0) * size - 1.0) * 0.5


def project_points(means3d: jax.Array, cam: CameraArrays, safe: jax.Array | None = None):
    """World → (view xyz, ndc xyz) with the reference's +1e-7 w guard.

    ``p_view = p @ view[:, :3]``; ``p_hom = p @ full_proj``;
    ``p_ndc = p_hom.xyz / (p_hom.w + 1e-7)`` (``forward.cu:209-212``,
    ``auxiliary.h:58-77``). ``safe`` masks rows whose denominator is
    replaced by 1 (culled Gaussians) to keep AD finite.
    """
    ones = jnp.ones_like(means3d[..., :1])
    p_hom4 = jnp.concatenate([means3d, ones], axis=-1)
    p_view = p_hom4 @ cam.view[..., :3]
    p_clip = p_hom4 @ cam.full_proj
    w = p_clip[..., 3] + 1e-7
    if safe is not None:
        w = jnp.where(safe, w, 1.0)
    p_ndc = p_clip[..., :3] / w[..., None]
    return p_view, p_ndc


def compute_cov2d(
    p_view: jax.Array,
    cov6: jax.Array,
    cam: CameraArrays,
    cs: CameraStatic,
    safe: jax.Array | None = None,
) -> jax.Array:
    """EWA splatting 2D covariance with the +0.3 px low-pass.

    Mirrors ``computeCov2D`` (``forward.cu:85-124``): view-space point is
    clamped to 1.3×tan(fov) before building the projective Jacobian (the
    clamp's autodiff gradient reproduces ``x_grad_mul/y_grad_mul`` gating of
    ``backward.cu:177-178``). Returns [..., P, 3] = (cov_xx, cov_xy, cov_yy).
    """
    tz = p_view[..., 2]
    if safe is not None:
        tz = jnp.where(safe, tz, 1.0)
    limx = 1.3 * cs.lim_tanfovx
    limy = 1.3 * cs.lim_tanfovy
    tx = jnp.clip(p_view[..., 0] / tz, -limx, limx) * tz
    ty = jnp.clip(p_view[..., 1] / tz, -limy, limy) * tz

    # view-space covariance M = R Σ R^T as a per-camera linear map on the
    # 6 packed entries: M6 = Σ6 @ K with K [6, 6] built from six tiny 3×3
    # products (once per camera) — the per-Gaussian work is one [P, 6] @
    # [6, 6] MXU matmul instead of batched 3×3 matmuls.
    R = jnp.swapaxes(cam.view[..., :3, :3], -1, -2)  # world→view rotation

    def pack6(m):
        return jnp.stack([m[..., 0, 0], m[..., 0, 1], m[..., 0, 2],
                          m[..., 1, 1], m[..., 1, 2], m[..., 2, 2]], -1)

    basis = jnp.zeros((6, 3, 3), cov6.dtype)
    for k, (i, j) in enumerate([(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]):
        basis = basis.at[k, i, j].set(1.0)
        if i != j:
            basis = basis.at[k, j, i].set(1.0)
    K = pack6(jnp.einsum("ij,kjl,ml->kim", R, basis, R))   # [6(in), 6(out)]
    M6 = cov6 @ K                                           # [P, 6]
    M00, M01, M02, M11, M12, M22 = (M6[..., i] for i in range(6))

    # projective part elementwise: J2 = (fx/tz)·(1,0,-u) ; (fy/tz)·(0,1,-v)
    fx, fy = cs.focal_x, cs.focal_y
    u = tx / tz
    v = ty / tz
    a0 = fx / tz
    b0 = fy / tz
    cov_xx = a0 * a0 * (M00 - 2 * u * M02 + u * u * M22) + 0.3
    cov_xy = a0 * b0 * (M01 - v * M02 - u * M12 + u * v * M22)
    cov_yy = b0 * b0 * (M11 - 2 * v * M12 + v * v * M22) + 0.3
    return jnp.stack([cov_xx, cov_xy, cov_yy], axis=-1)


def compute_rect(
    px: jax.Array, py: jax.Array, radius: jax.Array,
    tiles_x: int, tiles_y: int, tile_w: int, tile_h: int,
    radius_y: jax.Array | None = None,
):
    """Tile bounding rect of a splat — ``getRect`` (``auxiliary.h:46-56``).

    The CUDA truncating int casts on possibly-negative quotients agree with
    floor after the 0-clamp, so floor is used. ``radius_y`` allows the
    tight per-axis emission rect (see ``preprocess(tight_rect=True)``).
    """
    r = radius.astype(px.dtype)
    ry = r if radius_y is None else radius_y.astype(py.dtype)
    x0 = jnp.clip(jnp.floor((px - r) / tile_w), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((py - ry) / tile_h), 0, tiles_y).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((px + r + tile_w - 1) / tile_w), 0, tiles_x).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((py + ry + tile_h - 1) / tile_h), 0, tiles_y).astype(jnp.int32)
    return x0, y0, x1, y1


def preprocess(
    means3d: jax.Array,
    cov6: jax.Array,
    shs: Optional[jax.Array],
    colors_precomp: Optional[jax.Array],
    opacities: jax.Array,
    cam: CameraArrays,
    cs: CameraStatic,
    *,
    sh_degree: int = 0,
    use_sigmoid: bool = False,
    tile_w: int = 16,
    tile_h: int = 16,
    active: jax.Array | None = None,
    vsp: jax.Array | None = None,
    cull_z: float = 0.2,
    tight_rect: bool = False,
) -> PreprocessOut:
    """Vectorized per-Gaussian preprocess (``forward.cu:166-268``).

    Args:
      means3d: [P, 3]; cov6: [P, 6] packed world covariance.
      shs: [P, K, 3] SH coefficients, or None when ``colors_precomp`` given.
      opacities: [P] (already activated).
      vsp: optional [P, 2] zeros tensor added to the *NDC* mean so its
        cotangent is the reference's "viewspace_points" gradient used by
        densification (reference ``gaussian_renderer/__init__.py:26-30``;
        NDC-space scaling per ``backward.cu:535-536``).
      cull_z: near-cull threshold (``auxiliary.h:159`` hardcodes 0.2).
    Returns: :class:`PreprocessOut`; ``visible`` mirrors ``radius > 0``.
    """
    ones = jnp.ones_like(means3d[..., :1])
    p_hom4 = jnp.concatenate([means3d, ones], axis=-1)
    p_view = p_hom4 @ cam.view[..., :3]
    depth = p_view[..., 2]
    in_front = depth > cull_z

    _, p_ndc = project_points(means3d, cam, safe=in_front)

    cov2d = compute_cov2d(p_view, cov6, cam, cs, safe=in_front)
    a, b, c = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = a * c - b * b
    det_ok = det != 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    det_inv = jnp.where(det_ok, 1.0 / det_safe, 0.0)
    conic = jnp.stack([c * det_inv, -b * det_inv, a * det_inv], axis=-1)

    mid = 0.5 * (a + c)
    lam_max = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam_max, 0.0)))

    ndc_xy = p_ndc[..., :2]
    if vsp is not None:
        ndc_xy = ndc_xy + vsp
    px = ndc2pix(ndc_xy[..., 0], cs.width)
    py = ndc2pix(ndc_xy[..., 1], cs.height)

    tiles_x = -(-cs.width // tile_w)
    tiles_y = -(-cs.height // tile_h)
    radius_i = jnp.where(in_front & det_ok, radius_f, 0.0).astype(jnp.int32)
    x0, y0, x1, y1 = compute_rect(px, py, radius_i, tiles_x, tiles_y, tile_w, tile_h)
    area = (x1 - x0) * (y1 - y0)

    # visibility / radius keep the REFERENCE 3σ semantics (radii feeds the
    # densification stats; `visible` mirrors radii > 0) even when the
    # emission rect below is tightened
    visible = in_front & det_ok & (area > 0)
    if active is not None:
        visible = visible & active

    if tight_rect:
        # emission-only rect shrink: the axis-aligned bounding box of the
        # alpha ≥ 1/255 ellipse has half-widths sqrt(2·ln(255·o)·cov_kk)
        # (box extents of {0.5 pᵀ conic p ≤ L} are sqrt(2L·(conic⁻¹)_kk) and
        # conic⁻¹ = cov2d). Pairs outside can never pass the kernel's
        # eligibility gate (forward.cu:337), so images and gradients are
        # unchanged; the reference emits the full 3σ square (which TRUNCATES
        # visible tails at high opacity — the AABB is clamped to it so the
        # truncation semantics are preserved exactly). +0.1 in L absorbs
        # in-kernel power rounding at the gate; +1 px is box-vs-pixel-grid
        # slack.
        L = jnp.log(jnp.maximum(255.0 * opacities, 1e-12)) + 0.1
        rf = radius_i.astype(px.dtype)
        rx = jnp.minimum(jnp.sqrt(jnp.maximum(2.0 * L * a, 0.0)) + 1.0, rf)
        ry = jnp.minimum(jnp.sqrt(jnp.maximum(2.0 * L * c, 0.0)) + 1.0, rf)
        x0, y0, x1, y1 = compute_rect(px, py, rx, tiles_x, tiles_y,
                                      tile_w, tile_h, radius_y=ry)
        area = (x1 - x0) * (y1 - y0)

    if colors_precomp is not None:
        color = colors_precomp
    else:
        color = sh_lib.sh_to_color(shs, means3d, cam.campos, sh_degree, use_sigmoid)

    zero_i = jnp.zeros_like(radius_i)
    radius_i = jnp.where(visible, radius_i, zero_i)
    area = jnp.where(visible, area, zero_i)

    return PreprocessOut(
        means2d=jnp.stack([px, py], axis=-1),
        opacity=opacities,
        conic=conic,
        depth=depth,
        color=color,
        radius=radius_i,
        rect=jnp.stack([x0, y0, x1, y1], axis=-1),
        tiles_touched=area,
        visible=visible,
    )


def mark_visible(means3d: jax.Array, cam: CameraArrays, cull_z: float = 0.2) -> jax.Array:
    """Frustum-visibility mask — ``markVisible`` (``rasterize_points.cu:220-239``)."""
    ones = jnp.ones_like(means3d[..., :1])
    p_view = jnp.concatenate([means3d, ones], axis=-1) @ cam.view[..., :3]
    return p_view[..., 2] > cull_z

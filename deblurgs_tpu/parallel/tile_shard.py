"""Pixel/tile-axis sharded rendering: row slabs over a device mesh.

Design (SURVEY.md §5 long-axis plan — the third shardable axis next to
sub-frames ``parallel/shard.py`` and Gaussians ``parallel/gauss_shard.py``):
at large frames (1080p ⇒ ~2k 32px tiles, 4K ⇒ ~8k) the blend dominates and
its tile axis is embarrassingly parallel. Each device renders a horizontal
**row slab** of the image through the standard single-device pipeline —
cull → bin → sort → blend all run slab-local, so per-device ``max_pairs``
and sort length shrink by ~1/D — and the full frame is the concatenation
of the slabs (out_specs re-assemble it; no collective in the forward).
Backward: parameter/camera cotangents of the replicated inputs are psum'd
across the slab axis by shard_map's transpose, which is exactly the
tile-space gradient reduction.

The slab render is exact, not approximate, via a **crop camera**:

- NDC→pixel mapping: a slab starting at row ``y0`` with height ``h`` needs
  ``py_local = py_full - y0``. With ``py = ((ndc+1)·S - 1)/2`` this is the
  affine change ``ndc' = (H/h)·ndc + (H - 2·y0)/h - 1``, which folds into
  the (transposed, row-vector) projection matrix as
  ``P'[:,1] = a·P[:,1] + b·P[:,3]`` (clip_y' = a·clip_y + b·w).
- The EWA focal is preserved by construction: ``tanfovy' = tanfovy·h/H``
  gives ``focal_y' = h/(2·tanfovy') = H/(2·tanfovy)``.
- The 1.3×tan(fov) view-space clamp of the EWA Jacobian keeps the FULL
  camera's limits (``CameraStatic.clamp_tanfovy``), so splats centered
  outside the slab but reaching into it get bit-identical covariances.
- Culling is z-only (reference ``auxiliary.h:159`` semantics), so off-slab
  splats are never wrongly dropped; their clipped tile rects simply have
  zero area outside their slabs.

Reference counterpart: none — the CUDA implementation binds one GPU to the
whole frame (SURVEY.md §2.3); this is the large-frame scale-out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from deblurgs_tpu.core.camera import (CameraStatic, make_camera_arrays)
from deblurgs_tpu.ops import rasterize as ras

PIXEL_AXIS = "px"


def make_pixel_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the pixel/tile (row-slab) axis."""
    from deblurgs_tpu.parallel.shard import make_mesh

    return make_mesh(n_devices, axis=PIXEL_AXIS)


def slab_layout(cs: CameraStatic, n: int, tile_h: int) -> tuple[int, int]:
    """(slab_h, padded_h): slab height is tile-aligned; the bottom slab may
    render pad rows that the assembled image crops off."""
    slab_h = -(-(-(-cs.height // n)) // tile_h) * tile_h
    return slab_h, slab_h * n


def crop_cameras(cs: CameraStatic, proj: jax.Array, n: int, tile_h: int
                 ) -> tuple[CameraStatic, jax.Array]:
    """Slab CameraStatic + per-slab projection matrices [n, 4, 4].

    ``proj`` is the full-image (transposed) projection matrix; slab d covers
    rows [d·slab_h, (d+1)·slab_h).
    """
    slab_h, _ = slab_layout(cs, n, tile_h)
    H = float(cs.height)
    a = H / slab_h
    projs = []
    for d in range(n):
        y0 = d * slab_h
        b = (H - 2.0 * y0) / slab_h - 1.0
        p = proj.at[:, 1].set(a * proj[:, 1] + b * proj[:, 3])
        projs.append(p)
    cs_slab = CameraStatic(
        width=cs.width, height=slab_h, tanfovx=cs.tanfovx,
        tanfovy=cs.tanfovy * slab_h / H, znear=cs.znear, zfar=cs.zfar,
        clamp_tanfovx=cs.lim_tanfovx, clamp_tanfovy=cs.lim_tanfovy)
    return cs_slab, jnp.stack(projs)


def row_sharded_render(mesh: Mesh, cs: CameraStatic, proj: jax.Array,
                       cfg: ras.RasterizeConfig, sh_degree: int = 0):
    """Build a row-slab-sharded render closure over ``mesh``.

    Returns ``fn(means3d, scales, rotations, opacities, shs, view, bg,
    active=None, vsp=None) -> RenderOutput`` with full-frame images.
    Scene inputs and the view matrix replicate; only the per-slab crop
    projection is sharded. Per-device pair capacity is ``cfg.max_pairs``
    (the slab budget — ~1/D of the full-frame need), and the returned
    ``num_pairs`` is the MAX over slabs so the standard overflow check
    (``num_pairs > cfg.max_pairs``) keeps its meaning.
    """
    n = mesh.size
    cs_slab, projs = crop_cameras(cs, proj, n, cfg.tile_h)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(PIXEL_AXIS), P(), P(), P()),
        out_specs=P(PIXEL_AXIS),
        check_vma=False,
    )
    def go(means3d, scales, rotations, opacities, shs, view, projs_local,
           bg, active, vsp):
        cam = make_camera_arrays(view, projs_local[0])
        out = ras.render(means3d, scales, rotations, opacities, shs, cam,
                         cs_slab, bg, cfg=cfg, sh_degree=sh_degree,
                         active=active, vsp=vsp)
        return jax.tree.map(lambda x: x[None], tuple(out))

    def fn(means3d, scales, rotations, opacities, shs, view, bg,
           active=None, vsp=None):
        if active is None:
            active = jnp.ones(means3d.shape[0], bool)
        if vsp is None:
            vsp = jnp.zeros((means3d.shape[0], 2), means3d.dtype)
        (image, depth, final_T, n_contrib, radii, visible,
         num_pairs, max_per_tile) = go(
            means3d, scales, rotations, opacities, shs, view, projs,
            bg, active, vsp)
        H, W = cs.height, cs.width

        def rows(x, fill_shape):
            return x.reshape((n * cs_slab.height,) + fill_shape)[:H]

        # slab-union visibility over-counts in the bottom slab's tile-pad
        # rows (n·slab_h > H): drop splats whose 3σ rect starts below the
        # REAL tile grid, restoring full-frame `area > 0` semantics. The
        # diagnostics are non-differentiable, so this stays out of AD.
        radii_u = jnp.max(radii, axis=0)
        visible_u = jnp.any(visible, axis=0)
        from deblurgs_tpu.ops.preprocess import ndc2pix, project_points

        cam_full = make_camera_arrays(view, proj)
        _, p_ndc = jax.lax.stop_gradient(
            project_points(means3d, cam_full))
        py = ndc2pix(p_ndc[..., 1], H)
        tiles_y = -(-H // cfg.tile_h)
        in_grid = jnp.floor(
            (py - radii_u.astype(py.dtype)) / cfg.tile_h) < tiles_y
        visible_u = visible_u & in_grid
        radii_u = jnp.where(visible_u, radii_u, 0)

        return ras.RenderOutput(
            image=rows(image, (W, 3)),
            depth=rows(depth, (W,)),
            final_T=rows(final_T, (W,)),
            n_contrib=rows(n_contrib, (W,)),
            radii=radii_u,
            visible=visible_u,
            num_pairs=jnp.max(num_pairs),
            max_per_tile=jnp.max(max_per_tile),
        )

    return fn

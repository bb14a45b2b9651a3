"""Public differentiable renderer — the ``render()`` of this framework.

Equivalent of reference ``gaussian_renderer/__init__.py:18-90`` +
``GaussianRasterizer`` (``diff_gaussian_rasterization/__init__.py:189-241``),
re-composed TPU-first:

  preprocess (pure jnp, autodiff)  →  binning (sort, int-only)  →
  tile blend (custom_vjp; XLA or Pallas)  →  image/depth/aux

Camera matrices are ordinary traced inputs, so pose gradients (the fork's
``dL_dviewmatrix`` / ``dL_dprojmatrix``) arrive by autodiff through
``preprocess``. The ``vsp`` zeros input reproduces the reference's
``screenspace_points`` gradient channel used for densification stats.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from deblurgs_tpu.core.camera import CameraArrays, CameraStatic
from deblurgs_tpu.core.transforms import build_covariance
from deblurgs_tpu.ops import binning as binning_lib
from deblurgs_tpu.ops import oracle as oracle_lib
from deblurgs_tpu.ops import preprocess as pre_lib
from deblurgs_tpu.ops import tile_blend


def default_interpret() -> bool:
    """Whether the Pallas backend must run in interpret mode on this host.

    Mosaic kernels compile only on TPU; every other JAX backend (CPU *and*
    GPU) gets the slow, test-grade Pallas interpreter instead of a Mosaic
    lowering error. Logs once when the interpreter is selected so a silent
    100x slowdown is visible in the run output.
    """
    interpret = jax.default_backend() != "tpu"
    if interpret and not getattr(default_interpret, "_warned", False):
        default_interpret._warned = True
        print(f"[rasterize] backend {jax.default_backend()!r} is not TPU: "
              "pallas kernels will run in the (slow) interpreter")
    return interpret


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    """Static rasterizer settings (analog of GaussianRasterizationSettings)."""

    tile_w: int = 16
    tile_h: int = 16
    max_pairs: int = 1 << 18
    k_max: int = 1024
    backend: str = "xla"        # "xla" | "pallas" | "oracle"
    interpret: bool = False     # pallas interpret mode
    cull_z: float = 0.2         # near-cull (auxiliary.h:159)
    z_far: float = 100.0        # depth background (forward.cu:390)
    use_sigmoid: bool = False
    scale_modifier: float = 1.0
    need_n_contrib: bool = True  # n_contrib image is diagnostic-only
    window: int = 1             # pallas: tiles per grid step (see
                                # pallas_blend — e.g. 16×16 tiles with
                                # window=4 halve the pair-pixel volume of
                                # 32×32 tiles at the same per-step shape)
    layout: str = "lockstep"    # pallas grid layout: "lockstep" | "mixed"
                                # (single-pass mixed-tile chunks; window =
                                # tiles per output block — pallas_blend_mixed)
    tile_cull: bool = True      # pallas: exact per-pair tile cull (only
                                # active when need_n_contrib=False)
    tight_rect: bool = True     # per-axis 1/255-ellipse AABB emission rect
                                # (clamped to the reference 3σ square; image
                                # and gradient exact — shrinks the sort).
                                # radii/visible keep reference semantics.
    fast: bool = False          # pallas mixed only: drop the per-lane
                                # T<1e-4 freeze gates. Bounded error vs
                                # exact (~_T_EPS/(1-alpha)-order, see
                                # tile_blend.BlendConfig.fast); needs
                                # need_n_contrib=False
    chunk: int = 0              # pallas mixed only: pairs per grid step
                                # (0 = default 128). Wider chunks amortize
                                # the per-step fixed overhead the kernel is
                                # bound by (see tile_blend.BlendConfig.chunk)

    def __post_init__(self):
        if self.backend not in ("xla", "pallas", "oracle"):
            raise ValueError(
                f"unknown rasterizer backend {self.backend!r} "
                "(expected 'pallas', 'xla' or 'oracle')")
        if self.layout not in ("lockstep", "mixed"):
            raise ValueError(
                f"unknown pallas layout {self.layout!r} "
                "(expected 'lockstep' or 'mixed')")

    def blend_config(self, cs: CameraStatic) -> tile_blend.BlendConfig:
        return tile_blend.BlendConfig(
            width=cs.width, height=cs.height,
            tile_w=self.tile_w, tile_h=self.tile_h,
            k_max=self.k_max, max_pairs=self.max_pairs, z_far=self.z_far,
            backend=self.backend, interpret=self.interpret,
            need_n_contrib=self.need_n_contrib, window=self.window,
            layout=self.layout, tile_cull=self.tile_cull, fast=self.fast,
            chunk=self.chunk,
        )


class RenderOutput(NamedTuple):
    image: jax.Array       # [H, W, 3]
    depth: jax.Array       # [H, W]
    final_T: jax.Array     # [H, W] residual transmittance
    n_contrib: jax.Array   # [H, W]
    radii: jax.Array       # [P] int32 (0 = culled) — densification signal
    visible: jax.Array     # [P] bool (radii > 0)
    num_pairs: jax.Array   # [] emitted pair count (overflow if > max_pairs)
    max_per_tile: jax.Array  # [] max pairs in any tile (k_max adequacy)


def render(
    means3d: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    opacities: jax.Array,
    shs: Optional[jax.Array],
    cam: CameraArrays,
    cs: CameraStatic,
    bg: jax.Array,
    *,
    cfg: RasterizeConfig = RasterizeConfig(),
    sh_degree: int = 0,
    colors_precomp: Optional[jax.Array] = None,
    active: Optional[jax.Array] = None,
    vsp: Optional[jax.Array] = None,
) -> RenderOutput:
    """Render one view. All Gaussian inputs are post-activation values
    (matching what reference ``render`` passes to the rasterizer).

    Args:
      means3d: [P, 3]; scales: [P, 3]; rotations: [P, 4] (w,x,y,z; will be
        used unnormalized like the CUDA kernel — normalize at the model layer);
      opacities: [P]; shs: [P, K, 3] or None with ``colors_precomp`` [P, 3].
      active: [P] bool mask for static-capacity slots.
      vsp: optional [P, 2] zeros; its gradient = NDC viewspace grads.
    """
    cov6 = build_covariance(scales, rotations, cfg.scale_modifier)
    pre = pre_lib.preprocess(
        means3d, cov6, shs, colors_precomp, opacities, cam, cs,
        sh_degree=sh_degree, use_sigmoid=cfg.use_sigmoid,
        tile_w=cfg.tile_w, tile_h=cfg.tile_h,
        active=active, vsp=vsp, cull_z=cfg.cull_z,
        tight_rect=cfg.tight_rect,
    )

    if cfg.backend == "oracle":
        image, depth_img, final_T, n_contrib = oracle_lib.oracle_render(
            pre, bg, width=cs.width, height=cs.height,
            tile_w=cfg.tile_w, tile_h=cfg.tile_h, z_far=cfg.z_far,
        )
        num_pairs = jnp.sum(pre.tiles_touched)
        max_per_tile = jnp.int32(0)
    elif cfg.backend == "pallas":
        # expansion/sort/field staging fused into the blend VJP (no
        # per-row HBM gathers — see pallas_blend.prepare_fused)
        bcfg = cfg.blend_config(cs)
        (image, depth_img, final_T, n_contrib,
         num_pairs, max_per_tile) = tile_blend.blend_fused(
            bcfg, pre.means2d, pre.conic, pre.opacity, pre.color,
            pre.depth, pre.rect, pre.tiles_touched.astype(jnp.int32), bg,
        )
    else:
        bcfg = cfg.blend_config(cs)
        bins = binning_lib.bin_gaussians(
            pre, tiles_x=bcfg.tiles_x, tiles_y=bcfg.tiles_y,
            max_pairs=cfg.max_pairs,
        )
        image, depth_img, final_T, n_contrib = tile_blend.blend_from_binning(
            bcfg, bins, pre.means2d, pre.conic, pre.opacity,
            pre.color, pre.depth, bg,
        )
        num_pairs = bins.num_pairs
        max_per_tile = bins.max_per_tile

    return RenderOutput(
        image=image, depth=depth_img, final_T=final_T, n_contrib=n_contrib,
        radii=pre.radius, visible=pre.visible,
        num_pairs=num_pairs, max_per_tile=max_per_tile,
    )


def render_batch(
    means3d: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    opacities: jax.Array,
    shs: Optional[jax.Array],
    cams: CameraArrays,
    cs: CameraStatic,
    bg: jax.Array,
    *,
    cfg: RasterizeConfig = RasterizeConfig(
        backend="pallas", layout="mixed"),
    sh_degree: int = 0,
    colors_precomp: Optional[jax.Array] = None,
    active: Optional[jax.Array] = None,
    vsp: Optional[jax.Array] = None,
) -> RenderOutput:
    """Render F views of one scene in a SINGLE rasterizer launch.

    The reference loops f=21 serial CUDA launches per training step
    (``motion.py:141-150``); here the views stack on the tile axis — view s
    owns tiles [s·nt, (s+1)·nt) — so one preprocess (vmapped), ONE sort and
    ONE mixed-layout blend kernel cover the whole sub-frame batch. Requires
    ``cfg.layout == "mixed"`` and the pallas backend.

    Args:
      cams: CameraArrays batched [F, ...]; vsp: optional [F, P, 2] zeros
        (its cotangent = per-view NDC viewspace grads for densification).
      ``cfg.max_pairs`` must budget ALL F views' pairs.
    Returns: RenderOutput with image [F, H, W, 3], depth/final_T/n_contrib
      [F, H, W], radii/visible [F, P].
    """
    if cfg.backend != "pallas" or cfg.layout != "mixed":
        raise NotImplementedError(
            "render_batch requires backend='pallas', layout='mixed'")
    F = cams.view.shape[0]
    P = means3d.shape[0]
    cov6 = build_covariance(scales, rotations, cfg.scale_modifier)

    def pre_one(cam, v):
        return pre_lib.preprocess(
            means3d, cov6, shs, colors_precomp, opacities, cam, cs,
            sh_degree=sh_degree, use_sigmoid=cfg.use_sigmoid,
            tile_w=cfg.tile_w, tile_h=cfg.tile_h,
            active=active, vsp=v, cull_z=cfg.cull_z,
            tight_rect=cfg.tight_rect,
        )

    in_axes = (0, 0 if vsp is not None else None)
    pre = jax.vmap(pre_one, in_axes=in_axes)(cams, vsp)

    bcfg = dataclasses.replace(cfg.blend_config(cs), n_images=F)
    flat = lambda x: x.reshape((F * P,) + x.shape[2:])
    (image, depth_img, final_T, n_contrib,
     num_pairs, max_per_tile) = tile_blend.blend_fused(
        bcfg, flat(pre.means2d), flat(pre.conic), flat(pre.opacity),
        flat(pre.color), flat(pre.depth), flat(pre.rect),
        flat(pre.tiles_touched.astype(jnp.int32)), bg,
    )
    # blend_fused returns single-image conventions when n_images == 1;
    # this function's contract is ALWAYS view-batched [F, ...]
    image = image.reshape((F,) + image.shape[-3:])
    depth_img = depth_img.reshape((F,) + depth_img.shape[-2:])
    final_T = final_T.reshape((F,) + final_T.shape[-2:])
    n_contrib = n_contrib.reshape((F,) + n_contrib.shape[-2:])
    return RenderOutput(
        image=image, depth=depth_img, final_T=final_T, n_contrib=n_contrib,
        radii=pre.radius, visible=pre.visible,
        num_pairs=num_pairs, max_per_tile=max_per_tile,
    )

"""Blur-synthesis query — the reference's ``CameraMotionModule.query``.

Functional form of ``motion.py:78-160``: render every sub-frame of one
image's trajectory and average. Returns the same payload the reference's
``retrieved`` dict carries (blurred, sub-frames, depths, per-subframe
diagnostics); the training step inlines an equivalent (with the vsp
gradient channel), so this is the standalone/user-facing API.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from deblurgs_tpu.models import gaussians as gm
from deblurgs_tpu.models import motion as motion_lib
from deblurgs_tpu.ops.rasterize import RasterizeConfig, render


class BlurQuery(NamedTuple):
    blurred: jax.Array     # [H, W, 3] mean of sub-frame renders
    subframes: jax.Array   # [f, H, W, 3]
    depths: jax.Array      # [f, H, W]
    radii: jax.Array       # [f, P]
    visible: jax.Array     # [f, P]


def query(
    params: gm.GaussianParams,
    aux: gm.GaussianAux,
    motion_params: motion_lib.MotionParams,
    cam_idx,
    proj: jax.Array,
    cs,
    *,
    gcfg: gm.GaussianConfig,
    mcfg: motion_lib.MotionConfig,
    rcfg: RasterizeConfig = RasterizeConfig(),
    sh_degree: Optional[int] = None,
    background: Optional[jax.Array] = None,
    nu: Optional[jax.Array] = None,
    rng: Optional[jax.Array] = None,
    post_process=None,
) -> BlurQuery:
    """Render the blurry observation of image ``cam_idx``.

    ``background``: [3] color, or None for random (reference default);
    ``nu``: explicit sub-frame times, or None to sample from the alignment
    parameters (with jitter when ``mcfg.curve_random_sample`` and ``rng``).
    """
    sh_degree = gcfg.sh_degree if sh_degree is None else sh_degree
    if background is None:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        rng, k_bg = jax.random.split(rng)
        background = jax.random.uniform(k_bg, (3,))
    if nu is None:
        k_nu = None
        if mcfg.curve_random_sample and rng is not None:
            rng, k_nu = jax.random.split(rng)
        nu = motion_lib.sample_nu(motion_params, cam_idx, mcfg, key=k_nu)

    cams = motion_lib.subframe_cameras(motion_params, cam_idx, nu, proj, mcfg)
    rin = gm.render_inputs(params, gcfg)

    def one(cam):
        out = render(rin["means3d"], rin["scales"], rin["rotations"],
                     rin["opacities"], rin["shs"], cam, cs, background,
                     cfg=rcfg, sh_degree=sh_degree, active=aux.active)
        return out.image, out.depth, out.radii, out.visible

    images, depths, radii, visible = jax.lax.map(one, cams)
    blurred = jnp.mean(images, axis=0)
    if post_process is not None:
        blurred = post_process(blurred)
    return BlurQuery(blurred=blurred, subframes=images, depths=depths,
                     radii=radii, visible=visible)

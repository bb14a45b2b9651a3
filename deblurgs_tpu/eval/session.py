"""Load a trained run (model dir) back into render-ready state.

Reference counterpart: the eval-time path of ``Scene.__init__`` with
``load_iteration=-1`` + ``camera_motion_module.load`` (``scene/__init__.py``,
``motion.py:351-365``) driven by the persisted ``cfg_args``.
"""

from __future__ import annotations

import dataclasses
import os
from argparse import Namespace

import jax.numpy as jnp

from deblurgs_tpu.data.gaussian_ply import load_gaussian_ply
from deblurgs_tpu.data.scene import Scene
from deblurgs_tpu.models import gaussians as gm
from deblurgs_tpu.models.motion import MotionConfig
from deblurgs_tpu.ops.rasterize import RasterizeConfig
from deblurgs_tpu.train import checkpoint as ckpt_lib


@dataclasses.dataclass
class TrainedSession:
    scene: Scene
    gcfg: gm.GaussianConfig
    mcfg: MotionConfig
    rcfg: RasterizeConfig
    params: gm.GaussianParams
    aux: gm.GaussianAux
    motion: object
    iteration: int
    tone_mapping: str


def read_cfg_args(model_path: str) -> Namespace:
    with open(os.path.join(model_path, "cfg_args")) as f:
        return eval(f.read())


def load_session(model_path: str, source_path: str | None = None,
                 load_iteration: int = -1, resolution: int | None = None,
                 backend: str | None = None) -> TrainedSession:
    args = read_cfg_args(model_path)
    source = source_path or args.source_path
    use_sigmoid = getattr(args, "activation", "relu") == "sigmoid"

    gcfg = gm.GaussianConfig(
        sh_degree=args.sh_degree,
        alpha_lower_bound=getattr(args, "alpha_lower_bound", 0.0),
        scale_lb=getattr(args, "scale_lb", 0.0),
        scale_ub=getattr(args, "scale_ub", -1.0),
        use_isotropic=getattr(args, "use_isotrophic", False),
        use_sigmoid=use_sigmoid,
        z_near=getattr(args, "z_near", 0.2),
        z_far=getattr(args, "z_far", 100.0),
    )
    mcfg = MotionConfig(
        curve_order=args.curve_order, n_subframes=args.num_subframes,
        curve_type=args.curve_type,
    )
    from deblurgs_tpu.ops.rasterize import default_interpret

    # max_pairs <= 0 is the training CLI's "auto-size at train start"
    # marker (resolved per-run by Trainer.autosize_max_pairs); eval renders
    # are single-view, so the plain single-view default applies here
    mp = getattr(args, "max_pairs", 1 << 19)
    rcfg = RasterizeConfig(
        backend=backend or getattr(args, "backend", "xla"),
        max_pairs=mp if mp > 0 else 1 << 19,
        tile_w=getattr(args, "tile", 16), tile_h=getattr(args, "tile", 16),
        window=getattr(args, "window", 1),
        layout=getattr(args, "kernel_layout", "lockstep"),
        cull_z=gcfg.z_near, z_far=gcfg.z_far, use_sigmoid=use_sigmoid,
        interpret=default_interpret(),
    )
    scene = Scene(
        source, model_path=None,
        images=getattr(args, "images", "images"),
        resolution=resolution if resolution is not None else args.resolution,
        eval_split=getattr(args, "eval", False),
        llffhold=getattr(args, "llffhold", 0),
        num_initial_pcd=getattr(args, "num_initial_pcd", -1),
        z_near=gcfg.z_near, z_far=gcfg.z_far,
        use_sigmoid=use_sigmoid, shuffle=False,
    )

    pc_root = os.path.join(model_path, "point_cloud")
    it = (Scene.search_max_iteration(pc_root)
          if load_iteration == -1 else load_iteration)
    params, aux = load_gaussian_ply(
        os.path.join(pc_root, f"iteration_{it}", "point_cloud.ply"), gcfg)
    motion = ckpt_lib.load_motion(os.path.join(model_path, "cm.npz"))
    return TrainedSession(
        scene=scene, gcfg=gcfg, mcfg=mcfg, rcfg=rcfg,
        params=params, aux=aux, motion=motion, iteration=it,
        tone_mapping=getattr(args, "tone_mapping_type", "gamma"),
    )


def render_view(session: TrainedSession, cam, *, tone_map: bool = True,
                bg=None):
    """Render one CameraArrays view from a loaded session → (image, depth).

    The render is jit-compiled once per session (scene state passed as
    arguments — closure capture would inline the Gaussian tensors as HLO
    constants and balloon compile times)."""
    import jax

    from deblurgs_tpu.models import tonemap as tm
    from deblurgs_tpu.ops.rasterize import render

    # the cache key carries every captured static (a session whose rcfg is
    # swapped after the first render — e.g. a backend change — must re-jit,
    # not silently reuse the old configuration)
    cs = session.scene.camera_static
    rcfg, gcfg = session.rcfg, session.gcfg
    key = ("_render_jit", tone_map, rcfg, gcfg, cs, session.tone_mapping)
    fn = getattr(session, "_render_cache", {}).get(key)
    if fn is None:

        @jax.jit
        def fn(params, active, cam, bg):
            rin = gm.render_inputs(params, gcfg)
            out = render(rin["means3d"], rin["scales"], rin["rotations"],
                         rin["opacities"], rin["shs"], cam, cs, bg,
                         cfg=rcfg, sh_degree=gcfg.sh_degree, active=active)
            img = out.image
            if tone_map:
                img = tm.tone_map(img, session.tone_mapping)
            return jnp.clip(img, 0.0, 1.0), out.depth

        if not hasattr(session, "_render_cache"):
            session._render_cache = {}
        session._render_cache[key] = fn
    bg = bg if bg is not None else jnp.zeros(3)
    return fn(session.params, session.aux.active, cam, bg)

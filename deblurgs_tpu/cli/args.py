"""Reflection-based argparse groups — reference ``arguments/__init__.py``.

``ParamGroup`` turns dataclass-style attribute defaults into ``--flags``
(leading underscore = one-letter shorthand), and ``get_combined_args``
round-trips persisted run configs (``cfg_args``) for the eval-time tools,
exactly like the reference (``arguments/__init__.py:19-145``).
"""

from __future__ import annotations

import os
import sys
from argparse import ArgumentParser, Namespace


class GroupParams:
    pass


class ParamGroup:
    def __init__(self, parser: ArgumentParser, name: str, fill_none=False):
        group = parser.add_argument_group(name)
        for key, value in vars(self).items():
            shorthand = False
            if key.startswith("_"):
                shorthand = True
                key = key[1:]
            t = type(value)
            value = value if not fill_none else None
            args = ["--" + key] + (["-" + key[0:1]] if shorthand else [])
            if t == bool:
                group.add_argument(*args, default=value, action="store_true")
                if value:
                    # a True-default flag is a no-op under store_true; give
                    # every such flag a --no_* opt-out (the reference has no
                    # True-default bools so its ParamGroup never needed one)
                    group.add_argument("--no_" + key, dest=key,
                                       action="store_false")
            else:
                group.add_argument(*args, default=value, type=t)

    def extract(self, args):
        group = GroupParams()
        for k, v in vars(args).items():
            if k in vars(self) or ("_" + k) in vars(self):
                setattr(group, k, v)
        return group


class ModelParams(ParamGroup):
    """Reference ``ModelParams`` (``arguments/__init__.py:47-88``)."""

    def __init__(self, parser, sentinel=False):
        self.sh_degree = 2
        self._source_path = ""
        self._model_path = ""
        self._images = "images"
        self._resolution = -1
        self._white_background = False
        self.eval = False
        self.llffhold = 0
        self.num_initial_pcd = -1

        self.num_subframes = 21
        self.curve_order = 9
        self.curve_type = "se3"

        self.z_near = 0.2
        self.z_far = 100.0

        self.random_init = False
        self.alpha_lower_bound = 0.0
        self.scale_lb = 0.0
        self.scale_ub = -1.0
        self.tone_mapping_type = "gamma"
        self.activation = "relu"
        self.use_isotrophic = False
        self.curve_random_sample = False

        # TPU-framework additions
        self.backend = "pallas"       # "pallas" | "xla" | "oracle"
        self.max_pairs = 0            # pair-list capacity; 0 = auto two-pass
                                      # sizing at train start (train/loop.py
                                      # probes every camera's nominal view and
                                      # budgets the full batched launch)
        # mixed-layout 32×32 kernels are the measured training optimum on
        # v5e (1080p/100k A/B, runs/r3_matrix_f32.log: fwd+bwd 45 ms vs
        # lockstep's 74 ms; window 2 best for fwd+bwd, window 1 for fwd)
        self.tile = 32
        self.window = 2               # pallas mixed: tiles per output block
        self.kernel_layout = "mixed"  # pallas grid: "mixed" | "lockstep"
        self.tile_cull = True         # exact per-pair tile cull (pallas)
        self.fast = False             # fast blend (pallas mixed): drop the
                                      # per-lane T-freeze gates; bounded
                                      # ~1e-3-order error (see
                                      # BlendConfig.fast)
        self.tight_rect = True        # 1/255-ellipse AABB emission rects
        self.batched_render = True    # all sub-frames in ONE rasterizer
                                      # launch (kernel_layout=mixed). The
                                      # measured-best operating point: the
                                      # un-batched loop pays a full
                                      # binning+sort per sub-frame — 6×
                                      # slower at f=21 (BASELINE.md r4).
                                      # Opt out with --no_batched_render.
        self.cams_per_step = 1        # B training cameras per step: every
                                      # batched camera's curve gets a fresh
                                      # Adam update each step (the reference
                                      # visits one random camera per iter)

        super().__init__(parser, "Loading Parameters", sentinel)

    def extract(self, args):
        g = super().extract(args)
        g.source_path = os.path.abspath(g.source_path)
        return g


class OptimizationParams(ParamGroup):
    """Reference ``OptimizationParams`` (``arguments/__init__.py:90-123``)."""

    def __init__(self, parser):
        from deblurgs_tpu.train.config import OptimizationConfig

        for field, value in vars(OptimizationConfig()).items():
            setattr(self, field, value)
        super().__init__(parser, "Optimization Parameters")


def apply_platform_env():
    """Pin the jax platform from ``DEBLURGS_PLATFORM`` (set by the training
    CLI for its post-training render subprocesses — the plain
    ``JAX_PLATFORMS`` env var is overridden by some accelerator plugins, so
    a child process would otherwise grab the accelerator its parent is
    still holding)."""
    p = os.environ.get("DEBLURGS_PLATFORM")
    if p:
        import jax

        jax.config.update("jax_platforms", p)


def get_combined_args(parser: ArgumentParser) -> Namespace:
    """CLI args merged over the persisted ``cfg_args`` (reference ``:125-145``)."""
    cmdline = sys.argv[1:]
    args_cmdline = parser.parse_args(cmdline)
    cfgfile_string = "Namespace()"
    try:
        cfgfilepath = os.path.join(args_cmdline.model_path, "cfg_args")
        with open(cfgfilepath) as cfg_file:
            cfgfile_string = cfg_file.read()
    except (TypeError, FileNotFoundError):
        pass
    args_cfgfile = eval(cfgfile_string)
    merged = vars(args_cfgfile).copy()
    for k, v in vars(args_cmdline).items():
        if v is not None:
            merged[k] = v
    return Namespace(**merged)


def write_run_config(args, model_path: str):
    """Persist ``args.txt`` + ``cfg_args`` (reference ``train.py:236-247``)."""
    os.makedirs(model_path, exist_ok=True)
    with open(os.path.join(model_path, "args.txt"), "w") as fp:
        for k, v in args.__dict__.items():
            print(k, ":", v, file=fp)
    with open(os.path.join(model_path, "cfg_args"), "w") as fp:
        fp.write(str(Namespace(**vars(args))))

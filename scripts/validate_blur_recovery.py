"""End-to-end DeblurGS capability validation (BASELINE.json config 2).

Synthesizes motion-blurred observations from a known Gaussian scene and
known per-image SE(3) camera trajectories, then trains from scratch (curve
initialized at the nominal pose, like the reference initializes from COLMAP
poses of blurry images) and measures:

- blur reconstruction PSNR (train objective);
- SHARP PSNR: renders at the held-out true mid-trajectory poses vs the true
  sharp images — the deblurring capability itself;
- curve recovery: translation error between learned and true trajectories.

Run:  python scripts/validate_blur_recovery.py [--iters 3000] [--backend pallas]
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# ``--platform cpu`` must take effect BEFORE the deblurgs imports below:
# deblurgs_tpu.train.step materializes a jnp default at import time, which
# initializes the backend — after that, jax_platforms updates are ignored
# and the script silently grabs the TPU (and its slow remote compiler).
if "--platform" in sys.argv:
    jax.config.update("jax_platforms",
                      sys.argv[sys.argv.index("--platform") + 1])

import jax.numpy as jnp
import numpy as np

from deblurgs_tpu.core import camera as cam_lib
from deblurgs_tpu.core import lie
from deblurgs_tpu.models import gaussians as gm
from deblurgs_tpu.models import motion as motion_lib
from deblurgs_tpu.ops.rasterize import RasterizeConfig, render
from deblurgs_tpu.train import step as step_lib
from deblurgs_tpu.train.config import OptimizationConfig
from deblurgs_tpu.train.losses import psnr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--backend", type=str, default="pallas")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--n_gauss", type=int, default=800)
    ap.add_argument("--n_cams", type=int, default=6)
    ap.add_argument("--n_sub", type=int, default=9)
    ap.add_argument("--blur_scale", type=float, default=0.12,
                    help="trajectory length (world units ~ strong blur)")
    ap.add_argument("--platform", type=str, default=None,
                    help="force a jax platform (e.g. cpu)")
    ap.add_argument("--freeze_scene", action="store_true",
                    help="train only the camera curves against the true "
                         "scene (isolates motion-recovery)")
    ap.add_argument("--no_densify", action="store_true")
    ap.add_argument("--no_curve", action="store_true",
                    help="blurry-fit baseline: never enable the camera "
                         "curve (sharp 3DGS trained against blurry GT)")
    ap.add_argument("--curve_start", type=int, default=100)
    ap.add_argument("--curve_end_frac", type=float, default=1.0,
                    help="freeze curves at this fraction of iters and "
                         "polish the scene sharp (reference phase: "
                         "curve_end_iter=100k/150k ≈ 0.67)")
    ap.add_argument("--opacity_reset", type=int, default=10_000_000)
    ap.add_argument("--densify_from", type=int, default=500)
    ap.add_argument("--densify_interval", type=int, default=200)
    ap.add_argument("--capacity_mult", type=int, default=4)
    ap.add_argument("--report", type=str, default=None,
                    help="write a JSON result line to this path")
    ap.add_argument("--random_sample", action="store_true",
                    help="jitter the sub-frame times each step (reference "
                         "curve_random_sample)")
    ap.add_argument("--batched", action="store_true",
                    help="render all sub-frames in one rasterizer launch "
                         "(pallas mixed layout; max_pairs budgets n_sub "
                         "views)")
    ap.add_argument("--layout", type=str, default="lockstep",
                    choices=["lockstep", "mixed"])
    ap.add_argument("--tile", type=int, default=16,
                    help="rasterizer tile size (mixed-32 is the measured "
                         "device optimum at bench scale; the default "
                         "matches the historical harness runs)")
    ap.add_argument("--cams_per_step", type=int, default=1,
                    help="B training cameras per step (every batched "
                         "camera's curve gets a fresh Adam update each "
                         "step; B*n_sub views render per step)")
    ap.add_argument("--window", type=int, default=1)
    ap.add_argument("--chunk", type=int, default=0,
                    help="mixed-layout pairs per grid step (0 = 128; wider "
                         "chunks amortize the kernel's per-step overhead)")
    ap.add_argument("--fast", action="store_true",
                    help="fast blend mode on the training config (mixed "
                         "layout only; bounded ~1e-3-order error — the "
                         "eval/synth renders stay exact)")
    ap.add_argument("--pos_lr", type=float, default=0.00016,
                    help="xyz LR init (reference default)")
    ap.add_argument("--curve_lr_mult", type=float, default=1.0)
    ap.add_argument("--curve_half_frac", type=float, default=0.1,
                    help="curve LR half-life as a fraction of iters "
                         "(reference: 15k/150k)")
    ap.add_argument("--init_noise", type=float, default=0.001)
    ap.add_argument("--clip_grad", type=float, default=-1.0,
                    help="gradient value clipping (the reference's "
                         "stability option, train.py:204-205; <=0 = off)")
    ap.add_argument("--max_pairs", type=int, default=1 << 17)
    ap.add_argument("--true_scale", type=float, default=0.035,
                    help="true-scene Gaussian scale (world units; small = "
                         "high-frequency detail so blur is observable)")
    ap.add_argument("--texture", type=str, default="random",
                    choices=["random", "checker"],
                    help="true-scene coloring. 'random' = per-splat noise "
                         "(flat spectrum — maximally destroyed by blur and "
                         "maximally hard to deconvolve; the r4 calibration "
                         "showed oracle==floor on it). 'checker' = edge-rich "
                         "3D checkerboard: large same-color regions with "
                         "sharp boundaries, the structure deconvolution can "
                         "actually recover (VERDICT r4 #2)")
    ap.add_argument("--checker_cell", type=float, default=0.5,
                    help="checker texture cell size (world units)")
    ap.add_argument("--save_state", type=str, default=None,
                    help="write the final TrainState checkpoint here")
    ap.add_argument("--pose_refine_iters", type=int, default=0,
                    help="iNeRF-style per-view pose refinement before the "
                         "final sharp eval (the REFERENCE eval protocol: "
                         "test.py re-registers + refines poses before "
                         "metrics, because the scene/curve gauge can drift "
                         "jointly; 0 = raw true-pose eval only)")
    ap.add_argument("--init_true_curves", action="store_true",
                    help="initialize the learned curves at the TRUE swept "
                         "trajectories (+init_noise on the control points) "
                         "instead of the static nominal poses — separates "
                         "'optimization drifts away from the answer' from "
                         "'optimization cannot find the answer'")
    ap.add_argument("--baseline_sharp", type=float, default=None,
                    help="no-curve blurry-fit baseline sharp PSNR (dB). "
                         "When set, PASS requires gauge-fair sharp >= "
                         "baseline + 3 dB AND gauge-aligned traj_err <= "
                         "gauge-aligned init err (like-for-like); "
                         "otherwise the legacy absolute 24 dB gate applies")
    ap.add_argument("--gt_oversample", type=int, default=1,
                    help="synthesize the blurry GT from n_sub*K uniform "
                         "trajectory samples (K>1 approximates CONTINUOUS "
                         "exposure blur instead of the model's discrete "
                         "sub-frame grid — the realistic, non-gameable "
                         "setting)")
    ap.add_argument("--ckpt_every", type=int, default=0,
                    help="rolling TrainState checkpoint cadence (keeps the "
                         "last two under <report-or-save_state stem>_ckpt_"
                         "<it>.npz — forensics/bisect support; 0 = off)")
    ap.add_argument("--curve_alignment_lr", type=float, default=0.0,
                    help="alignment (nu) LR (reference default 0.0, "
                         "suggested 3e-3; warms up from curve_align_start)")
    ap.add_argument("--curve_align_start", type=int, default=0,
                    help="alignment LR warmup start iteration")
    ap.add_argument("--seed", type=int, default=0,
                    help="PRNG seed for the scene/noise/training draws "
                         "(stability soaks rerun the joint arm across "
                         "seeds to show a NaN class is fixed, not dodged)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    W = H = args.size
    fovx = 1.1
    fovy = 2 * math.atan(math.tan(fovx / 2))
    cs = cam_lib.CameraStatic(width=W, height=H, tanfovx=math.tan(fovx / 2),
                              tanfovy=math.tan(fovx / 2))
    proj = cam_lib.get_projection_matrix(0.01, 100.0, fovx, fovx)

    # ---- true scene
    key = jax.random.PRNGKey(args.seed)
    ks = jax.random.split(key, 8)
    fg = jax.random.normal(ks[0], (args.n_gauss, 3)) * 0.9
    # opaque backdrop wall so every pixel is covered — the training loop uses
    # random backgrounds (reference behavior for real photos), which only
    # works when the scene occludes the background everywhere
    side = int(math.ceil(math.sqrt(args.n_gauss // 2)))
    gx, gy = jnp.meshgrid(jnp.linspace(-4, 4, side), jnp.linspace(-4, 4, side))
    wall = jnp.stack([gx.ravel(), gy.ravel(),
                      jnp.full(side * side, 2.5)], axis=-1)
    pts = jnp.concatenate([fg, wall])
    if args.texture == "checker":
        # 3-color 3D checkerboard: piecewise-constant color over
        # `checker_cell`-sized cells — low-frequency structure with sharp
        # (splat-limited) boundaries between cells. High-contrast palette so
        # an edge blurred across the sweep carries a large, recoverable
        # photometric error.
        cell_idx = jnp.floor(pts / args.checker_cell).astype(jnp.int32)
        parity = (cell_idx[:, 0] + 2 * cell_idx[:, 1]
                  + 3 * cell_idx[:, 2]) % 3
        palette = jnp.array([[0.92, 0.88, 0.15],
                             [0.10, 0.12, 0.85],
                             [0.88, 0.10, 0.12]])
        cols = palette[parity]
    else:
        cols = jax.random.uniform(ks[1], (pts.shape[0], 3), minval=0.05,
                                  maxval=0.95)
    gcfg = gm.GaussianConfig(sh_degree=2)
    true_params, true_aux = gm.create_from_pcd(pts, cols, gcfg, pts.shape[0])
    # the true scene must carry HIGH-FREQUENCY detail for blur to be
    # observable at all: KNN-seeded scales make a smooth blob whose blurred
    # and sharp renders differ by <0.5% (48 dB) even at a 0.5-unit camera
    # sweep — small hard splats + full-range colors give the blur teeth
    true_params = true_params._replace(
        opacity=jnp.full_like(true_params.opacity, 0.9),
        scaling=jnp.full_like(
            true_params.scaling,
            gm.inverse_scaling(jnp.float32(args.true_scale), gcfg)),
    )

    # ---- true per-image trajectories: nominal ring pose + SE(3) sweep
    mcfg = motion_lib.MotionConfig(curve_order=9, n_subframes=args.n_sub,
                                   curve_random_sample=args.random_sample)
    rots, centers = [], []
    for i in range(args.n_cams):
        ang = 2 * math.pi * i / args.n_cams * 0.25
        rot = lie.so3_exp_map(jnp.array([[0.15 * math.sin(ang), ang, 0.0]]))[0]
        rots.append(rot)
        centers.append(rot @ jnp.array([0.0, 0.0, -4.0]))
    rots = jnp.stack(rots)
    centers = jnp.stack(centers)

    true_motion = motion_lib.init_motion(rots, centers, mcfg, ks[2],
                                         init_noise=0.0)
    # sweep: linear offset of the translation control points (start→end)
    n_ctrl = mcfg.curve_order + 1
    sweep_dir = jax.random.normal(ks[3], (args.n_cams, 1, 3))
    sweep_dir = sweep_dir / jnp.linalg.norm(sweep_dir, axis=-1, keepdims=True)
    tline = jnp.linspace(-0.5, 0.5, n_ctrl)[None, :, None]
    true_motion = true_motion._replace(
        trans_ctrl=true_motion.trans_ctrl + args.blur_scale * sweep_dir * tline,
        rot_ctrl=true_motion.rot_ctrl
        + 0.04 * jax.random.normal(ks[4], (args.n_cams, 1, 3)) * tline,
    )

    # training config: with --batched, max_pairs budgets ALL n_sub views of
    # a launch. The mixed kernel's scalar-prefetched step maps live in SMEM
    # (1 MB), which caps max_pairs around ~2M — keep the big budget off the
    # single-view eval/synth renders, which get their own small config.
    train_layout = "mixed" if args.batched else args.layout
    train_ncon = not (args.batched or args.layout == "mixed")
    rcfg = RasterizeConfig(backend=args.backend, max_pairs=args.max_pairs,
                           k_max=1024, tile_w=args.tile, tile_h=args.tile,
                           layout=train_layout, window=args.window,
                           need_n_contrib=train_ncon,
                           chunk=args.chunk if train_layout == "mixed"
                           else 0,
                           fast=(args.fast and args.backend == "pallas"
                                 and train_layout == "mixed"
                                 and not train_ncon))
    rcfg_eval = RasterizeConfig(backend=args.backend,
                                max_pairs=min(args.max_pairs, 1 << 17),
                                k_max=1024, tile_w=args.tile,
                                tile_h=args.tile, layout=args.layout,
                                window=args.window, need_n_contrib=False)

    def render_with(params, active, cam):
        rin = gm.render_inputs(params, gcfg)
        return render(rin["means3d"], rin["scales"], rin["rotations"],
                      rin["opacities"], rin["shs"], cam, cs, jnp.zeros(3),
                      cfg=rcfg_eval, sh_degree=2, active=active).image

    # blurry GT (mean of uniform sub-frame renders) + sharp mid-pose GT.
    # Everything jitted with scene state passed as ARGUMENTS (closure
    # capture would inline megabytes of constants into the HLO and choke
    # the remote compiler); eager dispatch is likewise avoided.
    print("synthesizing ground truth...")
    n_gt = args.n_sub * args.gt_oversample
    nu = jnp.linspace(0.0, 1.0, n_gt)

    @jax.jit
    def synth(params, active, motion, i):
        cams = motion_lib.subframe_cameras(motion, i, nu, proj, mcfg)
        frames = jax.lax.map(
            lambda c: render_with(params, active, c), cams)
        mid = jax.tree.map(lambda l: l[n_gt // 2], cams)
        return frames.mean(0), render_with(params, active, mid), mid

    blur_l, sharp_l, mid_cams = [], [], []
    for i in range(args.n_cams):
        b, sgt, mid = synth(true_params, true_aux.active, true_motion,
                            jnp.int32(i))
        jax.block_until_ready(b)
        print(f"  cam {i} synthesized", flush=True)
        blur_l.append(b)
        sharp_l.append(mid_cams.append(mid) or sgt)
    blur_gts = jnp.stack(blur_l)
    sharp_gts = jnp.stack(sharp_l)
    jax.block_until_ready((blur_gts, sharp_gts))
    # the no-deblur FLOOR: how far the blurry observations already sit
    # from the sharp truth. A baseline that only fits the blur scores ~
    # this; oracle - floor is the maximum measurable deblurring headroom,
    # so a scene is only a valid testbed when floor << oracle ceiling.
    blur_floor = float(np.mean([
        float(psnr(jnp.clip(blur_gts[i], 0, 1), jnp.clip(sharp_gts[i], 0, 1)))
        for i in range(args.n_cams)]))
    print(f"  synthesis done; blur-vs-sharp floor {blur_floor:.2f} dB",
          flush=True)

    # ---- model init: nominal poses (no trajectory knowledge), noisy points
    if args.freeze_scene:
        params, aux = true_params, true_aux
        params, aux = gm.create_from_pcd(pts, cols, gcfg, pts.shape[0])
        params = true_params
        zero_lr = dict(position_lr_init=0.0, position_lr_final=0.0,
                       feature_lr=0.0, opacity_lr=0.0, scaling_lr=0.0,
                       rotation_lr=0.0, lambda_hinge=0.0)
    else:
        init_pts = pts + 0.03 * jax.random.normal(ks[5], pts.shape)
        params, aux = gm.create_from_pcd(
            init_pts, cols, gcfg, capacity=pts.shape[0] * args.capacity_mult)
        zero_lr = {}
    if args.init_true_curves:
        kr, kt = jax.random.split(ks[6])
        motion0 = true_motion._replace(
            rot_ctrl=true_motion.rot_ctrl + args.init_noise
            * jax.random.normal(kr, true_motion.rot_ctrl.shape),
            trans_ctrl=true_motion.trans_ctrl + args.init_noise
            * jax.random.normal(kt, true_motion.trans_ctrl.shape),
        )
    else:
        motion0 = motion_lib.init_motion(rots, centers, mcfg, ks[6],
                                         init_noise=args.init_noise)

    curve_start = (10**9 if args.no_curve else args.curve_start)
    ocfg = OptimizationConfig(
        iterations=args.iters, curve_start_iter=curve_start,
        curve_end_iter=int(args.iters * args.curve_end_frac) + 1,
        densify_from_iter=(10**9 if (args.freeze_scene or args.no_densify)
                           else args.densify_from),
        densification_interval=args.densify_interval,
        densify_until_iter=int(args.iters * 0.7),
        opacity_reset_interval=args.opacity_reset,
        curve_controlpoints_lr=1e-2 * args.curve_lr_mult,
        curve_rotation_lr=1e-3 * args.curve_lr_mult,
        curve_lr_half_iter=max(int(args.iters * args.curve_half_frac), 1),
        curve_alignment_lr=args.curve_alignment_lr,
        curve_alignment_start=args.curve_align_start,
        clip_grad=args.clip_grad,
        **{"position_lr_init": args.pos_lr,
           "position_lr_final": args.pos_lr / 100.0,
           **zero_lr},
    )
    state = step_lib.init_state(params, motion0, aux, ks[7])

    _sharp_render = jax.jit(render_with)

    def sharp_psnr(state):
        vals = []
        for i in range(args.n_cams):
            img = _sharp_render(state.params, state.aux.active, mid_cams[i])
            vals.append(float(psnr(jnp.clip(img, 0, 1),
                                   jnp.clip(sharp_gts[i], 0, 1))))
        return float(np.mean(vals))

    @jax.jit
    def _render_mid(params, active, motion, i):
        # mid-exposure camera of the LEARNED curve (ν=0.5): the reference's
        # render_trainview protocol (get_middle_cams). Gauge-invariant: a
        # joint scene+curve solution that drifted to a shifted gauge still
        # renders the true sharp image from its own mid pose, while a
        # genuinely wrong curve leaves the scene blurry from any pose.
        cams = motion_lib.subframe_cameras(motion, i, jnp.full((1,), 0.5),
                                           proj, mcfg)
        return render_with(params, active, jax.tree.map(lambda l: l[0], cams))

    def sharp_mid_psnr(state):
        vals = []
        for i in range(args.n_cams):
            img = _render_mid(state.params, state.aux.active, state.motion,
                              jnp.int32(i))
            vals.append(float(psnr(jnp.clip(img, 0, 1),
                                   jnp.clip(sharp_gts[i], 0, 1))))
        return float(np.mean(vals))

    print(f"sharp PSNR at init: {sharp_psnr(state):.2f} dB")

    step_cache = {}

    def get_step(sh_degree, n_sub):
        key = (sh_degree, n_sub)
        if key not in step_cache:
            st = step_lib.TrainStatics(
                gcfg=gcfg, mcfg=mcfg, ocfg=ocfg, rcfg=rcfg, cs=cs,
                sh_degree=sh_degree, n_sub=n_sub, tone_mapping="identity",
                spatial_lr_scale=2.0, random_sample=args.random_sample,
                batched_render=args.batched,
                cams_per_step=args.cams_per_step)
            step_cache[key] = step_lib.make_train_step(st)
        return step_cache[key]

    def _chamfer(c_l, c_t):
        d = jnp.linalg.norm(c_l[:, None] - c_t[None, :], axis=-1)
        return 0.5 * (float(jnp.mean(jnp.min(d, 1)))
                      + float(jnp.mean(jnp.min(d, 0))))

    def traj_error(motion, align_gauge=False):
        """Mean distance between learned and true *sampled* trajectories,
        after removing each image's mean position (control points are
        gauge-free: many control polygons produce the same curve, and the
        scene/pose gauge can shift jointly).

        With ``align_gauge``, a single global SE(3) (Kabsch over ALL
        sampled camera centers) is removed first: the joint scene+curve
        solution is defined only up to a world-frame motion — the probe
        runs show pose-refined sharp PSNR at the frozen-truth ceiling
        while the raw chamfer reports 'drift' (runs/r3_cpu_*.json), i.e.
        the un-aligned number measures the gauge, not the capability. The
        reference's own eval re-registers poses for exactly this reason
        (test.py:188-398)."""
        # A mean-blur constrains the *set* of poses visited during the
        # exposure, not their ordering (the average is permutation- and
        # time-reversal-invariant), so compare centered camera-center sets
        # with a symmetric Chamfer distance.
        ts = jnp.linspace(0.0, 1.0, 16)
        c_ls, c_ts = [], []
        for i in range(args.n_cams):
            _, c_l = motion_lib.sample_c2w(motion, i, ts, mcfg)
            _, c_t = motion_lib.sample_c2w(true_motion, i, ts, mcfg)
            c_ls.append(np.asarray(c_l))
            c_ts.append(np.asarray(c_t))
        if not np.isfinite(np.concatenate(c_ls)).all():
            # a poisoned curve must degrade to NaN metrics, never crash
            # the report (round 3 lost r3_meso_joint.json to an unguarded
            # SVD on NaN centers)
            return float("nan")
        if align_gauge:
            A = np.concatenate(c_ls)           # learned [n*16, 3]
            B = np.concatenate(c_ts)           # true
            muA, muB = A.mean(0), B.mean(0)
            H = (A - muA).T @ (B - muB)
            U, _, Vt = np.linalg.svd(H)
            S = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
            R = Vt.T @ S @ U.T                 # maps learned -> true
            t = muB - R @ muA
            c_ls = [c @ R.T + t for c in c_ls]
        errs = []
        for c_l, c_t in zip(c_ls, c_ts):
            errs.append(_chamfer(jnp.asarray(c_l - c_l.mean(0)),
                                 jnp.asarray(c_t - c_t.mean(0))))
        return float(np.mean(errs))

    def _state_finite(state):
        """Cheap device-side all-leaves-finite check (one scalar sync)."""
        leaves = (jax.tree.leaves(state.params) + jax.tree.leaves(state.motion))
        ok = jnp.array(True)
        for l in leaves:
            if jnp.issubdtype(l.dtype, jnp.floating):
                ok = ok & jnp.isfinite(l).all()
        return bool(ok)

    ckpt_stem = None
    if args.ckpt_every > 0:
        base = args.save_state or args.report or "runs/validate"
        ckpt_stem = os.path.splitext(base)[0] + "_ckpt"
    ckpts_kept = []
    nan_at = None

    t0 = time.time()
    for it in range(1, args.iters + 1):
        sh_deg = min(it // 1000, gcfg.sh_degree)
        n_sub = args.n_sub if it >= ocfg.curve_start_iter else 1
        fn = get_step(sh_deg, n_sub)
        B = args.cams_per_step
        if B == 1:
            idx = (it - 1) % args.n_cams
            state, metrics = fn(state, blur_gts[idx], jnp.int32(idx), proj)
        else:
            sel = (np.arange(B) + (it - 1) * B) % args.n_cams
            sel = jnp.asarray(sel, jnp.int32)
            state, metrics = fn(state, blur_gts[sel], sel, proj)
        if ckpt_stem and it % args.ckpt_every == 0:
            from deblurgs_tpu.train import checkpoint as ckpt_lib
            p = f"{ckpt_stem}_{it}.npz"
            ckpt_lib.save_checkpoint(p, state)
            ckpts_kept.append(p)
            while len(ckpts_kept) > 2:
                old = ckpts_kept.pop(0)
                if os.path.exists(old):
                    os.remove(old)
        if it % 200 == 0 or it == args.iters:
            # ---- NaN guard: a poisoned state must abort (with a state
            # dump for forensics), not burn hours training garbage
            # (round 3 trained 13k iterations past the NaN onset)
            if (not np.isfinite(float(metrics.loss))
                    or not _state_finite(state)):
                nan_at = it
                from deblurgs_tpu.train import checkpoint as ckpt_lib
                base = args.save_state or args.report or "runs/validate"
                dump = os.path.splitext(base)[0] + f"_nanstate_it{it}.npz"
                ckpt_lib.save_checkpoint(dump, state)
                print(f"!! non-finite loss/params detected at the it={it} "
                      f"sync (onset within the last 200 steps) — state "
                      f"dumped to {dump}; aborting", flush=True)
                break
            tr_err = traj_error(state.motion)
            print(f"it {it}: blur-l1={float(metrics.l1):.4f} "
                  f"psnr(blur)={float(metrics.psnr):.2f} "
                  f"sharp-psnr={sharp_psnr(state):.2f} "
                  f"sharp-mid={sharp_mid_psnr(state):.2f} "
                  f"curve-trans-err={tr_err:.4f} "
                  f"#pts={int(metrics.num_active)} "
                  f"({(time.time()-t0):.0f}s)", flush=True)

    final_sharp = sharp_psnr(state)
    final_mid = sharp_mid_psnr(state)
    refined_sharp = None
    if args.pose_refine_iters > 0 and nan_at is None:
        # reference eval protocol analog (test.py:131-186): refine each
        # evaluation pose photometrically before metrics — the joint
        # scene+curve solution is gauge-free, so the true-pose eval
        # undercounts quality by the gauge offset
        from deblurgs_tpu.core import transforms as tfm
        from deblurgs_tpu.train import optim as optim_lib

        def rotmat_to_quat(R):
            # w-first, from the trace (small-angle safe enough here)
            w = jnp.sqrt(jnp.maximum(1 + R[0, 0] + R[1, 1] + R[2, 2], 1e-8)) / 2
            x = (R[2, 1] - R[1, 2]) / (4 * w)
            y = (R[0, 2] - R[2, 0]) / (4 * w)
            z = (R[1, 0] - R[0, 1]) / (4 * w)
            return jnp.stack([w, x, y, z])

        rin_f = gm.render_inputs(state.params, gcfg)

        def render_pose(quat, trans):
            R = tfm.quat_to_rotmat(quat + 1e-8, normalize=True)
            view = jnp.zeros((4, 4), jnp.float32)
            view = view.at[:3, :3].set(R).at[3, :3].set(trans).at[3, 3].set(1.0)
            cam = cam_lib.make_camera_arrays(view, proj)
            return render(rin_f["means3d"], rin_f["scales"],
                          rin_f["rotations"], rin_f["opacities"], rin_f["shs"],
                          cam, cs, jnp.zeros(3), cfg=rcfg_eval, sh_degree=2,
                          active=state.aux.active).image

        # ONE jitted step shared by every view — a per-view closure would
        # recompile through the slow remote-compile tunnel once per view
        # (~2-4 min each; measured 20+ min of refine overhead on an 8-view
        # arm before hoisting)
        def _loss_fn(p, gt):
            img = render_pose(*p)
            return jnp.abs(img - gt).mean()

        @jax.jit
        def _refine_step(p, st_o, lr_scale, gt):
            l, g = jax.value_and_grad(_loss_fn)(p, gt)
            p, st_o = optim_lib.update(
                p, g, st_o, (5e-5 * lr_scale, 5e-4 * lr_scale))
            return p, st_o, l

        def refine_one(cam0, gt):
            quat0 = rotmat_to_quat(cam0.view[:3, :3])
            trans0 = cam0.view[3, :3]
            pose = (quat0, trans0)
            st_o = optim_lib.init(pose)
            for e in range(args.pose_refine_iters):
                lr_scale = jnp.float32(0.9 ** (e * 20 // max(args.pose_refine_iters, 1)))
                pose, st_o, _ = _refine_step(pose, st_o, lr_scale, gt)
            img = jnp.clip(render_pose(*pose), 0, 1)
            return float(psnr(img, jnp.clip(gt, 0, 1)))

        def learned_mid_cam(i):
            cams = motion_lib.subframe_cameras(
                state.motion, jnp.int32(i), jnp.full((1,), 0.5), proj, mcfg)
            return jax.tree.map(lambda l: l[0], cams)

        # init each refinement at the LEARNED mid pose (the reference inits
        # at COLMAP poses registered against the learned scene's renders,
        # i.e. poses already in the learned gauge — test.py:188-398)
        vals = [refine_one(learned_mid_cam(i), sharp_gts[i])
                for i in range(args.n_cams)]
        refined_sharp = float(np.mean(vals))
        print(f"pose-refined sharp PSNR: {refined_sharp:.2f} dB")
    if args.save_state:
        from deblurgs_tpu.train import checkpoint as ckpt_lib
        ckpt_lib.save_checkpoint(args.save_state, state)
    tr_err = traj_error(state.motion)
    tr_err_al = traj_error(state.motion, align_gauge=True)
    init_err = traj_error(motion0)
    init_err_al = traj_error(motion0, align_gauge=True)
    n_overflow = int(state.overflow_count)
    print(f"\nFINAL: sharp PSNR {final_sharp:.2f} dB (learned-mid-cam "
          f"{final_mid:.2f} dB); "
          f"curve translation error {tr_err:.4f} (init {init_err:.4f}); "
          f"gauge-aligned {tr_err_al:.4f} (init {init_err_al:.4f}); "
          f"overflowed steps {n_overflow}")
    if args.report:
        import json

        def _j(x):  # NaN is not valid JSON — encode as null
            return None if (isinstance(x, float) and not math.isfinite(x)) else x

        with open(args.report, "w") as fp:
            json.dump({
                "sharp_psnr": _j(final_sharp), "traj_err": _j(tr_err),
                "traj_err_init": _j(init_err),
                "traj_err_aligned": _j(tr_err_al),
                "traj_err_aligned_init": _j(init_err_al),
                "overflow_steps": n_overflow,
                "blur_floor_psnr": _j(blur_floor),
                "final_points": int(state.aux.active.sum()),
                "sharp_psnr_midcam": _j(final_mid),
                "sharp_psnr_pose_refined": _j(refined_sharp),
                "nan_at": nan_at,
                "iters": args.iters, "n_cams": args.n_cams,
                "n_sub": args.n_sub, "size": args.size,
                "no_curve": args.no_curve, "no_densify": args.no_densify,
                "args": {k: v for k, v in vars(args).items()},
            }, fp)
    if nan_at is not None:
        print(f"VALIDATION ABORTED (non-finite state at it {nan_at})")
        return 2
    if args.freeze_scene:
        ok = tr_err < 0.6 * init_err
    else:
        # the joint solution is gauge-free: score the best of the true-pose
        # eval, the learned-mid-cam eval (reference render_trainview
        # protocol), and the pose-refined eval (reference test.py protocol)
        best_sharp = max(final_sharp, final_mid,
                         refined_sharp or final_sharp)
        if args.baseline_sharp is not None:
            # like-for-like: both trajectory errors gauge-aligned (the
            # un-aligned init error is strictly larger, which would bias
            # the gate toward PASS)
            ok = (best_sharp >= args.baseline_sharp + 3.0
                  and tr_err_al <= init_err_al)
            print(f"criteria: gauge-fair sharp {best_sharp:.2f} vs "
                  f"baseline+3 = {args.baseline_sharp + 3.0:.2f}; "
                  f"gauge-aligned traj_err {tr_err_al:.4f} vs aligned init "
                  f"{init_err_al:.4f}")
        else:
            ok = best_sharp > 24.0
    print("VALIDATION", "PASSED" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

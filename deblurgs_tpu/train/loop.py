"""Host training loop — reference ``train.py:35-233`` re-architected.

The device does one jitted step; the host handles everything the reference
does between steps *without* leaving Python control flow inside the step:

- phase switching: sharp warm-up (n_sub=1, curve frozen) → blur synthesis
  (all sub-frames) at ``curve_start_iter`` — a different static sub-frame
  count, so a second compiled variant;
- SH degree bump every 1000 iterations (reference ``train.py:121-123``) —
  compiled variant per degree;
- ``random_sample_until`` jitter cutoff — static flag flip;
- **capacity management** (the static-shape answer to the reference's
  dynamic tensor growth): when densification reports dropped insertions,
  the host doubles the Gaussian capacity, pads every [P, ...] leaf and
  re-jits; when the pair count approaches ``max_pairs``, the pair capacity
  bucket doubles likewise;
- saving cadence (PLY snapshots, cm motion file, full checkpoints),
  metrics logging with EMA postfix, ``time.txt``.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deblurgs_tpu.data.gaussian_ply import save_gaussian_ply
from deblurgs_tpu.data.scene import Scene
from deblurgs_tpu.models import gaussians as gm
from deblurgs_tpu.models import motion as motion_lib
from deblurgs_tpu.ops.rasterize import RasterizeConfig
from deblurgs_tpu.train import checkpoint as ckpt_lib
from deblurgs_tpu.train import step as step_lib
from deblurgs_tpu.train.config import OptimizationConfig


class EmaLogger:
    """EMA-smoothed metric printer (reference ``utils/logger.py``)."""

    def __init__(self, ema_weight: float = 0.6, print_fn=print):
        self.ema_weight = ema_weight
        self.values: dict = {}
        self.print_fn = print_fn

    def update(self, metrics: dict):
        for k, v in metrics.items():
            v = float(v) if not isinstance(v, (int,)) else v
            if k in self.values:
                w = self.ema_weight
                self.values[k] = w * self.values[k] + (1 - w) * v
            else:
                self.values[k] = v

    def show(self, step: int):
        parts = [f"it {step}"]
        for k, v in self.values.items():
            parts.append(f"{k}={v:.5g}")
        self.print_fn("  ".join(parts))


def grow_capacity(state: step_lib.TrainState, new_capacity: int
                  ) -> step_lib.TrainState:
    """Pad every per-Gaussian leaf (params, aux, Adam moments) to a larger
    static capacity. New slots are inactive with identity rotation."""
    old = state.params.xyz.shape[0]
    assert new_capacity > old

    def pad(x, fill=0.0):
        extra = jnp.full((new_capacity - old,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, extra], axis=0)

    params = gm.GaussianParams(*[pad(leaf) for leaf in state.params])
    params = params._replace(rotation=params.rotation.at[old:, 0].set(1.0))
    aux = gm.GaussianAux(
        active=pad(state.aux.active, False),
        max_radii2d=pad(state.aux.max_radii2d),
        xyz_grad_accum=pad(state.aux.xyz_grad_accum),
        denom=pad(state.aux.denom),
    )
    adam = state.adam_g._replace(
        mu=gm.GaussianParams(*[pad(leaf) for leaf in state.adam_g.mu]),
        nu=gm.GaussianParams(*[pad(leaf) for leaf in state.adam_g.nu]),
    )
    return state._replace(params=params, aux=aux, adam_g=adam)


@dataclasses.dataclass
class Trainer:
    """Owns the compiled-step cache and runs the full DeblurGS schedule."""

    scene: Scene
    gcfg: gm.GaussianConfig
    mcfg: motion_lib.MotionConfig
    ocfg: OptimizationConfig
    rcfg: RasterizeConfig
    tone_mapping: str = "gamma"
    model_path: Optional[str] = None
    save_iterations: tuple = (50_000, 100_000, 150_000)
    checkpoint_iterations: tuple = ()
    render_iterations: tuple = ()
    visualize: bool = False
    vis_cam_idx: Optional[int] = None  # overview focus camera (reference
                                       # --vis_cam_idx; None = zoom-out search)
    log_every: int = 10
    sync_every: int = 10   # host-sync cadence (each sync is a device round trip)
    on_metrics: Optional[Callable] = None
    debug: bool = False    # NaN guard: dump full state + step inputs on a
                           # non-finite loss and abort (analog of the
                           # reference debug snapshot_fw/bw.dump facility,
                           # diff_gaussian_rasterization/__init__.py:92-99)
    batched_render: bool = False  # all sub-frames in ONE rasterizer launch
                           # (render_batch; pallas mixed layout)
    cams_per_step: int = 1 # B training cameras per step (train/step.py —
                           # every batched camera's curve takes a fresh Adam
                           # step each iteration; B·n_sub views per launch)

    def __post_init__(self):
        if self.batched_render and not (self.rcfg.backend == "pallas"
                                        and self.rcfg.layout == "mixed"):
            # batched rendering stacks all views on the mixed kernel's tile
            # axis; the xla/oracle backends (and the lockstep layout) have
            # no batched path — fall back to per-view launches rather than
            # erroring on the (TPU-tuned) default configuration
            print(f"[render] backend={self.rcfg.backend!r} "
                  f"layout={self.rcfg.layout!r} has no batched path — "
                  "falling back to per-view rendering")
            self.batched_render = False
        self._step_cache: dict = {}
        self.logger = EmaLogger()
        if jax.process_count() > 1:
            # camera-sharded global stack — each host contributed only its
            # host_local_camera_split rows (parallel/multihost.py)
            from deblurgs_tpu.parallel import multihost

            self._gts = multihost.assemble_global_images(
                np.asarray(self.scene.train_images))
        else:
            self._gts = jnp.asarray(self.scene.train_images)
        self._proj = jnp.asarray(self.scene.proj)
        self.training_time_sec = 0.0
        self._visualizer = None
        self._pending: list = []

    def _get_visualizer(self):
        if self._visualizer is None:
            from deblurgs_tpu.utils.visualizer import Visualizer

            self._visualizer = Visualizer(
                self.scene, self.gcfg, self.mcfg, self.rcfg,
                self.model_path, self.ocfg.iterations,
                vis_cam_idx=self.vis_cam_idx)
        return self._visualizer

    # -- compiled-step cache keyed by the static configuration ------------
    def _get_step(self, sh_degree: int, n_sub: int, random_sample: bool,
                  capacity: int, rcfg: RasterizeConfig, mesh=None):
        key = (sh_degree, n_sub, random_sample, capacity, rcfg, mesh)
        if key not in self._step_cache:
            st = step_lib.TrainStatics(
                gcfg=self.gcfg, mcfg=self.mcfg, ocfg=self.ocfg, rcfg=rcfg,
                cs=self.scene.camera_static, sh_degree=sh_degree,
                n_sub=n_sub, tone_mapping=self.tone_mapping,
                spatial_lr_scale=float(self.scene.cameras_extent),
                random_sample=random_sample,
                white_background=getattr(self.scene, "white_background",
                                         False),
                mesh=mesh,
                batched_render=self.batched_render,
                cams_per_step=self.cams_per_step,
            )
            self._step_cache[key] = step_lib.make_train_step(st)
        return self._step_cache[key]

    def init_state(self, key=None, load_path: str | None = None,
                   load_motion_path: str | None = None,
                   start_checkpoint: str | None = None,
                   capacity: int | None = None) -> tuple[step_lib.TrainState, int]:
        key = key if key is not None else jax.random.PRNGKey(0)
        pcd = self.scene.info.point_cloud
        n0 = pcd.points.shape[0]
        capacity = capacity or max(1 << int(np.ceil(np.log2(max(n0 * 2, 1024)))),
                                   1024)
        if load_path:
            from deblurgs_tpu.data.gaussian_ply import load_gaussian_ply

            it = Scene.search_max_iteration(os.path.join(load_path, "point_cloud"))
            params, aux = load_gaussian_ply(
                os.path.join(load_path, "point_cloud", f"iteration_{it}",
                             "point_cloud.ply"), self.gcfg, capacity)
        else:
            params, aux = gm.create_from_pcd(
                jnp.asarray(pcd.points), jnp.asarray(pcd.colors),
                self.gcfg, capacity)

        if load_motion_path:
            motion = ckpt_lib.load_motion(load_motion_path)
        else:
            motion = motion_lib.init_motion(
                jnp.asarray(self.scene.rotations, jnp.float32),
                jnp.asarray(self.scene.centers, jnp.float32),
                self.mcfg, jax.random.fold_in(key, 1))

        state = step_lib.init_state(params, motion, aux,
                                    jax.random.fold_in(key, 2))
        first_iter = 1
        if start_checkpoint:
            state = ckpt_lib.load_checkpoint(start_checkpoint, state)
            first_iter = int(state.step)
        return state, first_iter

    def phase_statics(self, iteration: int):
        """(sh_degree, n_sub, random_sample) for this iteration."""
        sh_degree = min(iteration // 1000, self.gcfg.sh_degree)
        n_sub = (self.mcfg.n_subframes
                 if iteration >= self.ocfg.curve_start_iter else 1)
        random_sample = (self.mcfg.curve_random_sample
                         and iteration < self.ocfg.random_sample_until)
        return sh_degree, n_sub, random_sample

    def autosize_max_pairs(self, state: step_lib.TrainState) -> int:
        """Two-pass pair-capacity sizing (``max_pairs == 0``; same scheme as
        ``bench.py``): render every training camera's nominal pose once on a
        cheap XLA probe config, take the worst per-view pair count, and
        budget the whole launch — n_sub sub-frames (batched) × cams_per_step
        views — plus headroom for densification/curve spread. The reactive
        doubling in the train loop stays on as the fallback when growth
        outruns the estimate."""
        from deblurgs_tpu.core.camera import c2w_to_view, make_camera_arrays
        from deblurgs_tpu.ops.rasterize import render

        probe_cfg = dataclasses.replace(
            self.rcfg, backend="xla", max_pairs=1 << 22, k_max=8,
            need_n_contrib=False, interpret=False, fast=False)

        @jax.jit
        def probe(params, active, rot, center):
            rin = gm.render_inputs(params, self.gcfg)
            cam = make_camera_arrays(c2w_to_view(rot, center), self._proj)
            out = render(rin["means3d"], rin["scales"], rin["rotations"],
                         rin["opacities"], rin["shs"], cam,
                         self.scene.camera_static, jnp.zeros(3),
                         cfg=probe_cfg, sh_degree=self.gcfg.sh_degree,
                         active=active)
            return out.num_pairs

        rots = jnp.asarray(self.scene.rotations, jnp.float32)
        centers = jnp.asarray(self.scene.centers, jnp.float32)
        per_view = max(
            int(probe(state.params, state.aux.active, rots[i], centers[i]))
            for i in range(rots.shape[0]))
        n_views = ((self.mcfg.n_subframes if self.batched_render else 1)
                   * self.cams_per_step)
        budget = int(per_view * n_views * 1.5)
        max_pairs = 1 << max(16, int(np.ceil(np.log2(max(budget, 1)))))
        print(f"[pairs] auto-sized max_pairs = {max_pairs} "
              f"(probe worst {per_view} pairs/view × {n_views} views "
              f"× 1.5 headroom)")
        return max_pairs

    def train(self, state: step_lib.TrainState, first_iter: int = 1,
              iterations: int | None = None, mesh=None) -> step_lib.TrainState:
        iterations = iterations or self.ocfg.iterations
        if self.rcfg.max_pairs <= 0:
            self.rcfg = dataclasses.replace(
                self.rcfg, max_pairs=self.autosize_max_pairs(state))
        rcfg = self.rcfg
        for iteration in range(first_iter, iterations + 1):
            t0 = time.time()
            sh_degree, n_sub, random_sample = self.phase_statics(iteration)
            capacity = state.params.xyz.shape[0]
            fn = self._get_step(sh_degree, n_sub, random_sample,
                                capacity, rcfg, mesh)

            if self.cams_per_step == 1:
                cam_idx = self.scene.get_random_cam_idx()
                sel = jnp.int32(cam_idx)
            else:
                # B draws from the epoch-shuffled viewpoint stack (the
                # reference pops one per iteration, train.py:118-124)
                cam_idx = [self.scene.get_random_cam_idx()
                           for _ in range(self.cams_per_step)]
                sel = jnp.asarray(cam_idx, jnp.int32)
            if jax.process_count() > 1:
                from deblurgs_tpu.parallel import multihost

                if self.cams_per_step == 1:
                    gt = multihost.select_camera(self._gts, sel)
                else:
                    gt = jnp.stack([
                        multihost.select_camera(self._gts, jnp.int32(c))
                        for c in cam_idx])
            else:
                gt = self._gts[sel]
            state, metrics = fn(state, gt, sel, self._proj)

            # Host syncs are expensive (a full device round trip each);
            # metrics stay on device and are drained in batches.
            self._pending.append((iteration, cam_idx, metrics))
            self.training_time_sec += time.time() - t0
            if (iteration % self.sync_every == 0
                    or iteration in self.save_iterations
                    or iteration == iterations):
                for it_p, cam_p, m in self._pending:
                    # ---- NaN guard (debug mode): dump a post-mortem
                    # snapshot of the full train state + the offending
                    # step's inputs, then abort. Note the state has already
                    # advanced up to ``sync_every-1`` steps past the bad
                    # one — the snapshot is for forensics, not resume.
                    if self.debug and not np.isfinite(float(m.loss)):
                        snap = os.path.join(self.model_path or ".",
                                            f"snapshot_nan_it{it_p}.npz")
                        ckpt_lib.save_checkpoint(snap, state)
                        with open(snap + ".txt", "w") as fp:
                            print(f"non-finite loss at iteration {it_p}\n"
                                  f"cam_idx={cam_p}\n"
                                  f"metrics={m}", file=fp)
                        raise FloatingPointError(
                            f"non-finite loss {float(m.loss)} at iteration "
                            f"{it_p} (cam {cam_p}) — state dumped to {snap}")
                    # ---- capacity management (host-side re-jit triggers).
                    # Pre-grow when the active count nears capacity so the
                    # next densify event has headroom — insertions dropped
                    # for lack of slots are lost, not retried (the reactive
                    # n_dropped path below still catches a burst that
                    # outruns the heuristic within one drain window).
                    cap_now = state.params.xyz.shape[0]
                    grew = False
                    # pre-grow only while densification can still insert —
                    # a post-densify run sitting at high occupancy would
                    # otherwise pay a wasted doubling + re-jit
                    if (it_p < self.ocfg.densify_until_iter
                            and int(m.num_active) > 0.9 * cap_now):
                        print(f"[capacity] → {cap_now * 2} (pre-grow: "
                              f"{int(m.num_active)} active > 90% of "
                              f"{cap_now})")
                        state = grow_capacity(state, cap_now * 2)
                        grew = True
                    # the reactive path recovers a burst that outran the
                    # heuristic — but not twice for the same drained entry
                    # (a near-full + dropped-insertions entry would
                    # quadruple capacity in one drain)
                    if int(m.densify.n_dropped) > 0 and not grew:
                        new_cap = state.params.xyz.shape[0] * 2
                        print(f"[capacity] → {new_cap} "
                              f"(dropped {int(m.densify.n_dropped)})")
                        state = grow_capacity(state, new_cap)
                    if bool(m.overflowed):
                        print(f"[pairs] OVERFLOW at iter {it_p}: "
                              f"{int(m.num_pairs)} pairs > capacity "
                              f"{rcfg.max_pairs} — step trained on a "
                              f"truncated pair list "
                              f"(total {int(m.overflow_count)} such steps)")
                    if int(m.num_pairs) > 0.85 * rcfg.max_pairs:
                        rcfg = dataclasses.replace(
                            rcfg, max_pairs=rcfg.max_pairs * 2)
                        print(f"[pairs] max_pairs → {rcfg.max_pairs}")
                    if (rcfg.backend == "xla"
                            and int(m.max_per_tile) > rcfg.k_max):
                        rcfg = dataclasses.replace(rcfg, k_max=rcfg.k_max * 2)
                        print(f"[pairs] k_max → {rcfg.k_max}")
                    self.logger.update({
                        "l1": m.l1, "smooth": m.t_smooth,
                        "hinge": m.hinge, "psnr": m.psnr,
                        "#pts": int(m.num_active),
                    })
                    if self.on_metrics is not None:
                        self.on_metrics(it_p, m)
                self._pending.clear()
            if iteration % self.log_every == 0 and self.logger.values:
                self.logger.show(iteration)

            if self.model_path and iteration in self.save_iterations:
                self.save_snapshot(state, iteration)
            if self.model_path and iteration in self.checkpoint_iterations:
                ckpt_lib.save_checkpoint(
                    os.path.join(self.model_path, f"chkpnt{iteration}.npz"),
                    state)
            if self.visualize and self.model_path:
                self._get_visualizer().run(iteration, state)
            if self.model_path and iteration in self.render_iterations:
                self._get_visualizer().traj_render(
                    iteration, state, cam_idx=self.vis_cam_idx or 0)
                self._get_visualizer().visualize_alignment(iteration, state)

        if self.visualize and self._visualizer is not None:
            self._visualizer.save_video()
        n_overflow = int(state.overflow_count)
        if n_overflow:
            print(f"[pairs] WARNING: {n_overflow} iterations trained on a "
                  "truncated pair list (capacity overflow)")
        if self.model_path:
            with open(os.path.join(self.model_path, "time.txt"), "w") as fp:
                print(f"Training Time = {self.training_time_sec:7.5f}sec",
                      file=fp)
                print(f"Overflowed iterations = {n_overflow}", file=fp)
        return state

    def save_snapshot(self, state: step_lib.TrainState, iteration: int):
        pc_dir = self.scene.point_cloud_dir(iteration)
        save_gaussian_ply(os.path.join(pc_dir, "point_cloud.ply"),
                          state.params, state.aux, self.gcfg)
        ckpt_lib.save_motion(os.path.join(self.model_path, "cm.npz"),
                             state.motion)

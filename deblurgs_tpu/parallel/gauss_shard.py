"""Gaussian-axis sharding for 1M+-splat scenes (BASELINE config 5).

Design (SURVEY.md §5 long-axis plan): the per-Gaussian preprocess chain —
activations, covariance build, projection, EWA conic, SH→color — is
elementwise over the splat axis, so at 1M+ splats it shards cleanly over a
``gs`` mesh axis. The pair expansion + global sort + tile blend consume the
culled survivors of EVERY shard, so exactly one all-gather of the compact
preprocessed per-Gaussian fields happens at the binning boundary (the TPU
analog of "all-gather culled survivors into the shared sort"). Parameters,
Adam moments and densification accumulators stay sharded over the same
axis — per-slot state updates are elementwise too, so the optimizer and
stats run fully distributed; only the rasterizer's sort/blend see gathered
data, and the backward's per-Gaussian ``segment_sum`` reductions
reduce-scatter straight back onto the shard.

Implementation is GSPMD-first (the scaling-book recipe): no shard_map, no
hand-written collectives. State leaves are *placed* with a NamedSharding
over ``gs`` and the standard jitted train step runs on them unchanged;
``with_sharding_constraint`` pins the per-Gaussian chain to the shard axis
so the compiler cannot hoist the all-gather above the preprocess. The
sub-frame shard_map path (``parallel/shard.py``) composes orthogonally on
a 2-D (sf, gs) mesh when both axes are needed.

Reference counterpart: none — the CUDA implementation is strictly
single-GPU (SURVEY.md §2.3); this is the scale-out the serial design
forgoes.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deblurgs_tpu.train import step as step_lib

GAUSS_AXIS = "gs"


def make_gauss_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the Gaussian axis (CPU-pool fallback like make_mesh)."""
    from deblurgs_tpu.parallel.shard import make_mesh

    return make_mesh(n_devices, axis=GAUSS_AXIS)


def _gauss_spec(mesh: Mesh, leaf) -> NamedSharding:
    """[P, ...] leaves shard on axis 0; scalars/small leaves replicate."""
    if getattr(leaf, "ndim", 0) >= 1:
        return NamedSharding(mesh, P(GAUSS_AXIS))
    return NamedSharding(mesh, P())


def shard_gauss_state(state: step_lib.TrainState, mesh: Mesh
                      ) -> step_lib.TrainState:
    """Place the per-Gaussian leaves of a TrainState over the ``gs`` axis.

    ``params``, ``aux`` and the Gaussian Adam moments shard on their leading
    capacity axis (which must divide the mesh size — capacities are
    power-of-two by construction, ``train/loop.py``); motion/curve state,
    the motion Adam state and scalars replicate. jit follows these input
    placements, so the standard train step needs no signature change.
    """
    n = mesh.size

    def place_gauss(leaf):
        assert leaf.shape[0] % n == 0, (
            f"capacity {leaf.shape[0]} must divide the {n}-device gs mesh")
        return jax.device_put(leaf, _gauss_spec(mesh, leaf))

    def place_repl(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    adam_g = state.adam_g._replace(
        mu=jax.tree.map(place_gauss, state.adam_g.mu),
        nu=jax.tree.map(place_gauss, state.adam_g.nu),
        step=jax.tree.map(place_repl, state.adam_g.step),
    )
    return state._replace(
        params=jax.tree.map(place_gauss, state.params),
        aux=jax.tree.map(place_gauss, state.aux),
        adam_g=adam_g,
        motion=jax.tree.map(place_repl, state.motion),
        adam_m=jax.tree.map(place_repl, state.adam_m),
        step=place_repl(state.step),
        rng=place_repl(state.rng),
        overflow_count=place_repl(state.overflow_count),
    )


def make_gauss_train_step(st: step_lib.TrainStatics, mesh: Mesh):
    """Jitted train step with the Gaussian axis pinned to the ``gs`` mesh.

    Wraps the standard :func:`step.train_step`: per-Gaussian state is
    constrained to the shard on entry and the updated state re-constrained
    on exit, so the preprocess/optimizer/densify-stat chain stays
    distributed across steps and the all-gather happens only where the
    sort actually needs global data (GSPMD decides the exact cut).
    """
    assert st.mesh is None, (
        "gauss sharding composes with the sub-frame mesh via a 2-D mesh, "
        "not by nesting the shard_map path")

    def constrain_state(state):
        cg = functools.partial(jax.tree.map, lambda l: (
            jax.lax.with_sharding_constraint(l, _gauss_spec(mesh, l))))
        adam_g = state.adam_g._replace(mu=cg(state.adam_g.mu),
                                       nu=cg(state.adam_g.nu))
        return state._replace(params=cg(state.params), aux=cg(state.aux),
                              adam_g=adam_g)

    def fn(state, gt, idx, proj):
        state = constrain_state(state)
        new_state, metrics = step_lib.train_step(state, gt, idx, proj, st)
        return constrain_state(new_state), metrics

    return jax.jit(fn)


def gauss_sharded_render(render_fn, mesh: Mesh):
    """Wrap a ``render(means, scales, rots, opac, shs, *rest, **kw)``-shaped
    callable so its per-Gaussian inputs are pinned to the ``gs`` shard
    (forward-only path: eval/export of a sharded scene)."""

    def wrapped(means3d, scales, rotations, opacities, shs, *rest, **kw):
        c = lambda x: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(GAUSS_AXIS)))
        active = kw.get("active")
        if active is not None:
            kw = dict(kw, active=c(active))
        return render_fn(c(means3d), c(scales), c(rotations), c(opacities),
                         c(shs), *rest, **kw)

    return wrapped

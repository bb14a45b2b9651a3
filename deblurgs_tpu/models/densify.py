"""Densification: clone / split / prune under static capacity (jit-safe).

Reference counterpart: ``scene/gaussian_model.py:404-458`` — grad-norm driven
clone (small Gaussians) and split (large ones, N=2 samples from the Gaussian
itself, scale/1.6), low-opacity prune, with Adam-moment surgery
(``_prune_optimizer`` / ``cat_tensors_to_optimizer``).

Static-capacity translation:
- "append a row"  → scatter into the lowest free slot (``active == False``),
  zeroing that slot's Adam moments (the reference cats zero moments);
- "prune a row"   → clear ``active`` (slot becomes reusable);
- split reuses the original's slot for child 1 (the original is pruned) and
  a free slot for child 2.
Capacity exhaustion drops the lowest-priority insertions and reports the
dropped count so the host can grow capacity + re-jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from deblurgs_tpu.core import transforms as tf
from deblurgs_tpu.models import gaussians as gm
from deblurgs_tpu.train import optim


class DensifyReport(NamedTuple):
    n_cloned: jax.Array
    n_split: jax.Array
    n_pruned: jax.Array
    n_dropped: jax.Array  # insertions lost to capacity exhaustion


def update_stats(
    aux: gm.GaussianAux,
    vsp_grad: jax.Array,   # [P, 2] NDC viewspace gradient of this sub-frame
    radii: jax.Array,      # [P] int32
    denom_count: float,
) -> gm.GaussianAux:
    """Accumulate densification stats for one rendered sub-frame.

    Reference ``add_densification_stats`` (``gaussian_model.py:456-458``) +
    the ``max_radii2D`` update in the train loop (``train.py:190-193``);
    ``denom_count = 1/f`` per sub-frame (``train.py:194``).
    """
    vis = radii > 0
    norm = jnp.linalg.norm(vsp_grad[:, :2], axis=-1)
    return aux._replace(
        xyz_grad_accum=aux.xyz_grad_accum + jnp.where(vis, norm, 0.0),
        denom=aux.denom + jnp.where(vis, denom_count, 0.0),
        max_radii2d=jnp.where(
            vis, jnp.maximum(aux.max_radii2d, radii.astype(jnp.float32)),
            aux.max_radii2d,
        ),
    )


def _free_slot_table(active: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Indices of free slots in ascending order, and the free count."""
    order = jnp.argsort(active, stable=True)  # False (free) slots first
    return order.astype(jnp.int32), jnp.sum(~active)


def densify_and_prune(
    params: gm.GaussianParams,
    aux: gm.GaussianAux,
    adam: optim.AdamState,
    key: jax.Array,
    *,
    cfg: gm.GaussianConfig,
    grad_threshold,
    scene_extent: float,
    percent_dense: float = 0.01,
) -> tuple[gm.GaussianParams, gm.GaussianAux, optim.AdamState, DensifyReport]:
    """One densification event (reference ``densify_and_prune``,
    ``gaussian_model.py:444-454``). Returns new (params, aux, adam, report);
    stats accumulators are reset (reference ``densification_postfix``)."""
    capacity = params.xyz.shape[0]
    active = aux.active
    grads = jnp.where(aux.denom > 0, aux.xyz_grad_accum / aux.denom, 0.0)

    scaling = gm.get_scaling(params, cfg)
    max_scale = jnp.max(scaling, axis=-1)
    hot = active & (grads >= grad_threshold)
    clone_mask = hot & (max_scale <= percent_dense * scene_extent)
    split_mask = hot & (max_scale > percent_dense * scene_extent)

    # ---- allocate free slots: clones first, then split child-2 (matches
    # reference append order: clone postfix runs before split postfix)
    needs = clone_mask | split_mask
    free_slots, n_free = _free_slot_table(active)
    # rank clones before splits to give clones priority under exhaustion
    order_key = jnp.where(clone_mask, 0, jnp.where(split_mask, 1, 2))
    # stable rank of each needing slot in (clones..., splits...) order
    rank_all = jnp.cumsum(clone_mask) - 1                       # among clones
    n_clone_total = jnp.sum(clone_mask)
    rank_split = n_clone_total + jnp.cumsum(split_mask) - 1     # after clones
    rank = jnp.where(clone_mask, rank_all, rank_split)
    ok = needs & (rank < n_free)
    dest = jnp.where(ok, free_slots[jnp.clip(rank, 0, capacity - 1)], capacity)
    dropped = jnp.sum(needs & ~ok)
    del order_key

    # ---- split sampling (reference densify_and_split :404-427)
    k1, k2 = jax.random.split(key)
    std = scaling  # [P, 3]
    s1 = jax.random.normal(k1, std.shape) * std
    s2 = jax.random.normal(k2, std.shape) * std
    R = tf.quat_to_rotmat(params.rotation)  # normalized, like build_rotation
    xyz_child1 = jnp.einsum("pij,pj->pi", R, s1) + params.xyz
    xyz_child2 = jnp.einsum("pij,pj->pi", R, s2) + params.xyz
    split_scaling = gm.inverse_scaling(scaling / (0.8 * 2), cfg)
    if cfg.use_isotropic:
        # raw scaling stores the value in channel 0
        split_scaling_raw = params.scaling.at[:, :1].set(split_scaling[:, :1])
    else:
        split_scaling_raw = split_scaling

    # ---- new-slot values: clones copy raw params; split child-2 gets
    # sampled xyz + shrunk scaling
    def new_slot_value(leaf, split_leaf):
        src = jnp.where(split_mask.reshape((-1,) + (1,) * (leaf.ndim - 1)),
                        split_leaf, leaf)
        return src

    new_vals = gm.GaussianParams(
        xyz=new_slot_value(params.xyz, xyz_child2),
        f_dc=new_slot_value(params.f_dc, params.f_dc),
        f_rest=new_slot_value(params.f_rest, params.f_rest),
        scaling=new_slot_value(params.scaling, split_scaling_raw),
        rotation=new_slot_value(params.rotation, params.rotation),
        opacity=new_slot_value(params.opacity, params.opacity),
    )

    # scatter new slots (mode='drop' discards dest == capacity)
    params = gm.GaussianParams(*[
        leaf.at[dest].set(val, mode="drop")
        for leaf, val in zip(params, new_vals)
    ])
    active = active.at[dest].set(True, mode="drop")

    # ---- split child-1 overwrites the original slot (original is pruned
    # in the reference; net effect = replace in place + zero moments)
    did_split = split_mask & ok  # only if child-2 landed; else keep original
    sm = did_split.reshape((-1,) + (1,) * (params.xyz.ndim - 1))
    params = params._replace(
        xyz=jnp.where(sm, xyz_child1, params.xyz),
        scaling=jnp.where(
            did_split[:, None], split_scaling_raw, params.scaling
        ),
    )

    # ---- Adam moment surgery: zero recycled slots (dest) + split originals
    touched = jnp.zeros(capacity, bool).at[dest].set(True, mode="drop")
    touched = touched | did_split
    adam = optim.zero_moment_rows(
        adam, gm.GaussianParams(*([touched] * 6))
    )

    # ---- opacity prune (reference: min_op = lb + (1-lb)*0.005)
    min_op = cfg.alpha_lower_bound + (1 - cfg.alpha_lower_bound) * 0.005
    opac = gm.get_opacity(params, cfg)[:, 0]
    prune = active & (opac < min_op)
    active = active & ~prune

    aux = gm.GaussianAux(
        active=active,
        max_radii2d=jnp.zeros(capacity, jnp.float32),
        xyz_grad_accum=jnp.zeros(capacity, jnp.float32),
        denom=jnp.zeros(capacity, jnp.float32),
    )
    report = DensifyReport(
        n_cloned=jnp.sum(clone_mask & ok),
        n_split=jnp.sum(did_split),
        n_pruned=jnp.sum(prune),
        n_dropped=dropped,
    )
    return params, aux, adam, report


def reset_opacity(
    params: gm.GaussianParams,
    adam: optim.AdamState,
    cfg: gm.GaussianConfig,
) -> tuple[gm.GaussianParams, optim.AdamState]:
    """Opacity reset + moment zeroing (reference ``reset_opacity`` +
    ``replace_tensor_to_optimizer``, ``gaussian_model.py:247-253,301-314``)."""
    params = gm.reset_opacity(params, cfg)
    capacity = params.opacity.shape[0]
    on = jnp.ones(capacity, bool)
    off = jnp.zeros(capacity, bool)
    adam = optim.zero_moment_rows(
        adam,
        gm.GaussianParams(xyz=off, f_dc=off, f_rest=off,
                          scaling=off, rotation=off, opacity=on),
    )
    return params, adam

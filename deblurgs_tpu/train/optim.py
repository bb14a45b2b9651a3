"""Hand-rolled Adam with per-leaf learning rates, masks and slot surgery.

Why not optax: the reference's densification performs per-row optimizer-state
surgery (prune/cat of ``exp_avg``/``exp_avg_sq``, reference
``gaussian_model.py:301-382``) and per-group scheduled LRs inside one Adam
instance (``training_setup`` + ``update_learning_rate``). With static
capacity, surgery = zeroing moment rows at recycled slots and masking
updates — easiest with a transparent 30-line Adam matching torch semantics
(bias correction by per-leaf step count, ``eps=1e-15`` as the reference).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

Pytree = Any


class AdamState(NamedTuple):
    mu: Pytree     # first moments, like params
    nu: Pytree     # second moments, like params
    step: Pytree   # per-leaf int32 step counts


def init(params: Pytree) -> AdamState:
    z = jax.tree.map(jnp.zeros_like, params)
    steps = jax.tree.map(lambda _: jnp.zeros((), jnp.int32), params)
    return AdamState(mu=z, nu=jax.tree.map(jnp.zeros_like, params), step=steps)


def update(
    params: Pytree,
    grads: Pytree,
    state: AdamState,
    lr: Pytree,
    *,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
    update_mask: Pytree | None = None,
    leaf_gate: Pytree | None = None,
) -> tuple[Pytree, AdamState]:
    """One Adam step (torch.optim.Adam semantics).

    Args:
      lr: pytree of scalar learning rates, one per leaf of ``params``.
      update_mask: optional pytree of per-leaf masks. A leaf mask may be
        ``None`` (update all), a scalar bool (freeze/unfreeze whole leaf —
        frozen leaves also skip moment/step updates, matching torch
        ``requires_grad=False``), or a [P]-bool row mask (inactive capacity
        slots keep params *and* moments untouched).
      leaf_gate: optional pytree of scalar bools ANDed into the per-leaf
        gate *in addition to* a row-mask ``update_mask`` — used for the
        reference's "fresh tensors have no grads" semantics: on densify /
        opacity-reset iterations the surgered tensors skip the whole Adam
        step, moments and step count included (torch skips ``grad is
        None`` params; reference ``train.py:195-210``).
    """
    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_mu = treedef.flatten_up_to(state.mu)
    flat_nu = treedef.flatten_up_to(state.nu)
    flat_st = treedef.flatten_up_to(state.step)
    flat_lr = treedef.flatten_up_to(lr)
    flat_mask = (
        treedef.flatten_up_to(update_mask) if update_mask is not None
        else [None] * len(flat_p)
    )
    flat_gate = (
        treedef.flatten_up_to(leaf_gate) if leaf_gate is not None
        else [None] * len(flat_p)
    )

    new_p, new_mu, new_nu, new_st = [], [], [], []
    for p, g, mu, nu, st, lr_i, m, gate in zip(
        flat_p, flat_g, flat_mu, flat_nu, flat_st, flat_lr, flat_mask,
        flat_gate
    ):
        row_mask = None
        leaf_on = jnp.asarray(True)
        if m is not None:
            m = jnp.asarray(m)
            if m.ndim == 0:
                leaf_on = m
            else:
                row_mask = m.reshape(m.shape + (1,) * (p.ndim - m.ndim))
        if gate is not None:
            leaf_on = leaf_on & jnp.asarray(gate)

        st2 = st + leaf_on.astype(jnp.int32)
        t = jnp.maximum(st2, 1).astype(jnp.float32)
        mu2 = b1 * mu + (1 - b1) * g
        nu2 = b2 * nu + (1 - b2) * (g * g)
        mu_hat = mu2 / (1 - b1**t)
        nu_hat = nu2 / (1 - b2**t)
        upd = jnp.asarray(lr_i, p.dtype) * mu_hat / (jnp.sqrt(nu_hat) + eps)

        if row_mask is not None:
            mu2 = jnp.where(row_mask, mu2, mu)
            nu2 = jnp.where(row_mask, nu2, nu)
            upd = jnp.where(row_mask, upd, 0.0)
        mu2 = jnp.where(leaf_on, mu2, mu)
        nu2 = jnp.where(leaf_on, nu2, nu)
        upd = jnp.where(leaf_on, upd, 0.0)

        new_p.append(p - upd)
        new_mu.append(mu2)
        new_nu.append(nu2)
        new_st.append(st2)

    unflatten = treedef.unflatten
    return unflatten(new_p), AdamState(
        mu=unflatten(new_mu), nu=unflatten(new_nu), step=unflatten(new_st)
    )


def zero_moment_rows(state: AdamState, params_like_mask: Pytree) -> AdamState:
    """Zero mu/nu rows where mask is True (densification slot surgery).

    ``params_like_mask``: pytree of [P]-bool masks aligned with the leading
    axis of each param leaf (or None to leave a leaf untouched).
    """

    def z(moment, mask):
        m = mask.reshape(mask.shape + (1,) * (moment.ndim - mask.ndim))
        return jnp.where(m, 0.0, moment)

    return state._replace(
        mu=jax.tree.map(z, state.mu, params_like_mask),
        nu=jax.tree.map(z, state.nu, params_like_mask),
    )

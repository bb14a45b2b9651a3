"""Gaussian snapshot PLY import/export — 3DGS-viewer-compatible convention.

Reference ``GaussianModel.save_ply`` / ``load_ply``
(``scene/gaussian_model.py:226-299``): although the fork trains with
clamp-opacity and exp-lower-bound scaling, snapshots re-encode to the
*standard* 3DGS convention on disk — ``opacity = inverse_sigmoid(activated)``
and ``scale = log(activated)`` — so any ecosystem viewer can open them;
loading applies the inverse mapping back into the fork's parameterization.
"""

from __future__ import annotations

import os

import numpy as np

from deblurgs_tpu.data import ply as ply_io
from deblurgs_tpu.models import gaussians as gm


def save_gaussian_ply(path, params: gm.GaussianParams, aux: gm.GaussianAux,
                      cfg: gm.GaussianConfig):
    """Write active Gaussians in the standard 3DGS PLY layout."""
    import jax.numpy as jnp

    active = np.asarray(aux.active)
    xyz = np.asarray(params.xyz)[active]
    f_dc = np.asarray(params.f_dc)[active]        # [n, 1, 3]
    f_rest = np.asarray(params.f_rest)[active]    # [n, K-1, 3]
    opac = np.asarray(gm.get_opacity(params, cfg))[active]
    scale = np.asarray(gm.get_scaling(params, cfg))[active]
    rot = np.asarray(params.rotation)[active]

    eps = 1e-6
    opac_disk = np.log(np.clip(opac, eps, 1 - eps)
                       / (1 - np.clip(opac, eps, 1 - eps)))
    scale_disk = np.log(np.maximum(scale, eps))

    cols = {
        "x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
        "nx": np.zeros_like(xyz[:, 0]), "ny": np.zeros_like(xyz[:, 0]),
        "nz": np.zeros_like(xyz[:, 0]),
    }
    # channel-major flattening like the reference (transpose(1,2).flatten)
    f_dc_t = np.transpose(f_dc, (0, 2, 1)).reshape(len(xyz), -1)
    f_rest_t = np.transpose(f_rest, (0, 2, 1)).reshape(len(xyz), -1)
    for i in range(f_dc_t.shape[1]):
        cols[f"f_dc_{i}"] = f_dc_t[:, i]
    for i in range(f_rest_t.shape[1]):
        cols[f"f_rest_{i}"] = f_rest_t[:, i]
    cols["opacity"] = opac_disk[:, 0]
    for i in range(3):
        cols[f"scale_{i}"] = scale_disk[:, i]
    for i in range(4):
        cols[f"rot_{i}"] = rot[:, i]

    os.makedirs(os.path.dirname(path), exist_ok=True)
    ply_io.write_ply(path, {k: np.asarray(v, np.float32) for k, v in cols.items()})


def load_gaussian_ply(path, cfg: gm.GaussianConfig, capacity: int | None = None):
    """Read a standard 3DGS PLY into fork-parameterized (params, aux)."""
    import jax.numpy as jnp

    cols = ply_io.read_ply(path)
    n = len(cols["x"])
    capacity = capacity or n
    assert capacity >= n

    xyz = np.stack([cols["x"], cols["y"], cols["z"]], -1)
    opac_disk = cols["opacity"][:, None]
    opac = 1.0 / (1.0 + np.exp(-opac_disk))      # sigmoid → activated
    opacity_raw = np.asarray(
        gm.tf.inverse_clamp_opacity(jnp.asarray(opac)))

    f_dc = np.stack([cols[f"f_dc_{i}"] for i in range(3)], -1)[:, None, :]
    k_rest = (cfg.sh_coeffs - 1) * 3
    rest_names = sorted(
        (k for k in cols if k.startswith("f_rest_")),
        key=lambda s: int(s.split("_")[-1]))
    assert len(rest_names) == k_rest, (len(rest_names), k_rest)
    f_rest = np.stack([cols[k] for k in rest_names], -1)
    f_rest = f_rest.reshape(n, 3, cfg.sh_coeffs - 1).transpose(0, 2, 1)

    scale = np.exp(np.stack([cols[f"scale_{i}"] for i in range(3)], -1))
    scaling_raw = np.asarray(gm.inverse_scaling(jnp.asarray(scale), cfg))
    rot = np.stack([cols[f"rot_{i}"] for i in range(4)], -1)

    def pad(x, fill=0.0):
        return np.concatenate(
            [x, np.full((capacity - n,) + x.shape[1:], fill, x.dtype)], axis=0)

    params = gm.GaussianParams(
        xyz=jnp.asarray(pad(xyz.astype(np.float32))),
        f_dc=jnp.asarray(pad(f_dc.astype(np.float32))),
        f_rest=jnp.asarray(pad(f_rest.astype(np.float32))),
        scaling=jnp.asarray(pad(scaling_raw.astype(np.float32))),
        rotation=jnp.asarray(
            pad(rot.astype(np.float32)).reshape(capacity, 4)),
        opacity=jnp.asarray(pad(opacity_raw.astype(np.float32))),
    )
    params = params._replace(
        rotation=params.rotation.at[n:, 0].set(1.0))
    aux = gm.GaussianAux(
        active=jnp.arange(capacity) < n,
        max_radii2d=jnp.zeros(capacity, jnp.float32),
        xyz_grad_accum=jnp.zeros(capacity, jnp.float32),
        denom=jnp.zeros(capacity, jnp.float32),
    )
    return params, aux

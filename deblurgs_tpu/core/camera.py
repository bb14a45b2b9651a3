"""Camera math and pytrees (row-vector convention, matching the reference).

The rasterizer consumes cameras as three arrays (all differentiable so pose
gradients flow to the motion model by autodiff — the TPU-native replacement
for the CUDA fork's hand-derived dL/dview, dL/dproj in ``backward.cu``):

- ``view``      [4, 4]: transposed world-to-view matrix; ``p_view = p_hom @ view``
                 (reference ``cameras.py:56`` stores ``getWorld2View2(..).transpose``)
- ``full_proj`` [4, 4]: ``view @ proj`` (reference ``cameras.py:58``)
- ``campos``    [3]:    camera center = ``inverse(view)[3, :3]`` (reference ``:59``)

Static per-camera metadata (image size, fov tangents, near/far) lives in
:class:`CameraStatic`, which is hashable and passed as a static jit argument.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class CameraArrays(NamedTuple):
    """Traced (differentiable) per-camera tensors. Batches stack on axis 0."""

    view: jax.Array       # [..., 4, 4] transposed W2V
    full_proj: jax.Array  # [..., 4, 4] view @ proj
    campos: jax.Array     # [..., 3]


@dataclasses.dataclass(frozen=True)
class CameraStatic:
    """Hashable static camera metadata (jit static arg).

    ``clamp_tanfovx``/``clamp_tanfovy`` override the view-space clamp
    limits of the EWA Jacobian (``compute_cov2d``'s 1.3×tan(fov) guard,
    reference ``forward.cu:92-99``). A *crop* camera (row-slab sharded
    rendering, ``parallel/tile_shard.py``) keeps the FULL image's limits
    here so splats just outside the slab get bit-identical covariances to
    the uncropped render; plain cameras leave them None (= tanfov).
    """

    width: int
    height: int
    tanfovx: float
    tanfovy: float
    znear: float = 0.01
    zfar: float = 100.0
    clamp_tanfovx: float | None = None
    clamp_tanfovy: float | None = None

    @property
    def focal_x(self) -> float:
        return self.width / (2.0 * self.tanfovx)

    @property
    def focal_y(self) -> float:
        return self.height / (2.0 * self.tanfovy)

    @property
    def lim_tanfovx(self) -> float:
        return self.tanfovx if self.clamp_tanfovx is None else self.clamp_tanfovx

    @property
    def lim_tanfovy(self) -> float:
        return self.tanfovy if self.clamp_tanfovy is None else self.clamp_tanfovy


def get_projection_matrix(znear: float, zfar: float, fovx: float, fovy: float,
                          dtype=jnp.float32) -> jax.Array:
    """OpenGL-style perspective matrix, *already transposed* to row-vector form.

    Equals reference ``getProjectionMatrix(...).transpose(0,1)``
    (``graphics_utils.py:51-71`` + ``cameras.py:57``).
    """
    t = math.tan(fovy / 2) * znear
    r = math.tan(fovx / 2) * znear
    P = np.zeros((4, 4), dtype=np.float64)
    P[0, 0] = znear / r
    P[1, 1] = znear / t
    P[2, 0] = 0.0  # (right+left)/(right-left) == 0 for symmetric frustum
    P[2, 1] = 0.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = 1.0
    P[3, 2] = -(zfar * znear) / (zfar - znear)
    return jnp.asarray(P, dtype=dtype)


def world2view(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """COLMAP-style (R, t) -> transposed W2V [4, 4] (row-vector convention).

    ``R`` is the c2w rotation as stored in CameraInfo (reference reads COLMAP
    ``qvec2rotmat`` transposed, ``dataset_readers.py``), ``t`` the w2c
    translation. Equals reference ``getWorld2View2(R, t).transpose(0, 1)``.
    """
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    return np.ascontiguousarray(Rt.T).astype(np.float32)


def c2w_to_view(rot: jax.Array, trans: jax.Array) -> jax.Array:
    """Differentiable c2w (rotation [..., 3, 3], center [..., 3]) -> view [..., 4, 4].

    Mirrors ``CameraMotionModule._c2w_to_minicam`` (reference
    ``motion.py:277-279``): ``view[:3, :3] = rot`` and
    ``view[3, :3] = -trans @ rot`` in the row-vector convention.
    """
    batch = rot.shape[:-2]
    view = jnp.zeros(batch + (4, 4), dtype=rot.dtype)
    view = view.at[..., :3, :3].set(rot)
    view = view.at[..., 3, :3].set(-jnp.einsum("...i,...ij->...j", trans, rot))
    view = view.at[..., 3, 3].set(1.0)
    return view


def make_camera_arrays(view: jax.Array, proj: jax.Array) -> CameraArrays:
    """Assemble the traced camera pytree from a view matrix and (static) proj.

    campos = camera center. For a rigid view matrix in this convention the
    inverse's bottom row is ``-view[3,:3] @ view[:3,:3]^T``; computing it that
    way (not via ``jnp.linalg.inv``) keeps the op cheap and autodiff exact.
    """
    campos = -jnp.einsum("...i,...ji->...j", view[..., 3, :3], view[..., :3, :3])
    return CameraArrays(view=view, full_proj=view @ proj, campos=campos)


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))

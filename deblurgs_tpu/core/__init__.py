"""Pure-JAX math core: Lie groups, quaternions, spherical harmonics, cameras, Bézier.

These are the building blocks under everything else. All functions are pure,
jit/vmap/grad-safe, and follow the conventions of the reference implementation
(see module docstrings for file:line citations).
"""

from deblurgs_tpu.core import bezier, camera, lie, sh, transforms  # noqa: F401

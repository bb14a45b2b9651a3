"""Model layer: Gaussian scene parameters, camera-motion curves, tonemapping,
densification — all pytrees + pure functions with static capacity."""

from deblurgs_tpu.models.gaussians import (  # noqa: F401
    GaussianConfig,
    GaussianParams,
    GaussianAux,
)
from deblurgs_tpu.models.motion import MotionConfig, MotionParams  # noqa: F401

"""Loss functions (pure JAX) — reference ``utils/loss_utils.py``.

Image layout convention here is channel-last [..., H, W, C] (TPU-friendly);
SSIM accepts [H, W, C].
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    """Mean absolute error (reference ``loss_utils.py:17-18``)."""
    return jnp.mean(jnp.abs(x - y))


def l2_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.mean((x - y) ** 2)


def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11) -> jax.Array:
    """SSIM with an 11×11 σ=1.5 Gaussian window (reference ``:23-63``).

    img: [H, W, C] in [0, 1]. Depthwise 'SAME' convolution per channel.
    """
    w = jnp.asarray(_gaussian_window(window_size))
    c = img1.shape[-1]
    kernel = jnp.tile(w[:, :, None, None], (1, 1, 1, c))  # HWIO, feature_group=c

    def filt(x):
        x = x[None]  # NHWC
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        return y[0]

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(img1 * img1) - mu1_sq
    s2 = filt(img2 * img2) - mu2_sq
    s12 = filt(img1 * img2) - mu12
    C1, C2 = 0.01**2, 0.03**2
    m = ((2 * mu12 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return jnp.mean(m)


def tv_loss(x: jax.Array) -> jax.Array:
    """Total variation of [..., H, W] maps (reference ``:66-78``:
    l2 between neighbors along both spatial axes)."""
    h = l2_loss(x[..., :-1, :], x[..., 1:, :])
    v = l2_loss(x[..., :, :-1], x[..., :, 1:])
    return h + v


def batchwise_smoothness_loss(x: jax.Array) -> jax.Array:
    """L1 between consecutive sub-frames [f, ...] (reference ``:80-93``)."""
    if x.shape[0] == 1:
        return jnp.zeros(())
    return l1_loss(x[1:], x[:-1])


def hinge_l2(x: jax.Array) -> jax.Array:
    """Quadratic penalty outside [0, 1] (reference ``:96-104``)."""
    lo = jnp.where(x <= 0.0, x, 0.0)
    hi = jnp.where(x >= 1.0, x - 1.0, 0.0)
    return jnp.mean(lo**2 + hi**2)


def psnr(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """Per-image PSNR (reference ``utils/image_utils.py:17-19``)."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))

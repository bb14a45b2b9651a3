"""Tone mapping (CRF) — reference ``scene/tonemapping.py``.

``gamma``: x^(1/2.2) with bound/eps handling; ``reverse_gamma`` its inverse;
``identity``. Training compares in *linear* space: GT is inverse-tonemapped
(reference ``train.py:144``), rendering/eval tonemaps model output
(``test.py:117``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tone_map(x: jax.Array, kind: str, eps: float = 1e-8, bound: float = 0.0) -> jax.Array:
    if kind == "gamma":
        return jnp.maximum((x - bound) / (1.0 - 2.0 * bound), eps) ** (1 / 2.2)
    if kind == "reverse_gamma":
        return jnp.maximum(x, eps) ** 2.2 * (1.0 - 2.0 * bound) + bound
    if kind in ("identity", "reverse_identity"):
        return x
    raise NotImplementedError(f"unknown tone mapping {kind!r}")


def inverse_kind(kind: str) -> str:
    """Name of the inverse mapping (reference ``tonemapping.py:26-33``)."""
    if kind.startswith("reverse_"):
        return kind[len("reverse_"):]
    return "reverse_" + kind

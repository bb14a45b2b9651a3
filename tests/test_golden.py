"""Golden-semantics regression tests (SURVEY.md §4.3).

A fixed-seed scene rendered once with the oracle compositor is frozen into
``tests/golden/scene0.npz``; every backend must keep reproducing it. This
pins the reference CUDA constants (0.3 px dilation, 0.99 alpha clamp, 1/255
skip, T<1e-4 stop, ``out_depth = D + T*z_far``, near-cull 0.2) against
accidental drift.

Regenerate (only when semantics intentionally change):
    python -m tests.test_golden
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblurgs_tpu.ops.rasterize import RasterizeConfig, render
from tests.scene_factory import make_camera, make_gaussians

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "scene0.npz")


def build():
    cam, cs, _ = make_camera(width=40, height=32, dist=3.5, angle=0.3)
    means, scales, rots, opac, shs = make_gaussians(
        jax.random.PRNGKey(77), n=120, sh_deg=2, opacity_max=0.97
    )
    bg = jnp.array([0.15, 0.35, 0.55])
    return cam, cs, (means, scales, rots, opac, shs), bg


def render_with(backend, **kw):
    cam, cs, gauss, bg = build()
    cfg = RasterizeConfig(backend=backend, max_pairs=1 << 13, k_max=512, **kw)
    return render(*gauss, cam, cs, bg, cfg=cfg, sh_degree=2)


def generate():
    out = render_with("oracle")
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez_compressed(
        GOLDEN,
        image=np.asarray(out.image),
        depth=np.asarray(out.depth),
        final_T=np.asarray(out.final_T),
        radii=np.asarray(out.radii),
        visible=np.asarray(out.visible),
    )
    print(f"wrote {GOLDEN}")


@pytest.fixture(scope="module")
def golden():
    assert os.path.exists(GOLDEN), "golden file missing — run python -m tests.test_golden"
    with np.load(GOLDEN) as d:
        return dict(d)


class TestGolden:
    @pytest.mark.parametrize("backend", ["oracle", "xla", "pallas"])
    def test_backend_matches_golden(self, golden, backend):
        kw = {"interpret": True} if backend == "pallas" else {}
        out = render_with(backend, **kw)
        np.testing.assert_allclose(np.asarray(out.image), golden["image"],
                                   atol=3e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out.depth), golden["depth"],
                                   atol=3e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out.final_T), golden["final_T"],
                                   atol=3e-5)
        np.testing.assert_array_equal(np.asarray(out.radii), golden["radii"])
        np.testing.assert_array_equal(np.asarray(out.visible), golden["visible"])

    def test_background_depth_semantics(self, golden):
        """Empty pixels: color == bg, depth == T*z_far (forward.cu:389-390)."""
        empty = golden["final_T"] > 0.999
        assert empty.any()
        np.testing.assert_allclose(
            golden["image"][empty],
            np.broadcast_to(np.array([0.15, 0.35, 0.55], np.float32),
                            golden["image"][empty].shape), atol=1e-4)
        np.testing.assert_allclose(golden["depth"][empty],
                                   100.0 * golden["final_T"][empty], atol=1e-2)


if __name__ == "__main__":
    generate()

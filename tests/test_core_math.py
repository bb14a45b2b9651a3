"""Unit tests for the math core (SURVEY.md §4.2).

Where a torch reference exists in-environment (torch is CPU-only in this
image), we check against an independent numpy/scipy recomputation of the
reference formulas rather than importing the reference code.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deblurgs_tpu.core import bezier, camera, lie, sh, transforms


def rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=jnp.float32)


class TestLie:
    def test_hat_roundtrip(self):
        v = rand(0, 7, 3)
        h = lie.hat(v)
        np.testing.assert_allclose(h + jnp.swapaxes(h, -1, -2), 0.0)
        np.testing.assert_allclose(lie.hat_inv(h), v)

    def test_so3_exp_is_rotation(self):
        v = rand(1, 16, 3)
        R = lie.so3_exp_map(v)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    def test_so3_exp_log_roundtrip(self):
        v = rand(2, 32, 3)
        # log is unique only for angle < pi; rescale into (0, 3.0)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True) * 1.5
        v2 = lie.so3_log_map(lie.so3_exp_map(v))
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=2e-4)

    def test_so3_exp_matches_scipy(self):
        from scipy.spatial.transform import Rotation

        v = np.asarray(rand(3, 8, 3))
        R = np.asarray(lie.so3_exp_map(jnp.asarray(v)))
        R_ref = Rotation.from_rotvec(v).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_se3_exp_log_roundtrip(self):
        x = rand(4, 20, 6)
        x = x.at[:, 3:].set(
            x[:, 3:] / jnp.linalg.norm(x[:, 3:], axis=-1, keepdims=True) * 1.5
        )
        M = lie.se3_exp_map(x)
        x2 = lie.se3_log_map(M)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=3e-4)
        # row-vector convention: bottom-right block
        np.testing.assert_allclose(np.asarray(M[:, :3, 3]), 0.0)
        np.testing.assert_allclose(np.asarray(M[:, 3, 3]), 1.0)

    def test_se3_transposed_convention(self):
        """M[:3,:3] must be R^T of the so3 exp of the rot part (reference
        pytorch3d_functions.py:455-457 permutes the output)."""
        x = rand(5, 4, 6)
        M = lie.se3_exp_map(x)
        R = lie.so3_exp_map(x[:, 3:])
        np.testing.assert_allclose(
            np.asarray(M[:, :3, :3]), np.asarray(jnp.swapaxes(R, -1, -2)), atol=1e-6
        )

    def test_small_angle_stability_and_grads(self):
        v = jnp.array([[1e-6, -2e-6, 1e-6], [0.0, 0.0, 0.0]], dtype=jnp.float32)
        R = lie.so3_exp_map(v)
        assert np.all(np.isfinite(np.asarray(R)))
        g = jax.grad(lambda p: jnp.sum(lie.se3_exp_map(p)))(
            jnp.zeros((2, 6), dtype=jnp.float32)
        )
        assert np.all(np.isfinite(np.asarray(g)))


class TestTransforms:
    def test_quat_rotmat_vs_scipy(self):
        from scipy.spatial.transform import Rotation

        q = np.asarray(rand(6, 10, 4))
        R = np.asarray(transforms.quat_to_rotmat(jnp.asarray(q)))
        # scipy uses (x, y, z, w); ours is (w, x, y, z)
        R_ref = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_covariance_psd_and_layout(self):
        s = jnp.exp(rand(7, 5, 3) * 0.3)
        q = rand(8, 5, 4)
        cov6 = np.asarray(transforms.build_covariance(s, q))
        # rebuild full matrix, check PSD and eigenvalues = squared scales
        for i in range(5):
            xx, xy, xz, yy, yz, zz = cov6[i]
            C = np.array([[xx, xy, xz], [xy, yy, yz], [xz, yz, zz]])
            w = np.linalg.eigvalsh(C)
            np.testing.assert_allclose(
                np.sort(w), np.sort(np.asarray(s[i]) ** 2), rtol=1e-4
            )

    def test_activations(self):
        x = rand(9, 100)
        np.testing.assert_allclose(
            np.asarray(transforms.clamp_opacity(x)), np.clip(np.asarray(x), 0, 1)
        )
        lb = 0.01
        y = transforms.lower_bound_exp(x, lb)
        x2 = transforms.lower_bound_log(y, lb)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)


class TestSH:
    def test_deg0_constant(self):
        shc = rand(10, 4, 3, 1)
        dirs = transforms.normalize(rand(11, 4, 3))
        out = sh.eval_sh(0, shc, dirs)
        np.testing.assert_allclose(np.asarray(out), sh.C0 * np.asarray(shc[..., 0]))

    def test_sh_to_color_clamp_gating(self):
        """Gradient must vanish exactly where the clamp is active
        (backward.cu:33-35 gates with pre_sigmoid flags)."""
        P = 64
        shc = rand(12, P, 1, 3) * 2.0
        means = rand(13, P, 3) + jnp.array([0.0, 0.0, 5.0])
        campos = jnp.zeros(3)

        def f(c):
            return jnp.sum(sh.sh_to_color(c, means, campos, deg=0))

        g = np.asarray(jax.grad(f)(shc))
        col = np.asarray(sh.sh_to_color(shc, means, campos, deg=0))
        clamped = col <= 0.0
        assert np.all(g[:, 0, :][clamped] == 0.0)
        assert np.all(g[:, 0, :][~clamped] != 0.0)

    def test_rgb_sh_roundtrip(self):
        rgb = jax.random.uniform(jax.random.PRNGKey(0), (16, 3))
        np.testing.assert_allclose(
            np.asarray(sh.sh_to_rgb(sh.rgb_to_sh(rgb))), np.asarray(rgb), atol=1e-6
        )


class TestBezier:
    def test_endpoints(self):
        """Reference ordering: t=1 -> ctrl[0], t=0 -> ctrl[-1] (bezier.py:54-64)."""
        ctrl = rand(14, 10, 3)  # order 9
        t = jnp.array([0.0, 1.0])
        out = np.asarray(bezier.bezier_eval(ctrl, t))
        np.testing.assert_allclose(out[0], np.asarray(ctrl[-1]), atol=1e-6)
        np.testing.assert_allclose(out[1], np.asarray(ctrl[0]), atol=1e-6)

    def test_partition_of_unity(self):
        t = jnp.linspace(0.0, 1.0, 33)
        basis = bezier.bernstein_basis(t, 9)
        np.testing.assert_allclose(np.asarray(jnp.sum(basis, -1)), 1.0, atol=1e-5)

    def test_linear_curve(self):
        ctrl = jnp.array([[1.0, 0.0], [0.0, 2.0]])  # order 1: ctrl[0] at t=1
        t = jnp.array([0.25])
        out = np.asarray(bezier.bezier_eval(ctrl, t))[0]
        np.testing.assert_allclose(out, 0.25 * np.array([1.0, 0.0]) + 0.75 * np.array([0.0, 2.0]))

    def test_matches_scipy_binom(self):
        import scipy.special

        np.testing.assert_allclose(
            bezier.binom_coefficients(9), scipy.special.binom(9, np.arange(10))
        )

    def test_endpoint_gradients_finite(self):
        """d(basis)/dt at t=0 and t=1 must be finite: the raw pow VJP
        (g·k·t^(k-1)) yields 0·inf = NaN for the exponent-0 column. An
        alignment sample clipped to exactly 0/1 (jitter) or a saturated
        sigmoid feeds exactly these t values with a live cotangent."""
        order = 9

        def f(t):
            return jnp.sum(bezier.bernstein_basis(t, order) ** 2)

        for tv in [0.0, 1.0, 0.5]:
            g = np.asarray(jax.grad(f)(jnp.float32(tv)))
            assert np.isfinite(g), (tv, g)
        # analytic check at the endpoints: d/dt Σ b_k² = 2 b_k b_k'; at t=0
        # only b_order=1 (others 0), b_order' = -order, b_{order-1}' = order
        g0 = float(jax.grad(f)(jnp.float32(0.0)))
        np.testing.assert_allclose(g0, -2.0 * order, rtol=1e-5)
        g1 = float(jax.grad(f)(jnp.float32(1.0)))
        np.testing.assert_allclose(g1, 2.0 * order, rtol=1e-5)

    def test_eval_gradient_through_curve_at_endpoints(self):
        """Full chain: grads of a bezier_eval sample at t∈{0,1} w.r.t. both
        t and the control points are finite and match the derivative
        curve (order·(Δ ctrl) at the endpoints)."""
        ctrl = rand(99, 4, 3)  # order 3

        def g_of_t(t):
            return jnp.sum(bezier.bezier_eval(ctrl, t[None])[0] ** 2)

        for tv, end_pair in [(0.0, (ctrl[-2], ctrl[-1])),
                             (1.0, (ctrl[0], ctrl[1]))]:
            g = float(jax.grad(g_of_t)(jnp.float32(tv)))
            assert np.isfinite(g)
            # in the reference's descending ordering the curve derivative
            # is order·(c[-2]-c[-1]) at t=0 and order·(c[0]-c[1]) at t=1
            a, b = np.asarray(end_pair[0]), np.asarray(end_pair[1])
            p = b if tv == 0.0 else a       # curve point at the endpoint
            dcurve = 3.0 * (a - b)
            expect = float((2.0 * p * dcurve).sum())
            np.testing.assert_allclose(g, expect, rtol=1e-4)


class TestCamera:
    def test_projection_matches_reference_formula(self):
        import math

        znear, zfar, fovx, fovy = 0.01, 100.0, 1.2, 0.9
        P = np.asarray(camera.get_projection_matrix(znear, zfar, fovx, fovy))
        # reference getProjectionMatrix (graphics_utils.py:51-71), then transpose
        tanY, tanX = math.tan(fovy / 2), math.tan(fovx / 2)
        top, right = tanY * znear, tanX * znear
        Pref = np.zeros((4, 4))
        Pref[0, 0] = 2 * znear / (2 * right)
        Pref[1, 1] = 2 * znear / (2 * top)
        Pref[3, 2] = 1.0
        Pref[2, 2] = zfar / (zfar - znear)
        Pref[2, 3] = -(zfar * znear) / (zfar - znear)
        np.testing.assert_allclose(P, Pref.T, atol=1e-6)

    def test_view_roundtrip_campos(self):
        """make_camera_arrays campos must equal inverse(view)[3,:3]."""
        rot = np.asarray(lie.so3_exp_map(rand(15, 1, 3)))[0]
        center = np.array([0.3, -1.0, 2.0], dtype=np.float32)
        view = camera.c2w_to_view(jnp.asarray(rot), jnp.asarray(center))
        cams = camera.make_camera_arrays(view, jnp.eye(4))
        inv = np.linalg.inv(np.asarray(view))
        np.testing.assert_allclose(np.asarray(cams.campos), inv[3, :3], atol=1e-5)
        np.testing.assert_allclose(np.asarray(cams.campos), center, atol=1e-5)

    def test_world2view_consistency(self):
        """numpy world2view(R, t) == c2w_to_view(R^T->rows?, ...) conventions.

        getWorld2View2 builds W2V from (R=c2w rot, t=w2c trans); the c2w camera
        center is -t @ R^T ... check a world point maps identically.
        """
        from scipy.spatial.transform import Rotation

        R = Rotation.from_rotvec([0.1, 0.4, -0.2]).as_matrix()  # c2w rotation
        t = np.array([0.5, -0.3, 1.0])  # w2c translation
        view = camera.world2view(R, t)  # transposed W2V
        p = np.array([0.2, 0.7, -0.4, 1.0], dtype=np.float32)
        got = p @ view
        expect = (R.T @ p[:3] + t)  # W2V: R^T p + t
        np.testing.assert_allclose(got[:3], expect, atol=1e-5)
        # and c2w_to_view from (rot=R as stored in cam_infos transposed..., center)
        center = -t @ R.T  # motion.py:45: -T @ R^T is cam center
        view2 = np.asarray(
            camera.c2w_to_view(jnp.asarray(R, dtype=jnp.float32),
                               jnp.asarray(center, dtype=jnp.float32))
        )
        np.testing.assert_allclose(view2, view, atol=1e-5)

"""Native C++ library tests: build, exact-KNN parity, COLMAP parse parity."""

import os

import numpy as np
import pytest

from deblurgs_tpu import native


requires_native = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain / native build failed"
)


class TestNative:
    def test_builds(self):
        # g++ is baked into this image; the library must build
        assert native.available()

    @requires_native
    def test_knn3_matches_exact(self):
        import jax
        from deblurgs_tpu.ops.knn import _exact_knn3_mean_sq

        pts = np.asarray(
            jax.random.normal(jax.random.PRNGKey(0), (5000, 3)), np.float32
        )
        host = native.knn3_mean_sq(pts)
        import jax.numpy as jnp

        ref = np.asarray(_exact_knn3_mean_sq(jnp.asarray(pts)))
        np.testing.assert_allclose(host, ref, rtol=1e-4)

    @requires_native
    def test_knn3_clustered_cloud(self):
        """Non-uniform density (the grid's hard case) must stay exact."""
        import jax
        from deblurgs_tpu.ops.knn import _exact_knn3_mean_sq
        import jax.numpy as jnp

        rng = np.random.RandomState(0)
        dense = rng.randn(3000, 3) * 0.01
        sparse = rng.randn(200, 3) * 5.0
        pts = np.concatenate([dense, sparse]).astype(np.float32)
        host = native.knn3_mean_sq(pts)
        ref = np.asarray(_exact_knn3_mean_sq(jnp.asarray(pts)))
        np.testing.assert_allclose(host, ref, rtol=1e-4)

    @requires_native
    def test_points3d_parse_parity(self, tmp_path):
        from tests.test_data import write_colmap_binary
        from deblurgs_tpu.data import colmap

        sparse = str(tmp_path / "sparse")
        write_colmap_binary(sparse, n_cams=2, n_pts=77)
        path = os.path.join(sparse, "points3D.bin")
        out = native.parse_points3d_bin(path)
        assert out is not None
        xyz, rgb, err = out
        # python fallback parse
        from deblurgs_tpu.data.colmap import _Buf
        import struct

        buf = _Buf(open(path, "rb").read())
        (num,) = buf.unpack("Q")
        assert xyz.shape == (77, 3)
        xyz2 = np.empty((num, 3))
        rgb2 = np.empty((num, 3), np.uint8)
        err2 = np.empty((num, 1))
        for i in range(num):
            rec = buf.unpack("QdddBBBd")
            xyz2[i] = rec[1:4]
            rgb2[i] = rec[4:7]
            err2[i] = rec[7]
            (tl,) = buf.unpack("Q")
            buf.off += 8 * tl
        np.testing.assert_array_equal(xyz, xyz2)
        np.testing.assert_array_equal(rgb, rgb2)
        np.testing.assert_array_equal(err, err2)

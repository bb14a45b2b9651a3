"""Host-side COLMAP-pipeline tools: mask staging, images.txt db-reorder.

These cover the parts of reference ``scripts/run_colmap.py`` /
``utils/colmap_reoder.py`` that run without the colmap binary.
"""

import os
import sqlite3

import numpy as np
from PIL import Image


def _write_images(images_dir, names, w=8, h=6):
    os.makedirs(images_dir, exist_ok=True)
    for n in names:
        Image.fromarray(
            np.full((h, w, 3), 128, np.uint8)).save(
            os.path.join(images_dir, n))


class TestPrepareMasks:
    def test_black_keeps_features(self, tmp_path):
        """Reference semantics (run_colmap.py:317-330): user-mask BLACK
        pixels -> 255 (keep) in the COLMAP mask, everything else -> 0."""
        from deblurgs_tpu.tools.colmap_pipeline import prepare_masks

        result = str(tmp_path / "res")
        _write_images(os.path.join(result, "images"),
                      ["a.png", "b.png"], w=8, h=6)
        mask_dir = str(tmp_path / "masks")
        os.makedirs(mask_dir)
        m = np.zeros((6, 8, 3), np.uint8)
        m[:3] = 255                      # top half masked (non-black)
        for n in ("a.png", "b.png"):
            Image.fromarray(m).save(os.path.join(mask_dir, n))

        mask_write, colmap_write = prepare_masks(result, mask_dir)
        assert sorted(os.listdir(mask_write)) == ["a.png", "b.png"]
        out = np.asarray(Image.open(
            os.path.join(colmap_write, "a.png.png")))
        assert out.shape == (6, 8)
        assert (out[:3] == 0).all()      # non-black user mask -> ignore
        assert (out[3:] == 255).all()    # black user mask -> keep

    def test_reverse_and_resize(self, tmp_path):
        from deblurgs_tpu.tools.colmap_pipeline import prepare_masks

        result = str(tmp_path / "res")
        _write_images(os.path.join(result, "images"), ["x.jpg"], w=8, h=6)
        mask_dir = str(tmp_path / "masks")
        os.makedirs(mask_dir)
        # mask at a DIFFERENT resolution: must resize to the image's
        m = np.zeros((12, 16, 3), np.uint8)
        m[:6] = 200
        Image.fromarray(m).save(os.path.join(mask_dir, "x.png"))

        _, colmap_write = prepare_masks(result, mask_dir, reverse=True)
        out = np.asarray(Image.open(os.path.join(colmap_write, "x.jpg.png")))
        assert out.shape == (6, 8)
        assert (out[:3] == 255).all()
        assert (out[3:] == 0).all()

    def test_count_mismatch_raises(self, tmp_path):
        import pytest

        from deblurgs_tpu.tools.colmap_pipeline import prepare_masks

        result = str(tmp_path / "res")
        _write_images(os.path.join(result, "images"), ["a.png", "b.png"])
        mask_dir = str(tmp_path / "masks")
        os.makedirs(mask_dir)
        Image.fromarray(np.zeros((6, 8, 3), np.uint8)).save(
            os.path.join(mask_dir, "a.png"))
        with pytest.raises(ValueError):
            prepare_masks(result, mask_dir)


class TestReorderImagesTxt:
    def test_db_order_rewrite(self, tmp_path):
        from deblurgs_tpu.tools.colmap_pipeline import reorder_images_txt

        datadir = str(tmp_path)
        db = os.path.join(datadir, "database.db")
        conn = sqlite3.connect(db)
        conn.execute("CREATE TABLE images (image_id INTEGER, name TEXT)")
        conn.executemany("INSERT INTO images VALUES (?, ?)",
                         [(7, "c.png"), (2, "a.png"), (5, "b.png")])
        conn.commit()
        conn.close()

        sparse = os.path.join(datadir, "sparse_txt")
        os.makedirs(sparse)
        with open(os.path.join(sparse, "images.txt"), "w") as fp:
            fp.write("# comment header\n")
            fp.write("1 0.1 0.2 0.3 0.4 1 2 3 1 a.png\n\n")
            fp.write("2 0.5 0.6 0.7 0.8 4 5 6 1 b.png\n\n")
            fp.write("3 0.9 1.0 1.1 1.2 7 8 9 1 c.png\n\n")

        out = reorder_images_txt(datadir)
        lines = [l for l in open(out).read().splitlines() if l.strip()]
        # db order: c(7), a(2), b(5) — ids replaced by db image_ids
        assert lines[0].split()[0] == "7" and lines[0].endswith("c.png")
        assert lines[1].split()[0] == "2" and lines[1].endswith("a.png")
        assert lines[2].split()[0] == "5" and lines[2].endswith("b.png")
        assert os.path.exists(os.path.join(sparse, "images_sorted.txt"))

    def test_nonempty_points2d_round_trips(self, tmp_path):
        """Two-lines-per-image contract: a non-empty points2D line must be
        carried with its header (and a blank one written where absent) so
        the rewritten file still parses with read_images_text."""
        from deblurgs_tpu.data.colmap import read_images_text
        from deblurgs_tpu.tools.colmap_pipeline import reorder_images_txt

        datadir = str(tmp_path)
        db = os.path.join(datadir, "database.db")
        conn = sqlite3.connect(db)
        conn.execute("CREATE TABLE images (image_id INTEGER, name TEXT)")
        conn.executemany("INSERT INTO images VALUES (?, ?)",
                         [(4, "b.png"), (9, "a.png")])
        conn.commit()
        conn.close()

        sparse = os.path.join(datadir, "sparse_txt")
        os.makedirs(sparse)
        pts_a = "10.5 20.25 3 40.0 50.0 -1"
        with open(os.path.join(sparse, "images.txt"), "w") as fp:
            fp.write("# images.txt\n")
            fp.write("1 1 0 0 0 0.5 0.25 2.0 1 a.png\n")
            fp.write(pts_a + "\n")
            fp.write("2 1 0 0 0 1.5 1.25 3.0 1 b.png\n")
            fp.write("\n")                       # empty points2D line

        out = reorder_images_txt(datadir)
        raw = open(out).read().splitlines()
        # db order: b(4) first, then a(9); points lines preserved in place
        assert raw[0].split()[0] == "4" and raw[0].endswith("b.png")
        assert raw[1] == ""
        assert raw[2].split()[0] == "9" and raw[2].endswith("a.png")
        assert raw[3] == pts_a

        images = read_images_text(out)
        assert sorted(images.keys()) == [4, 9]
        assert images[9].name == "a.png"
        np.testing.assert_allclose(images[9].xys,
                                   [[10.5, 20.25], [40.0, 50.0]])
        np.testing.assert_array_equal(images[9].point3D_ids, [3, -1])
        assert images[4].name == "b.png"
        assert images[4].xys.shape[0] == 0

    def test_cli(self, tmp_path):
        from deblurgs_tpu.cli.colmap_reorder import main

        datadir = str(tmp_path)
        db = os.path.join(datadir, "database.db")
        conn = sqlite3.connect(db)
        conn.execute("CREATE TABLE images (image_id INTEGER, name TEXT)")
        conn.executemany("INSERT INTO images VALUES (?, ?)",
                         [(3, "b.png"), (1, "a.png")])
        conn.commit()
        conn.close()
        sparse = os.path.join(datadir, "sparse_txt")
        os.makedirs(sparse)
        with open(os.path.join(sparse, "images.txt"), "w") as fp:
            fp.write("10 0 0 0 1 0 0 0 1 a.png\n")
            fp.write("11 0 0 0 1 0 0 0 1 b.png\n")
        main(["--datadir", datadir])
        lines = [l for l in open(os.path.join(sparse, "images.txt"))
                 .read().splitlines() if l.strip()]
        assert lines[0].endswith("b.png") and lines[0].split()[0] == "3"


class TestTriangulateCLI:
    """Standalone triangulation workspace builder (reference
    ``scripts/triangulation.py:33-150``) with the colmap binary simulated:
    asserts images are staged, extrinsics are written in DATABASE order in
    the w2c COLMAP convention, and the result lands in ``sparse/0``."""

    def test_builds_workspace(self, tmp_path, monkeypatch):
        import shutil

        from deblurgs_tpu.cli import triangulate as tri
        from deblurgs_tpu.data.colmap import qvec2rotmat
        from deblurgs_tpu.data.readers import CameraInfo
        from deblurgs_tpu.tools import colmap_pipeline as cp

        src = tmp_path / "src"
        _write_images(str(src), ["c1.png", "c2.png"], w=16, h=12)
        rng = np.random.default_rng(0)
        infos = []
        for i, name in enumerate(["c1.png", "c2.png"]):
            # random valid c2w rotation via QR
            q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
            q *= np.sign(np.linalg.det(q))
            infos.append(CameraInfo(
                uid=i, R=q, T=rng.normal(size=3), FovY=0.8, FovX=0.9,
                image=None, image_path=str(src / name), image_name=name,
                width=16, height=12))

        calls = []

        def fake_do_system(cmd):
            calls.append(cmd)
            ws = str(tmp_path / "out")
            if "feature_extractor" in cmd:
                conn = sqlite3.connect(os.path.join(ws, "database.db"))
                conn.execute("CREATE TABLE images (image_id INT, name TEXT)")
                # database order intentionally differs from input order
                conn.executemany("INSERT INTO images VALUES (?, ?)",
                                 [(1, "c2.png"), (2, "c1.png")])
                conn.commit()
                conn.close()
            elif "point_triangulator" in cmd:
                src_dir = cmd.split("--input_path ")[1].split()[0]
                dst = cmd.split("--output_path ")[1].split()[0]
                for f in os.listdir(src_dir):
                    shutil.copy(os.path.join(src_dir, f), dst)

        monkeypatch.setattr(cp, "colmap_available", lambda: True)
        monkeypatch.setattr(cp, "do_system", fake_do_system)
        monkeypatch.setattr(tri, "do_system", fake_do_system)

        out = tri.triangulate(infos, str(tmp_path / "out"))

        ws = tmp_path / "out"
        assert sorted(os.listdir(ws / "images")) == ["c1.png", "c2.png"]
        assert out == str(ws / "sparse" / "0")
        lines = [l for l in (ws / "sparse" / "0" / "images.txt")
                 .read_text().splitlines() if l.strip() and not
                 l.startswith("#")]
        # db order: c2 first; pose is w2c (R.T, T) of the matching info
        assert lines[0].split()[-1] == "c2.png"
        qvec = np.array([float(v) for v in lines[0].split()[1:5]])
        np.testing.assert_allclose(qvec2rotmat(qvec), infos[1].R.T,
                                   atol=1e-6)
        tvec = np.array([float(v) for v in lines[0].split()[5:8]])
        np.testing.assert_allclose(tvec, infos[1].T, atol=1e-6)
        cam_line = [l for l in (ws / "sparse" / "0" / "cameras.txt")
                    .read_text().splitlines() if not l.startswith("#")][0]
        assert cam_line.split()[1] == "PINHOLE"
        assert any("model_converter" in c for c in calls)

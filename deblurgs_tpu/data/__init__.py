"""Data / IO layer: COLMAP parsers, PLY I/O, scene readers, scene assembly.

Reference counterparts: ``scene/colmap_loader.py``, ``scene/dataset_readers.py``,
``scene/pcd_init.py``, ``utils/camera_utils.py``, ``scene/__init__.py``.
Pure numpy (no torch / plyfile / open3d dependencies).
"""

from deblurgs_tpu.data.readers import (  # noqa: F401
    BasicPointCloud,
    CameraInfo,
    SceneInfo,
    read_colmap_scene,
    read_blender_scene,
    load_scene_info,
)
from deblurgs_tpu.data.scene import Scene  # noqa: F401

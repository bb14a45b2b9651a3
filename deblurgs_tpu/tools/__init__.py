"""External-tool drivers: COLMAP preprocessing / registration pipelines
(reference L8: scripts/run_colmap.py, scripts/triangulation.py,
utils/colmap_reoder.py, test.py's initialize_test_pose)."""

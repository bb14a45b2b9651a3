"""Evaluation & export: metrics, test-pose refinement, trained-session
loading, spiral/trainview rendering (reference L7: test.py, metrics.py,
render_spiral.py, render_trainview.py, lpipsPyTorch)."""

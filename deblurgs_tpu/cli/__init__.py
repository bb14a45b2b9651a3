"""Command-line tools: train / render / evaluate (reference top-level scripts)."""

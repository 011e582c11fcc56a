"""Sampling engine: graph analysis, compilation, orchestration."""

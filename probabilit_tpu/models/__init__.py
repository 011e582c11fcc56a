"""Modeling layer: graph nodes, distributions, named factories."""

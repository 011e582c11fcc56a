"""Numerical kernels: ppf, special functions, QMC, correlation, NCM."""

"""Vectorized timestamp kernels (the reference plugin's cast matrix)."""

"""Pallas TPU kernels for the hot KAN ops (with jnp reference paths)."""

"""Batched JAX/Pallas device kernels for the simulation hot path."""

"""Vectorized JAX/XLA + Pallas compute kernels for the TPU path."""

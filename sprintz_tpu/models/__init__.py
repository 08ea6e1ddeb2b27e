"""Forecaster models: delta family and FIRE as JAX scan state machines."""

"""Multi-chip distribution: mesh construction, sharded encode/decode."""

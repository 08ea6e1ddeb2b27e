"""Shared exception types (import-cycle-free home)."""


class CorruptStreamError(ValueError):
    """A compressed stream is truncated or internally inconsistent."""

"""Query pushdown: reductions evaluated directly over compressed streams."""

from .pushdown import Operation, QueryParams, QueryResult, query  # noqa: F401

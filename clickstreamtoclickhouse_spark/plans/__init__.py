"""Query-plan layer: importing this package registers all queries."""

from . import core, ext, relational, tpch  # noqa: F401
from .registry import ORACLE, QUERIES, load, query  # noqa: F401

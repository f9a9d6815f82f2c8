"""Query-plan layer: importing this package registers all queries."""

from . import core, corpus, curation, experiments, ext, llmprep, profiling, relational, retrieval, tpch, webprep  # noqa: F401
from .registry import ORACLE, QUERIES, load, query  # noqa: F401

"""PySpark-native analytics engine with the capabilities of
vishnubkurup/clickstreamtoclickhouse (reference surveyed in SURVEY.md).

Spark-first re-expression of the reference's ingestion operators
(flatten, normalize, type-reconcile, quarantine, dedup-table semantics)
plus the analytical query layer the reference delegates to ClickHouse,
plus large-scale training-data-pipeline extensions (dedup, similarity
search, text analysis).
"""

__version__ = "0.1.0"

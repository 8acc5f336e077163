"""opengin_ingestion_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-imagination of the capabilities of LDFLK/opengin-ingestion
(reference at /root/reference, studied for behavior only) as an idiomatic
Spark engine: a change-event log of Common-Crawl-style web pages is tailed
(Structured Streaming) or replayed (batch), passed through vectorized
pandas/Arrow transforms (HTML→text extraction, language detection,
validation), and MERGEd into a native lake table ("GinTable": bucketed
Parquet data files + atomic JSON snapshot manifests, Iceberg-style
semantics) with last-writer-wins ordering by (warc_ts, seq), exactly-once
commits, additive + type-widening schema evolution, and per-partition
lineage + metrics.

Reference parity map lives in SURVEY.md §2; each module docstring cites the
reference behavior (file:line) it re-expresses.
"""

__version__ = "0.1.0"

from opengin_ingestion_spark.session import get_spark  # noqa: F401

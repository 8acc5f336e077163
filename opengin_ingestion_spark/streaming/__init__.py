"""Structured Streaming surface: binlog/WAL tail → foreachBatch MERGE.

Reference analog: the resumable, stage-checkpointed pipeline run
(/root/reference/python/src/opengin/tracer/agents/orchestrator.py:376-410)
becomes a streaming query with a checkpoint location; the per-page error
isolation (scanner.py:98-100) becomes the dead-letter split.
"""

from opengin_ingestion_spark.streaming.follow import (  # noqa: F401
    follow_changes,
    sync_ivf_index,
)
from opengin_ingestion_spark.streaming.tail import tail_changelog  # noqa: F401

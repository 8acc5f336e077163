"""Sources & sinks: synthetic change-log generator, log readers, lake table.

The reference's "source" is a PDF split into per-page units consumed
sequentially (/root/reference/python/src/opengin/tracer/agents/scanner.py:55-66).
Here the source is a partitioned change-event log directory (one Parquet
file per micro-batch) consumed either as a batch replay (`spark.read`) or a
Structured Streaming tail (`spark.readStream`).
"""

from opengin_ingestion_spark.sources.changelog import (  # noqa: F401
    CHANGE_SCHEMA_V1,
    CHANGE_SCHEMA_V2,
    ChangeLogSpec,
    generate_changelog,
    make_duplicated_variant,
    make_html,
    make_shuffled_variant,
)
from opengin_ingestion_spark.sources.download import (  # noqa: F401
    UnsafeURL,
    download_url,
    fetch_urls,
    validate_url,
)
from opengin_ingestion_spark.sources.gintable import (  # noqa: F401
    GinTable,
    choose_n_buckets,
    table_changes,
)
from opengin_ingestion_spark.sources.reader import (  # noqa: F401
    read_changelog,
    read_changelog_stream,
)
from opengin_ingestion_spark.sources.upload import UploadServer  # noqa: F401

from luxo_rs_spark.streaming.windows import (
    EVENTS_STREAM_SCHEMA,
    read_event_stream,
    session_stats,
    sliding_stats,
    tumbling_stats,
)
from luxo_rs_spark.streaming.stateful import (
    dedup_stream,
    dedup_stream_within_watermark,
    running_user_totals,
    streaming_quantiles,
    timeout_sessions,
    trending_items,
)
from luxo_rs_spark.streaming.joins import (
    click_view_attribution,
    interval_join_streams,
    interval_join_streams_full_outer,
    interval_join_streams_outer,
    stream_static_enrich,
)
from luxo_rs_spark.streaming.sinks import (
    RowAuditWriter,
    VersionedParquetTable,
    row_audit_sink,
    upsert_sink,
)
from luxo_rs_spark.streaming.state import (
    enable_rocksdb_state,
    read_state,
    rocksdb_state,
)
from luxo_rs_spark.streaming.neardup_ingest import (
    NearDupIngest,
    neardup_ingest_sink,
)
from luxo_rs_spark.streaming.tws import running_user_profile

__all__ = [
    "EVENTS_STREAM_SCHEMA",
    "read_event_stream",
    "session_stats",
    "sliding_stats",
    "tumbling_stats",
    "dedup_stream",
    "dedup_stream_within_watermark",
    "running_user_totals",
    "streaming_quantiles",
    "trending_items",
    "timeout_sessions",
    "click_view_attribution",
    "interval_join_streams",
    "interval_join_streams_full_outer",
    "interval_join_streams_outer",
    "stream_static_enrich",
    "RowAuditWriter",
    "VersionedParquetTable",
    "row_audit_sink",
    "upsert_sink",
    "enable_rocksdb_state",
    "NearDupIngest",
    "neardup_ingest_sink",
    "read_state",
    "rocksdb_state",
    "running_user_profile",
]
